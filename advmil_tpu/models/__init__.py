from .backbones import (ABMIL, DeepAttnMISL, DualTransHS, PatchGCN,
                        load_backbone)
from .gan import Generator, Discriminator, PrjDiscriminator, SurvNet

__all__ = [
    "ABMIL", "DeepAttnMISL", "DualTransHS", "PatchGCN", "load_backbone",
    "Generator", "Discriminator", "PrjDiscriminator", "SurvNet",
]
