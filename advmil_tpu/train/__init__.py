from .optim import create_optimizer, ReduceLROnPlateau

__all__ = ["create_optimizer", "ReduceLROnPlateau"]
