from .masked import masked_softmax, masked_mean, region_mask_from_patch_mask

__all__ = ["masked_softmax", "masked_mean", "region_mask_from_patch_mask"]
