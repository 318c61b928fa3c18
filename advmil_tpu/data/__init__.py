from .bags import BagDataset, BucketBatcher, prepare_dataset
from .synthetic import make_synthetic_dataset

__all__ = ["BagDataset", "BucketBatcher", "prepare_dataset",
           "make_synthetic_dataset"]
