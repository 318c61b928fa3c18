from .func import (sparse_key, sparse_str, EarlyStopping, get_kfold_pids,
                   sampling_data, add_prefix_to_filename, print_config,
                   print_metrics, rename_keys, random_mask_square_instance,
                   seed_everything)

__all__ = [
    "sparse_key", "sparse_str", "EarlyStopping", "get_kfold_pids",
    "sampling_data", "add_prefix_to_filename", "print_config", "print_metrics",
    "rename_keys", "random_mask_square_instance", "seed_everything",
]
