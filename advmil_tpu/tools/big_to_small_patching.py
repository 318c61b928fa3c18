"""Expand level-L patch coordinates into the 4x4 grid of level-(L-1) patches.

Replaces reference tools/big_to_small_patching.py: each big coordinate (x, y)
at patch_size P becomes the 16 coordinates (x + i*P', y + j*P') for i,j in
0..3 of the next-finer level. This is the invariant that makes every bag's N a
multiple of 16 and gives the 4x4-region structure the ESAT embedding and the
occlusion masking rely on.

Usage:
  python -m advmil_tpu.tools.big_to_small_patching READ_DIR SAVE_DIR
"""
from __future__ import annotations

import os
import os.path as osp
import shutil
import sys

import numpy as np


def get_scaled_matrix(width: int, height: int, scale: int = 4) -> np.ndarray:
    mat = np.zeros((scale, scale, 2))
    for j in range(scale):
        for i in range(scale):
            mat[j][i] = np.array([i * width, j * height])
    return mat.reshape(-1, 2)


def get_scaled_attrs(origin_attrs: dict, scale: int = 4) -> dict:
    return {
        "downsample": origin_attrs["downsample"] / scale,
        "downsampled_level_dim": origin_attrs["downsampled_level_dim"] * scale,
        "level_dim": origin_attrs["level_dim"] * scale,
        "name": origin_attrs["name"],
        "patch_level": origin_attrs["patch_level"] - 1,
        "patch_size": origin_attrs["patch_size"],
    }


def coords_big_to_small(path_in: str, path_out: str, patch_scale: int = 4):
    import h5py
    with h5py.File(path_in, "r") as hf:
        data_coords = hf["coords"]
        attrs = {k: data_coords.attrs[k] for k in data_coords.attrs.keys()}
        psize = data_coords.attrs["patch_size"]
        scaled_mat = get_scaled_matrix(psize, psize, patch_scale)
        coords = data_coords[:]
    # vectorized: [N, 1, 2] + [1, 16, 2] -> [N*16, 2]
    scaled = (coords[:, None, :] + scaled_mat[None, :, :]).reshape(-1, 2)
    scaled = scaled.astype(np.int32)
    scaled_attrs = get_scaled_attrs(attrs, patch_scale)
    scaled_attrs["save_path"] = osp.dirname(path_out)
    with h5py.File(path_out, "w") as hf:
        dset = hf.create_dataset("coords", data=scaled,
                                 maxshape=(None, 2), chunks=(1, 2))
        for k, v in scaled_attrs.items():
            dset.attrs[k] = v


def process_coords(dir_read: str, dir_save: str):
    os.makedirs(dir_save, exist_ok=True)
    for fname in sorted(os.listdir(dir_read)):
        if not fname.endswith("h5"):
            print(f"invalid file {fname}, skipped")
            continue
        coords_big_to_small(osp.join(dir_read, fname),
                            osp.join(dir_save, fname))
        print(f"expanded {fname}")
    record = osp.join(dir_read, "process_list_autogen.csv")
    if osp.exists(record):
        shutil.copy(record, dir_save)


if __name__ == "__main__":
    process_coords(sys.argv[1], sys.argv[2])
