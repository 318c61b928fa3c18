"""Host-side I/O: label tables, split files, patch features, predictions.

Format-compatible with the reference (reference utils/io.py:12-175): csv label
tables with (patient_id, pathology_id, t, e), npz split files with
train/val/test patient arrays, .pt/.h5/.npy patch-feature files, and the
prediction CSV / distribution NPZ output contract.
"""
from __future__ import annotations

import os.path as osp

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# Discrete-label computation (reference utils/func.py:66-91)
# ---------------------------------------------------------------------------

def get_patient_data(df: pd.DataFrame, at_column: str = "patient_id") -> pd.DataFrame:
    df_gps = df.groupby("patient_id").groups
    df_idx = [i[0] for i in df_gps.values()]
    pat_df = df.loc[df_idx, :]
    return pat_df.reset_index(drop=True)


def compute_discrete_label(df: pd.DataFrame, column_t: str = "t", column_e: str = "e",
                           bins: int = 4):
    """qcut over event patients -> bin edges -> cut over all rows.
    Identical edge handling to the reference: first/last edges widened by 1e-5
    beyond the table-wide min/max."""
    min_t, max_t = df[column_t].min(), df[column_t].max()
    df = df.copy()
    df.loc[:, "y_c"] = 1 - df.loc[:, column_e]
    pat_df = get_patient_data(df)
    df_evt = pat_df[pat_df[column_e] == 1]
    _, qbins = pd.qcut(df_evt[column_t], q=bins, retbins=True, labels=False)
    qbins = np.asarray(qbins, dtype=np.float64)
    qbins[0] = min_t - 1e-5
    qbins[-1] = max_t + 1e-5
    discrete_labels, qbins = pd.cut(df[column_t], bins=qbins, retbins=True,
                                    labels=False, right=False, include_lowest=True)
    df.loc[:, "y_t"] = np.asarray(discrete_labels.values).astype(int)
    return df, ["y_t", "y_c"]


# ---------------------------------------------------------------------------
# Label table retrieval (reference utils/io.py:12-76)
# ---------------------------------------------------------------------------

def retrieve_from_table(patient_ids, table_path, ret=None, level: str = "patient",
                        pid_column: str = "patient_id", time_format: str = "origin",
                        time_bins: int = 4):
    """Returns the requested mappings among pid / sid / pid2sid / sid2pid /
    pid2label / sid2label, after applying the time-format transform.

    'ratio' divides t by the table-wide max; 'quantile' discretizes into
    time_bins via per-event-patient qcut; 'origin' keeps raw t.
    """
    assert level in ["slide", "patient"]
    assert time_format in ["origin", "ratio", "quantile"]
    if ret is None:
        ret = (["pid", "pid2sid", "pid2label"] if level == "patient"
               else ["sid", "sid2pid", "sid2label"])
    for r in ret:
        assert r in ["pid", "sid", "pid2sid", "sid2pid", "pid2label", "sid2label"]

    df = pd.read_csv(table_path, dtype={pid_column: str})
    for c in [pid_column, "pathology_id", "t", "e"]:
        assert c in df.columns, f"label table missing column {c}"

    patient_ids = [str(p) for p in patient_ids]
    pid_set = set(patient_ids)
    max_time = float(df["t"].max())
    pid2loc: dict = {}
    for i in df.index:
        _p = df.loc[i, pid_column]
        if _p in pid_set:
            pid2loc.setdefault(_p, []).append(i)

    label_columns = ["t", "e"]
    if time_format == "ratio":
        df = df.copy()
        df.loc[:, "t"] = 1.0 * df.loc[:, "t"] / max_time
    elif time_format == "quantile":
        df, label_columns = compute_discrete_label(df, bins=time_bins)

    pid, sid = [], []
    pid2sid, pid2label, sid2pid, sid2label = {}, {}, {}, {}
    for p in patient_ids:
        if p not in pid2loc:
            print(f"[Warning] Patient ID {p} not found in table {table_path}.")
            continue
        pid.append(p)
        for _i in pid2loc[p]:
            _sid = df.loc[_i, "pathology_id"]
            _t, _ind = df.loc[_i, label_columns[0]], df.loc[_i, label_columns[1]]
            pid2sid.setdefault(p, []).append(_sid)
            if p not in pid2label:
                pid2label[p] = (float(_t), float(_ind))
            sid.append(_sid)
            sid2pid[_sid] = p
            sid2label[_sid] = (float(_t), float(_ind))

    scope = {"pid": pid, "sid": sid, "pid2sid": pid2sid, "pid2label": pid2label,
             "sid2pid": sid2pid, "sid2label": sid2label}
    return [scope[r] for r in ret]


def read_maxt_from_table(path: str, at_column: str = "t") -> float:
    return float(pd.read_csv(path)[at_column].max())


# ---------------------------------------------------------------------------
# Feature / coordinate / split readers (reference utils/io.py:78-133)
# ---------------------------------------------------------------------------

def read_patch_feature(path: str) -> np.ndarray:
    """Read an [N, C] patch-feature matrix from .h5 / .pt / .npy / .npz."""
    ext = osp.splitext(path)[1]
    if ext == ".h5":
        import h5py
        with h5py.File(path, "r") as hf:
            return np.asarray(hf["features"][:], dtype=np.float32)
    if ext == ".pt":
        import torch  # torch-cpu used only as a file-format reader
        x = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(x.numpy() if hasattr(x, "numpy") else x, dtype=np.float32)
    if ext == ".npy":
        return np.asarray(np.load(path), dtype=np.float32)
    if ext == ".npz":
        return np.asarray(np.load(path)["features"], dtype=np.float32)
    raise ValueError(f"Unsupported feature format {ext}")


def read_patch_coord(path: str) -> np.ndarray:
    ext = osp.splitext(path)[1]
    if ext == ".h5":
        import h5py
        with h5py.File(path, "r") as hf:
            return np.asarray(hf["coords"][:])
    if ext == ".npy":
        return np.load(path)
    if ext == ".npz":
        return np.load(path)["coords"]
    raise ValueError(f"Unsupported coord format {ext}")


def read_datasplit_npz(path: str):
    data_npz = np.load(path)
    pids_train = [str(s) for s in data_npz["train_patients"]]
    pids_val = [str(s) for s in data_npz["val_patients"]]
    pids_test = ([str(s) for s in data_npz["test_patients"]]
                 if "test_patients" in data_npz else None)
    return pids_train, pids_val, pids_test


# ---------------------------------------------------------------------------
# Prediction persistence (reference utils/io.py:135-175)
# ---------------------------------------------------------------------------

def save_prediction(patient_id, y_true, y_pred, dist_pred, save_path: str):
    """Continuous model -> csv [patient_id, t, e, pred_t] (+ _dist.npz of the
    sampling distribution); discrete -> csv [patient_id, t, e, risk, surf_*]."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if y_pred.ndim == 1:
        y_pred = y_pred[:, None]
    if dist_pred is not None:
        dist_pred = np.squeeze(np.asarray(dist_pred))
        assert len(patient_id) == len(dist_pred)
    assert len(patient_id) == len(y_true) == len(y_pred)

    if y_pred.shape[1] == 1:
        t, e = y_true[:, 0], y_true[:, 1]
        df = pd.DataFrame({"patient_id": patient_id, "t": t, "e": e,
                           "pred_t": np.squeeze(y_pred)},
                          columns=["patient_id", "t", "e", "pred_t"])
        if dist_pred is not None:
            np.savez(save_path[:-4] + "_dist.npz", patient_id=patient_id,
                     pred_dist=dist_pred)
    else:
        bins = y_pred.shape[1]
        y_t, y_e = y_true[:, [0]], 1 - y_true[:, [1]]
        survival = np.cumprod(1 - y_pred, axis=1)
        risk = np.sum(survival, axis=1, keepdims=True)
        arr = np.concatenate((y_t, y_e, risk, survival), axis=1)
        df = pd.DataFrame(arr, columns=["t", "e", "risk"]
                          + [f"surf_{i + 1}" for i in range(bins)])
        df.insert(0, "patient_id", patient_id)
    df.to_csv(save_path, index=False)


class _GeomStub:
    """Placeholder for pickled torch_geometric classes: captures the pickled
    attribute dict without importing torch_geometric."""

    def __init__(self, *args, **kwargs):
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, tuple):  # (dict_state, slots_state)
            for part in state:
                if part:
                    self.__dict__.update(part)
        elif isinstance(state, dict):
            self.__dict__.update(state)


def read_geom_graph(path: str) -> dict:
    """Read a reference-format torch_geometric ``geomData`` graph ``.pt``
    (reference tools/patchgcn_graph_s2.py:88-92, consumed at reference
    dataset/PatchWSI.py:96-105) WITHOUT torch_geometric installed: any
    ``torch_geometric.*`` class in the pickle is swapped for a stub that
    just captures attributes.

    Returns numpy arrays: x [N, C], edge_index [2, E], edge_latent [2, E],
    centroid [N, 2] (missing fields -> absent keys), plus num_nodes.
    """
    import pickle

    import torch

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("torch_geometric"):
                return _GeomStub
            return super().find_class(module, name)

    shim = type("pickle_shim", (), {"Unpickler": _Unpickler,
                                    "load": staticmethod(pickle.load),
                                    "dump": staticmethod(pickle.dump)})
    obj = torch.load(path, map_location="cpu", pickle_module=shim,
                     weights_only=False)
    # PyG <2 keeps attrs in __dict__; PyG >=2 nests them in a _store mapping
    attrs = dict(getattr(obj, "__dict__", {}) or {})
    store = attrs.pop("_store", None)
    if store is not None:
        inner = getattr(store, "__dict__", None) or {}
        attrs.update(inner.get("_mapping", inner))
    out = {}
    for k in ("x", "edge_index", "edge_latent", "centroid"):
        v = attrs.get(k)
        if v is None:
            continue
        v = getattr(v, "detach", lambda: v)()
        out[k] = np.asarray(v.cpu().numpy() if hasattr(v, "cpu") else v)
    if "x" in out:
        out["num_nodes"] = int(out["x"].shape[0])
    return out
