"""Run the UNMODIFIED PyTorch reference (/root/reference) on CPU for the
end-to-end parity harness (BASELINE.md north star: 5-fold val C-index within
0.005 of the reference).

The reference assumes a CUDA device and wandb/torch_geometric installs
(reference model/model_handler.py:11,40,90-91); neither exists here, so this
driver installs inert stand-ins BEFORE importing it:
  * wandb / torch_geometric / torch_sparse module stubs (graph classes raise
    if actually instantiated — parity runs use patch/abmil/cluster modes),
  * torch.cuda.set_device/empty_cache -> no-ops; Tensor.cuda/Module.cuda ->
    identity.
No reference code is copied or edited; it runs as-is from the read-only
mount. One runtime monkeypatch works around an upstream crash: cluster mode's
DeepAttMISL.forward never strips the DataLoader batch dim off cluster_id
(model/backbone.py:105-112) and IndexErrors with the stock pipeline; the
shim squeezes that dim so the k=8 segment pooling can be parity-tested at
all (see install_stubs).

Usage: python scripts/_run_reference.py --config cfg.yaml --handler adv|base
Prints one line: PARITY_METRICS_JSON=<json>.
"""
import argparse
import json
import sys
import types


def install_stubs():
    import numpy as np

    # numpy 2.0 removed the np.Inf alias the reference uses
    # (reference utils/func.py EarlyStopping)
    if not hasattr(np, "Inf"):
        np.Inf = np.inf

    # ---- wandb ----
    wandb = types.ModuleType("wandb")
    wandb.init = lambda **kw: types.SimpleNamespace(
        log=lambda *a, **k: None, finish=lambda *a, **k: None)
    wandb.log = lambda *a, **k: None
    wandb.finish = lambda *a, **k: None
    sys.modules["wandb"] = wandb

    # ---- torch_geometric / torch_sparse (patch/cluster/abmil never hit them) ----
    def _unavailable(*a, **k):
        raise RuntimeError("torch_geometric stub: graph mode is not available "
                           "in the CPU parity harness")

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.GENConv = _unavailable
    tg_nn.DeepGCNLayer = _unavailable
    tg_data = types.ModuleType("torch_geometric.data")

    class _Data:  # only referenced for isinstance checks / subclassing
        def __init__(self, *a, **k):
            _unavailable()

    class _Batch(_Data):
        pass

    tg_data.Data = _Data
    tg_data.Batch = _Batch
    tg.nn = tg_nn
    tg.data = tg_data
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.data"] = tg_data

    ts = types.ModuleType("torch_sparse")
    ts.SparseTensor = _Data
    ts.cat = _unavailable
    sys.modules["torch_sparse"] = ts

    # ---- CPU-ify torch ----
    import torch
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.empty_cache = lambda *a, **k: None
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # ---- upstream cluster-mode crash shim ----
    # The reference's DeepAttMISL.forward squeezes the DataLoader batch dim
    # off x_path but NOT off cluster_id (reference model/backbone.py:105-112),
    # so with the stock default_collate pipeline `x_path[cluster_id==i]`
    # raises IndexError (mask [1, N] vs tensor [N, d]) — cluster mode crashes
    # as shipped. This wrapper squeezes the batch dim off cluster_id before
    # the original forward; modeling semantics are unchanged. Documented in
    # PARITY.md.
    sys.path.insert(0, "/root/reference")
    from model.backbone import DeepAttMISL
    _orig_fwd = DeepAttMISL.forward

    def _fwd(self, x_path, cluster_id, *a):
        if cluster_id is not None and cluster_id.dim() == 2 \
                and cluster_id.shape[0] == 1:
            cluster_id = cluster_id.squeeze(0)
        return _orig_fwd(self, x_path, cluster_id, *a)

    DeepAttMISL.forward = _fwd

    # ---- torch 1.9 -> 2.x API drift shims (reference README.md:20) ----
    import inspect

    from torch.optim import lr_scheduler
    if "verbose" not in inspect.signature(
            lr_scheduler.ReduceLROnPlateau.__init__).parameters:
        _Orig = lr_scheduler.ReduceLROnPlateau

        class _ReduceLROnPlateau(_Orig):
            def __init__(self, *a, verbose=False, **k):
                super().__init__(*a, **k)

        lr_scheduler.ReduceLROnPlateau = _ReduceLROnPlateau


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--handler", default="adv", choices=["adv", "base"])
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    import yaml
    with open(args.config) as f:
        cfg = yaml.load(f, Loader=yaml.FullLoader)

    install_stubs()
    sys.path.insert(0, args.reference)
    if args.handler == "adv":
        from model.model_handler import MyHandler as Handler
    else:
        from model.baseline_handler import BaselineHandler as Handler

    handler = Handler(cfg)
    if cfg.get("test"):
        metrics = handler.exec_test()
    elif cfg.get("semi_training"):
        metrics = handler.exec_semi_sl()
        # expose the labeled/unlabeled split so the parity harness can check
        # the sampled subsets match across frameworks
        print("PARITY_SSL_LABELED_JSON="
              + json.dumps(sorted(handler.patient_id.get("label_visible", []))))
    else:
        metrics = handler.exec()
    print("PARITY_METRICS_JSON=" + json.dumps(metrics))


if __name__ == "__main__":
    main()
