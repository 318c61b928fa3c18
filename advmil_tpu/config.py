"""Flat YAML config loading, cross-field validation, and grid expansion.

Schema-compatible with the reference's config (reference config/cfg_nlst.yaml,
main.py:63-105, model/model_handler.py:780-812): flat key-value YAML, prefix
conventions scraped by sparse_key, list-valued keys expanded into a hyperparam
grid with save_path suffixes.

TPU-specific additions (all defaulted): ``batch_token_budget`` /
``batch_max_size`` / ``bucket_min`` control bucketed padded batching,
``dp_devices`` enables data-parallel sharding, ``precision`` selects
bf16/f32 backbone compute.
"""
from __future__ import annotations

import itertools

import yaml

from .utils.func import sparse_str

TPU_DEFAULTS = {
    "batch_token_budget": 32768,   # patches per device batch
    "batch_max_size": 64,          # max bags per batch
    "bucket_min": 256,             # smallest bag bucket (multiple of 16)
    # geometric growth between bucket sizes: 2.0 = power-of-two; smaller
    # (e.g. 1.5) trades more compiled shapes (persistent-cache-served) for
    # ~(growth-1)/2 less padding waste per bag. Top bucket is always clamped
    # to the dataset's own max bag size rounded up to a multiple of 16.
    "bucket_growth": 2.0,
    "dp_devices": 1,               # data-parallel device count
    "inst_devices": 1,             # instance(sequence)-parallel device count
    # multi-host (DCN) settings — parallel/dist.py; all-None = single process
    "dist_coordinator": None,      # "host:port" of process 0
    "dist_num_processes": None,    # total process count
    "dist_process_id": None,       # this process's rank
    "precision": "f32",            # f32 | bf16
    # PRNG bit generator for jax.random keys (dropout masks, noise draws):
    # "rbg" keeps threefry-quality key derivation (split/fold_in) but emits
    # random bits with the TPU hardware generator — measured 1.26-1.28x
    # whole-step on graph AND ESAT modes, where threefry mask generation at
    # [B,N,384] patch resolution was 25%+ of the step (BENCHNOTES round 4).
    # "threefry" restores JAX's default for bitwise cross-version/backend
    # reproducibility (the regime all PARITY.md numbers were recorded in).
    "rng_impl": "rbg",             # rbg | threefry | unsafe_rbg
    "use_pallas": True,            # pallas flash attention in ESAT
    "flash_min_len": 512,          # regions where flash beats einsum (train).
                                   # The deterministic eval forward floors the
                                   # gate at max(flash_min_len, 2048) — its
                                   # measured crossover — so this knob cannot
                                   # enable flash for eval below L=2048
    "opt_flatten": True,           # run elementwise optimizers on one flat
                                   # vector (exact; kills per-leaf op tail)
    "use_fused_embedding": False,  # fused Pallas Dense+LN+ReLU+region-mean
    "use_fused_lnpool": True,      # fused Pallas LN+ReLU+region-mean (no matmul)
    "use_coords_pe": False,        # feed region coords to ESAT (reference skips them)
    "num_graph_layers": 1,
    "graph_grid_resident": False,
    "graph_edge_agg": "spatial",
    "graph_edges_per_node": 9,     # padded edge budget per node (kNN radius)
    "graph_scatter_free": "auto",  # reverse-edge-table backward: auto|on|off
    # banded message streaming for raster-ordered spatial kNN graphs: the
    # gather becomes ~epn rolled slices + a small residual table (wins when
    # band coverage is high; pre-scanned at batcher build). Takes precedence
    # over graph_scatter_free when engaged.
    "graph_banded": "auto",        # auto|off
    # grid-raster banding (real tissue graphs): when compact banding fails
    # its coverage gate, the batcher re-embeds each slide into its bounding-
    # box patch grid (constant neighbor offsets -> the banded kernel applies
    # again) unless the grid would inflate the aggregation's node count by
    # more than this factor (tissue fill << bbox)
    "graph_grid_max_inflation": 3.0,
    "cache_bags": True,
    "accum_steps": 1,
    # with accum_steps>1: drop the trailing partial accumulator at epoch end,
    # exactly like the reference drops its trailing < bp_every_batch bags
    # (model/baseline_handler.py:296-324). Off by default: carrying the
    # remainder wastes no gradients.
    "accum_drop_remainder": False,
    "ckpt_backend": "msgpack",     # msgpack (one file) | orbax (directory)
    "profile_dir": None,
    # persistent XLA compilation cache: bucket-shape compiles are the dominant
    # fixed cost of a run; later folds of a multi_run sweep hit this cache
    "xla_cache_dir": "~/.cache/advmil-tpu/xla",
    "es_min_epochs": 0,
    "log_plot": False,
    "save_prediction": True,
    "train_sampling": None,
    "test": False,
    "semi_training": False,
    "semi_training_mode": "none",
    "monitor_metrics": "loss",
    "gen_updates": 1,
    "loss_regl1_coef": 0.0,
    "num_workers": 0,
    "wandb_dir": None,
    "wandb_prj": None,
}


def enable_compilation_cache(cfg: dict):
    """Point XLA's persistent compilation cache at cfg['xla_cache_dir'] so
    repeated bucket-shape compiles (across epochs, folds, and runs) are
    disk-cache hits instead of minute-scale recompiles."""
    import os
    path = cfg.get("xla_cache_dir")
    if not path:
        return
    try:
        import hashlib
        import platform

        import jax
        # scope by backend AND a host fingerprint: an axon/TPU session also
        # emits host-side CPU AOT helpers compiled on the remote machine,
        # and a cache directory restored onto a different host would
        # otherwise serve AOT code built for another CPU — XLA only WARNS
        # on the feature mismatch and loads it anyway (different scatter/
        # gather lowerings change f32 accumulation order; worst case
        # SIGILL), observed after a host migration in round 5
        try:
            with open("/proc/cpuinfo") as f:
                info = [ln for ln in f if ln.startswith(("model name",
                                                         "flags"))][:2]
            fp = hashlib.sha256("".join(info).encode()).hexdigest()[:12]
        except OSError:
            fp = platform.machine() or "unknown"
        path = os.path.join(os.path.expanduser(path),
                            f"{jax.default_backend()}-{fp}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as exc:  # older jax / read-only fs: not fatal
        print(f"[config] compilation cache disabled ({exc})")


def apply_rng_impl(cfg: dict):
    """Select the PRNG bit generator for every jax.random key created after
    this call (handlers call it before building any key). ``rbg`` routes bit
    generation through the TPU hardware RNG while key split/fold_in stay on
    threefry — same key-tree semantics, ~1.27x whole-step train throughput
    (threefry mask generation at patch resolution was 25%+ of the graph and
    ESAT steps; BENCHNOTES round 4). ``threefry`` is the bitwise-reproducible
    regime used for all recorded parity artifacts."""
    impl = str(cfg.get("rng_impl", "rbg"))
    assert impl in ("rbg", "threefry", "threefry2x32", "unsafe_rbg"), \
        f"rng_impl: {impl}"
    if impl == "threefry":       # JAX registers it as 'threefry2x32'
        impl = "threefry2x32"
    import jax
    jax.config.update("jax_default_prng_impl", impl)


def get_config(config_path: str) -> dict:
    with open(config_path, "r") as f:
        cfg = yaml.load(f, Loader=yaml.FullLoader)
    return with_defaults(cfg)


def with_defaults(cfg: dict) -> dict:
    out = dict(TPU_DEFAULTS)
    out.update(cfg)
    return out


def grid(kwargs: dict) -> list:
    """Expand every list-valued key into a full cartesian grid
    (reference main.py:68-105)."""
    listed = {k: v for k, v in kwargs.items() if isinstance(v, list)}
    fixed = {k: v for k, v in kwargs.items() if not isinstance(v, list)}
    if not listed:
        return [dict(kwargs)]
    keys = list(listed.keys())
    combos = list(itertools.product(*[listed[k] for k in keys]))
    out = []
    for combo in combos:
        cfg = dict(fixed)
        cfg.update(dict(zip(keys, combo)))
        out.append(cfg)
    return out


def grid_hyperparams(kwargs: dict) -> list:
    return [k for k, v in kwargs.items() if isinstance(v, list)]


def scatter_free_from_cfg(cfg: dict) -> str:
    """Normalize the `graph_scatter_free` config key (YAML may give bools)."""
    v = cfg.get("graph_scatter_free", "auto")
    if v is True:
        return "on"
    if v is False:
        return "off"
    v = str(v).lower()
    assert v in ("auto", "on", "off"), f"graph_scatter_free: {v}"
    return v


def effective_flash_min_len(cfg: dict) -> int:
    """Flash-attention length gate.

    Since round 4 the gate no longer depends on instance sharding: with
    inst_devices > 1 the handlers register the 2-D mesh
    (models/layers.set_inst_mesh) and long-bag attention routes through the
    shard_map'd sequence-parallel wrapper
    (ops/attention.masked_flash_attention_inst — local Q rows, all-gathered
    K/V, dK/dV reduce-scattered by the all-gather transpose), so the kernel
    composes with 'inst' instead of being forfeited. Round 3 had returned
    1 << 30 here under inst sharding because the bare pallas_call has no
    GSPMD partitioning rule and XLA would replicate it whole."""
    return int(cfg.get("flash_min_len", 512))


def check_configs(cfg: dict):
    """Cross-field validation (reference model/model_handler.py:780-812)."""
    scatter_free_from_cfg(cfg)
    assert str(cfg.get("rng_impl", "rbg")) in (
        "rbg", "threefry", "threefry2x32", "unsafe_rbg"), \
        f"rng_impl must be rbg/threefry/unsafe_rbg, got {cfg.get('rng_impl')}"
    assert cfg.get("monitor_metrics", "loss") in ("loss", "ci", "ci_max"), \
        "monitor_metrics must be loss / ci (reference-inverted) / ci_max"
    assert cfg["loss_netD"] in ["bce", "hinge", "wasserstein"], \
        f"loss_netD must be bce/hinge/wasserstein, got {cfg['loss_netD']}"
    assert cfg["loss_recon_norm"] in ["l1", "l2"], "loss_recon_norm must be l1/l2"
    assert cfg["gen_noi_noise_dist"] in ["uniform", "gaussian"], \
        "gen_noi_noise_dist must be uniform/gaussian"
    assert cfg["gen_noi_hops"] + 1 == len(str(cfg["gen_noi_noise"]).split("-")), \
        "gen_noi_noise must have gen_noi_hops+1 dash-separated flags"
    assert cfg["disc_netx_in_dim"] == int(cfg["bcb_dims"].split("-")[0]), \
        "disc_netx_in_dim must equal the first entry of bcb_dims"
    assert cfg["disc_nety_in_dim"] == int(str(cfg["gen_dims"]).split("-")[-1]), \
        "disc_nety_in_dim must equal the last entry of gen_dims"
    assert cfg["disc_netx_out_dim"] == int(cfg["disc_nety_hid_dims"].split("-")[-1]), \
        "disc_netx_out_dim must equal the last entry of disc_nety_hid_dims"
    assert cfg.get("ssl_resume_ckpt", "best") in ["last", "best"]
    noise_existing = sum(sparse_str(cfg["gen_noi_noise"])) > 0
    if noise_existing:
        assert cfg["times_test_sample"] > 1
    else:
        assert cfg["times_test_sample"] == 1
    mode = cfg.get("semi_training_mode", "none") or "none"
    if "UD" in mode and "LD" in mode:
        cfg["ssl_es_warmup"] = cfg["ssl_kfold"]  # force equal to ssl_kfold
    else:
        cfg["ssl_es_warmup"] = 0
    if cfg["task"] == "cont_gansurv":
        assert cfg["time_format"] in ["origin", "ratio"]
        assert str(cfg["gen_dims"])[-2:] == "-1"
        assert (cfg["gen_out_scale"] == "sigmoid" and cfg["time_format"] == "ratio") or \
               (cfg["gen_out_scale"] != "sigmoid" and cfg["time_format"] == "origin"), \
            "cont_gansurv needs sigmoid<->ratio or exp/none<->origin pairing"
        assert (cfg["time_format"] == "ratio" and cfg["loss_recon_gamma"] == 0) or \
               (cfg["time_format"] == "origin" and cfg["loss_recon_gamma"] >= 1), \
            "loss_recon_gamma must be 0 for ratio time, >=1 for origin time"
    elif cfg["task"] == "disc_gansurv":
        assert cfg["time_format"] == "quantile"
        assert cfg["gen_out_scale"] == "sigmoid"
        assert cfg["disc_nety_in_dim"] == cfg["time_bins"]
        assert cfg["log_plot"] is False
