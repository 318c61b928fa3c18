"""Multi-host initialization test: two REAL processes on the CPU backend,
wired through jax.distributed via advmil_tpu.parallel.dist, performing a
cross-process reduction over a global mesh (SURVEY.md §2.10 'communication
backend' row)."""
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, {repo!r})
    from advmil_tpu.parallel.dist import (maybe_initialize, global_mesh,
                                          make_global_batch,
                                          process_local_slice)
    assert maybe_initialize() is True
    assert jax.process_count() == 2
    mesh = global_mesh()
    assert jax.device_count() == 2
    sl = process_local_slice(4)
    full = np.arange(8, dtype=np.float32).reshape(4, 2)
    batch = make_global_batch({{"x": full[sl]}}, mesh)
    import jax.numpy as jnp
    out = float(jax.jit(jnp.sum)(batch["x"]))  # cross-process reduction
    assert out == 28.0, out
    print(f"RANK{{jax.process_index()}}_OK", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# Coordination-service / Gloo rendezvous deadlines are fixed at ~30 s inside
# XLA; on this 1-core box a concurrent heavy job can stall one rank past
# them. That is host starvation, not a product failure — retry the pair.
_INFRA_TIMEOUT_SIGNS = (
    "DEADLINE_EXCEEDED",
    "Gloo context initialization failed",
    "CoordinationService",
)


def _run_two_process(script, extra_env, timeout=900, attempts=3):
    """Launch the child script as 2 ranks; return their stdouts.

    Retries (fresh port) when a rank fails with a coordination/Gloo timeout
    signature; asserts rank success otherwise."""
    last = None
    for _ in range(attempts):
        port = _free_port()
        procs = []
        for rank in range(2):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)  # 1 CPU device per process
            env.update({
                "JAX_PLATFORMS": "cpu",
                "ADVMIL_COORDINATOR": f"127.0.0.1:{port}",
                "ADVMIL_NUM_PROCESSES": "2",
                "ADVMIL_PROCESS_ID": str(rank),
            })
            env.update(extra_env)
            procs.append(subprocess.Popen(
                [sys.executable, str(script)], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
        try:
            results = [p.communicate(timeout=timeout) for p in procs]
        except subprocess.TimeoutExpired:
            # don't leak the sibling rank (it would hold its coordinator
            # socket and a CPU core for the rest of the session)
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.communicate()
            raise
        codes = [p.returncode for p in procs]
        last = (codes, results)
        if all(c == 0 for c in codes):
            return [out for out, _ in results]
        blob = "".join(out + err for out, err in results)
        if not any(s in blob for s in _INFRA_TIMEOUT_SIGNS):
            break
    codes, results = last
    for rank, ((out, err), code) in enumerate(zip(results, codes)):
        assert code == 0, \
            f"rank {rank} failed:\nstdout: {out[-1500:]}\nstderr: {err[-3000:]}"
    raise AssertionError("unreachable")


def test_two_process_cpu_mesh(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=REPO))
    outs = _run_two_process(script, {}, timeout=300)
    assert "RANK0_OK" in outs[0]
    assert "RANK1_OK" in outs[1]


def test_single_process_noop():
    # absent dist settings -> no initialization, plain single-process path
    from advmil_tpu.parallel.dist import maybe_initialize, process_local_slice
    import jax
    if jax.distributed.is_initialized():  # pragma: no cover
        import pytest
        pytest.skip("already initialized in this interpreter")
    assert maybe_initialize({}) is False
    assert process_local_slice(8) == slice(0, 8)


TRAIN_CHILD = textwrap.dedent("""
    import os, sys, pathlib, json
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, {repo!r})
    from advmil_tpu.parallel.dist import maybe_initialize
    assert maybe_initialize() is True
    assert jax.process_count() == 2
    from tests.test_train_smoke import base_cfg
    paths = json.loads(os.environ["ADVMIL_TEST_PATHS"])
    workdir = pathlib.Path(os.environ["ADVMIL_TEST_WORKDIR"])
    cfg = base_cfg(paths, workdir, bcb_dims="64-32-32", gen_dims="32-1",
                   disc_netx_in_dim=64, epochs=2, es_warmup=0,
                   times_test_sample=2, batch_token_budget=512,
                   bucket_min=32)
    from advmil_tpu.train.handler import AdvHandler
    handler = AdvHandler(cfg)
    assert handler.multi_host
    metrics = handler.exec()
    print("METRICS_JSON=" + json.dumps(metrics), flush=True)
""")


def test_two_process_training_end_to_end(tmp_path):
    # full AdvHandler training across two REAL processes: sharded batches,
    # cross-process grad psum, allgathered eval, primary-only artifacts
    import json

    from advmil_tpu.data.synthetic import make_synthetic_dataset
    paths = make_synthetic_dataset(str(tmp_path / "data"), n_patients=36,
                                   dim=64, min_regions=2, max_regions=6,
                                   seed=1)
    paths = {k: v for k, v in paths.items() if isinstance(v, str)}
    script = tmp_path / "train_child.py"
    script.write_text(TRAIN_CHILD.format(repo=REPO))
    outs = _run_two_process(script, {
        "ADVMIL_TEST_PATHS": json.dumps(paths),
        "ADVMIL_TEST_WORKDIR": str(tmp_path / "run"),
    })
    m0 = json.loads(outs[0].split("METRICS_JSON=")[1].splitlines()[0])
    m1 = json.loads(outs[1].split("METRICS_JSON=")[1].splitlines()[0])
    assert m0 == m1, f"rank metrics diverged:\n{m0}\n{m1}"
    assert all(k in m0 for k in ("train", "validation", "test"))
    # primary-only artifacts exist exactly once
    run = tmp_path / "run" / "run"
    assert (run / "train_modelG-best.ckpt").exists()
    assert (run / "run_scalars.jsonl").exists()


BASE_CHILD = textwrap.dedent("""
    import os, sys, pathlib, json
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, {repo!r})
    from advmil_tpu.parallel.dist import maybe_initialize
    assert maybe_initialize() is True
    from tests.test_train_smoke import base_cfg
    from tests.test_handlers_modes import baseline_cfg as _bcfg
    paths = json.loads(os.environ["ADVMIL_TEST_PATHS"])
    workdir = pathlib.Path(os.environ["ADVMIL_TEST_WORKDIR"])
    cfg = _bcfg(paths, workdir, bcb_dims="64-32-32", pdh_dims="32-1",
                epochs=2, es_warmup=0, batch_token_budget=512,
                bucket_min=32)
    from advmil_tpu.train.baseline import BaselineHandler
    handler = BaselineHandler(cfg)
    assert handler.multi_host
    metrics = handler.exec()
    print("METRICS_JSON=" + json.dumps(metrics), flush=True)
""")


def test_two_process_baseline_training(tmp_path):
    import json

    from advmil_tpu.data.synthetic import make_synthetic_dataset
    paths = make_synthetic_dataset(str(tmp_path / "data"), n_patients=36,
                                   dim=64, min_regions=2, max_regions=6,
                                   seed=1)
    paths = {k: v for k, v in paths.items() if isinstance(v, str)}
    script = tmp_path / "base_child.py"
    script.write_text(BASE_CHILD.format(repo=REPO))
    outs = _run_two_process(script, {
        "ADVMIL_TEST_PATHS": json.dumps(paths),
        "ADVMIL_TEST_WORKDIR": str(tmp_path / "run"),
    })
    m0 = json.loads(outs[0].split("METRICS_JSON=")[1].splitlines()[0])
    m1 = json.loads(outs[1].split("METRICS_JSON=")[1].splitlines()[0])
    assert m0 == m1
