"""Numerical parity against torch built-ins used by the reference.

The reference's ESAT encoder is a stock torch.nn.TransformerEncoderLayer
(reference model/backbone_utils.py:113-127). We transplant weights from the
torch module into our flax TransformerEncoderLayer and require forward
agreement — the strongest guard against subtle order-of-ops mistakes
(post-LN placement, FF dims, attention scaling)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from advmil_tpu.models.layers import TransformerEncoderLayer


def test_transformer_layer_matches_torch():
    D, H, L, B = 32, 4, 20, 2
    tl = torch.nn.TransformerEncoderLayer(D, H, dim_feedforward=D, dropout=0.0,
                                          activation="relu", batch_first=True)
    tl.eval()
    x = np.random.default_rng(0).normal(size=(B, L, D)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()

    model = TransformerEncoderLayer(D, H, D, dropout=0.0, use_pallas=False)
    mask = jnp.ones((B, L), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, jnp.asarray(x),
                           mask, deterministic=True)

    # transplant torch weights (torch Linear stores [out, in] -> transpose)
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    p["in_proj"]["kernel"] = sd["self_attn.in_proj_weight"].T
    p["in_proj"]["bias"] = sd["self_attn.in_proj_bias"]
    p["out_proj"]["kernel"] = sd["self_attn.out_proj.weight"].T
    p["out_proj"]["bias"] = sd["self_attn.out_proj.bias"]
    p["linear1"]["kernel"] = sd["linear1.weight"].T
    p["linear1"]["bias"] = sd["linear1.bias"]
    p["linear2"]["kernel"] = sd["linear2.weight"].T
    p["linear2"]["bias"] = sd["linear2.bias"]
    p["norm1"]["scale"] = sd["norm1.weight"]
    p["norm1"]["bias"] = sd["norm1.bias"]
    p["norm2"]["scale"] = sd["norm2.weight"]
    p["norm2"]["bias"] = sd["norm2.bias"]

    got = model.apply({"params": p}, jnp.asarray(x), mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_torch_qkv_split_convention():
    """torch packs in_proj as [3D, D] rows = (q, k, v); our jnp.split on the
    output axis after x @ W^T must match. Covered implicitly above; this
    isolates the attention output for a single head."""
    D, H, L = 8, 1, 5
    mha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    mha.eval()
    x = np.random.default_rng(1).normal(size=(1, L, D)).astype(np.float32)
    with torch.no_grad():
        want, _ = mha(torch.from_numpy(x), torch.from_numpy(x),
                      torch.from_numpy(x), need_weights=False)
    want = want.numpy()

    w_in = mha.in_proj_weight.detach().numpy()
    b_in = mha.in_proj_bias.detach().numpy()
    w_out = mha.out_proj.weight.detach().numpy()
    b_out = mha.out_proj.bias.detach().numpy()
    qkv = x @ w_in.T + b_in
    q, k, v = np.split(qkv, 3, axis=-1)
    logits = (q @ np.transpose(k, (0, 2, 1))) / np.sqrt(D)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    attn = probs @ v
    got = attn @ w_out.T + b_out
    np.testing.assert_allclose(got, want, atol=1e-5)
