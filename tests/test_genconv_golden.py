"""GENConv golden test against an independent pure-torch implementation.

torch_geometric cannot be installed in this environment (no package index),
so the reference's PatchGCN message-passing layer (reference
model/backbone.py:139: GENConv(aggr='softmax', t=1.0, learn_t=True,
num_layers=2, norm='layer')) is anchored instead to a ~40-line hand-written
torch implementation of pyg's documented GENConv semantics:

    m_ij   = relu(x_j) + eps                         (message)
    alpha  = channel-wise softmax over incoming edges of t * m   (aggregate)
    aggr_i = sum_j alpha_ij * m_ij
    out_i  = MLP(x_i + aggr_i),  MLP = Linear(C,2C) -> LayerNorm -> ReLU
                                       -> Linear(2C,C)

Weights are transplanted torch -> flax and the test requires forward AND
gradient agreement (wrt inputs, every MLP/LN parameter, and the learnable
temperature t) on an irregular graph that includes isolated nodes. This is
the accuracy anchor for the graph backbone's most rewritten op (the
dense-table / banded aggregations are separately proven equivalent to the
jnp oracle in test_banded*.py; this file proves the oracle itself).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from advmil_tpu.models.backbones import GENConv

EPS = 1e-7


class TorchGENConv(torch.nn.Module):
    """Independent implementation of pyg GENConv(aggr='softmax', learn_t=True,
    num_layers=2, norm='layer') semantics — NOT a copy of torch_geometric."""

    def __init__(self, dim):
        super().__init__()
        self.lin1 = torch.nn.Linear(dim, 2 * dim)
        self.norm = torch.nn.LayerNorm(2 * dim)
        self.lin2 = torch.nn.Linear(2 * dim, dim)
        self.t = torch.nn.Parameter(torch.ones(1))

    def forward(self, x, src, dst, num_nodes):
        msg = torch.relu(x)[src] + EPS                       # [E, C]
        logits = msg * self.t
        # segment (per-dst) channel-wise softmax, numerically stabilized
        mx = torch.full((num_nodes, x.shape[1]), -torch.inf)
        mx = mx.scatter_reduce(0, dst[:, None].expand_as(logits), logits,
                               reduce="amax", include_self=True)
        mx = torch.where(torch.isfinite(mx), mx, torch.zeros(()))
        ex = torch.exp(logits - mx[dst])
        denom = torch.zeros((num_nodes, x.shape[1]))
        denom = denom.index_add(0, dst, ex)
        alpha = ex / denom.clamp_min(1e-16)[dst]
        aggr = torch.zeros_like(x).index_add(0, dst, alpha * msg)
        h = x + aggr
        return self.lin2(torch.relu(self.norm(self.lin1(h))))


def _random_graph(n=23, epn=5, seed=0):
    """Irregular in-degrees 0..epn (node 0 isolated); returns both layouts:
    (src, dst) edge lists for torch and the dense [N, epn] incoming-source
    table our GENConv consumes."""
    rng = np.random.default_rng(seed)
    src_l, dst_l = [], []
    edge_src = np.zeros((n, epn), np.int32)
    edge_mask = np.zeros((n, epn), np.float32)
    for i in range(n):
        deg = 0 if i == 0 else int(rng.integers(1, epn + 1))
        srcs = rng.choice(n, size=deg, replace=False)
        for s_i, s in enumerate(srcs):
            src_l.append(int(s))
            dst_l.append(i)
            edge_src[i, s_i] = s
            edge_mask[i, s_i] = 1.0
    return (np.array(src_l), np.array(dst_l)), (edge_src, edge_mask)


def _transplant(tm: TorchGENConv, params):
    p = jax.tree_util.tree_map(np.asarray, params)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p["mlp0"]["kernel"] = sd["lin1.weight"].T
    p["mlp0"]["bias"] = sd["lin1.bias"]
    p["mlp_norm"]["scale"] = sd["norm.weight"]
    p["mlp_norm"]["bias"] = sd["norm.bias"]
    p["mlp1"]["kernel"] = sd["lin2.weight"].T
    p["mlp1"]["bias"] = sd["lin2.bias"]
    p["t"] = sd["t"]
    return p


def test_genconv_forward_and_grads_match_torch():
    n, epn, dim = 23, 5, 16
    (src, dst), (edge_src, edge_mask) = _random_graph(n, epn)
    x_np = np.random.default_rng(1).normal(size=(n, dim)).astype(np.float32)
    w_np = np.random.default_rng(2).normal(size=(n, dim)).astype(np.float32)

    torch.manual_seed(0)  # Linear/LayerNorm default init must be deterministic
    tm = TorchGENConv(dim)
    xt = torch.from_numpy(x_np.copy()).requires_grad_(True)
    out_t = tm(xt, torch.from_numpy(src), torch.from_numpy(dst), n)
    loss_t = (out_t * torch.from_numpy(w_np)).sum()
    loss_t.backward()

    model = GENConv(dim, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                        jnp.asarray(edge_src), jnp.asarray(edge_mask),
                        deterministic=True)["params"]
    params = _transplant(tm, params)

    def fwd(params, x):
        return model.apply({"params": params}, x, jnp.asarray(edge_src),
                           jnp.asarray(edge_mask), deterministic=True)

    out_j = fwd(params, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               atol=2e-5, rtol=1e-4)

    def loss_fn(params, x):
        return jnp.sum(fwd(params, x) * jnp.asarray(w_np))

    g_params, g_x = jax.grad(loss_fn, argnums=(0, 1))(params,
                                                      jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(g_x), xt.grad.numpy(),
                               atol=3e-5, rtol=1e-3)

    tg = {k: v.grad.detach().numpy() for k, v in tm.named_parameters()}
    pairs = [
        (g_params["mlp0"]["kernel"], tg["lin1.weight"].T),
        (g_params["mlp0"]["bias"], tg["lin1.bias"]),
        (g_params["mlp_norm"]["scale"], tg["norm.weight"]),
        (g_params["mlp_norm"]["bias"], tg["norm.bias"]),
        (g_params["mlp1"]["kernel"], tg["lin2.weight"].T),
        (g_params["mlp1"]["bias"], tg["lin2.bias"]),
        (g_params["t"], tg["t"]),
    ]
    # param grads pass through exp/softmax chains twice (once per framework)
    # with different f32 accumulation orders; the observed worst case is a
    # ~6e-5 abs / 3e-3 rel outlier on a single [16, 32] kernel element
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=5e-3)
    # the learnable temperature must receive real signal
    assert abs(float(tg["t"][0])) > 1e-6


def test_genconv_isolated_node_aggregates_to_mlp_of_x():
    """A node with zero incoming edges must see aggr = 0 (pyg: empty softmax
    contributes nothing), i.e. out = MLP(x) exactly."""
    n, epn, dim = 4, 3, 8
    edge_src = np.zeros((n, epn), np.int32)
    edge_mask = np.zeros((n, epn), np.float32)
    edge_mask[1, 0] = 1.0
    edge_src[1, 0] = 2
    x_np = np.random.default_rng(3).normal(size=(n, dim)).astype(np.float32)

    model = GENConv(dim, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                        jnp.asarray(edge_src), jnp.asarray(edge_mask),
                        deterministic=True)["params"]
    out = model.apply({"params": params}, jnp.asarray(x_np),
                      jnp.asarray(edge_src), jnp.asarray(edge_mask),
                      deterministic=True)
    out_no_edges = model.apply({"params": params}, jnp.asarray(x_np),
                               jnp.asarray(edge_src),
                               jnp.zeros_like(edge_mask), deterministic=True)
    # isolated rows agree between the two edge sets; the connected row differs
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out_no_edges[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(out_no_edges[3]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(out[1]), np.asarray(out_no_edges[1]))
