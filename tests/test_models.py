"""Backbone/GAN forward-shape and padding-invariance tests.

Padding invariance is THE correctness contract of this framework: a bag padded
to a larger bucket (with mask) must produce the same embedding/score as the
exact-length bag, matching the reference's B=1 unpadded computation
(SURVEY.md §7 step 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmil_tpu.models.backbones import ABMIL, DeepAttnMISL, DualTransHS, PatchGCN
from advmil_tpu.models.gan import Generator, PrjDiscriminator, Discriminator, SurvNet

RNG = np.random.default_rng(11)
DIMS = (64, 32, 32)


def _bag(n, c=64):
    return jnp.asarray(RNG.normal(size=(1, n, c)), jnp.float32)


def _pad_bag(x, n_to):
    B, N, C = x.shape
    return jnp.pad(x, ((0, 0), (0, n_to - N), (0, 0)))


def _init_and_apply(model, x, mask, extra=None, **kw):
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "noise": key, "dropout": key},
                           x, mask, extra, deterministic=True, **kw)
    out = model.apply(variables, x, mask, extra, deterministic=True, **kw,
                      rngs={"noise": jax.random.PRNGKey(5)})
    return variables, out


class TestABMIL:
    def test_shape_and_padding_invariance(self):
        model = ABMIL(DIMS)
        x = _bag(48)
        mask = jnp.ones((1, 48), jnp.float32)
        variables, h = _init_and_apply(model, x, mask)
        assert h.shape == (1, 32)
        xp = _pad_bag(x, 128)
        mp = jnp.pad(mask, ((0, 0), (0, 80)))
        hp = model.apply(variables, xp, mp, None, deterministic=True)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(h), atol=1e-5)


class TestDeepAttnMISL:
    def test_padding_invariance(self):
        model = DeepAttnMISL(DIMS, num_clusters=8)
        x = _bag(40)
        cid = jnp.asarray(RNG.integers(0, 8, size=(1, 40)), jnp.int32)
        mask = jnp.ones((1, 40), jnp.float32)
        variables, h = _init_and_apply(model, x, mask, cid)
        assert h.shape == (1, 32)
        xp = _pad_bag(x, 96)
        cidp = jnp.pad(cid, ((0, 0), (0, 56)), constant_values=0)  # junk ids
        mp = jnp.pad(mask, ((0, 0), (0, 56)))
        hp = model.apply(variables, xp, mp, cidp, deterministic=True)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(h), atol=1e-5)

    def test_empty_cluster_gives_zero_embedding(self):
        """Reference zero-fills empty clusters (model/backbone.py:114-115)."""
        model = DeepAttnMISL(DIMS, num_clusters=8)
        x = _bag(16)
        cid = jnp.zeros((1, 16), jnp.int32)  # everything in cluster 0
        mask = jnp.ones((1, 16), jnp.float32)
        _, h = _init_and_apply(model, x, mask, cid)
        assert np.all(np.isfinite(np.asarray(h)))

    def test_phis_keeps_torch_default_init_under_xavier_scheme(self):
        """The reference's xavier re-init (model/model_utils.py:13-17) touches
        only nn.Linear, so DeepAttMISL's Conv2d `phis` keeps the torch DEFAULT
        init (kaiming-uniform kernel, nonzero uniform bias) in every surv_nll
        / gansurv run. Getting this wrong measurably slows early ranking
        convergence (PARITY.md cluster note). pt041 (general_init_weight)
        re-inits Conv2d too, so there phis follows the scheme."""
        from advmil_tpu.models.layers import DenseInit
        x = _bag(40)
        cid = jnp.asarray(RNG.integers(0, 8, size=(1, 40)), jnp.int32)
        mask = jnp.ones((1, 40), jnp.float32)
        dim_in = DIMS[0]

        model = DeepAttnMISL(DIMS, num_clusters=8, dense_init=DenseInit.XAVIER)
        variables, _ = _init_and_apply(model, x, mask, cid)
        params = variables["params"]
        phis_k = np.asarray(params["phis"]["kernel"])
        phis_b = np.asarray(params["phis"]["bias"])
        torch_bound = 1.0 / np.sqrt(dim_in)
        assert np.abs(phis_k).max() <= torch_bound + 1e-6
        # xavier bound for (64, 32) is sqrt(6/96) ~ 0.25 >> 0.125; a draw that
        # respects the tighter torch bound everywhere is not xavier
        assert np.abs(phis_k).max() > 0.8 * torch_bound  # actually fills it
        assert np.abs(phis_b).max() > 0.0                # torch bias, not zeros
        # the Linear layers stay xavier + zero bias
        attn_b = np.asarray(params["attn_fc"]["bias"])
        assert np.abs(attn_b).max() == 0.0
        xavier_bound = np.sqrt(6.0 / (DIMS[1] + DIMS[1]))
        attn_k = np.asarray(params["attn_fc"]["kernel"])
        assert np.abs(attn_k).max() <= xavier_bound + 1e-6
        assert np.abs(attn_k).max() > torch_bound  # wider than torch: xavier

        model41 = DeepAttnMISL(DIMS, num_clusters=8, dense_init=DenseInit.PT041)
        variables41, _ = _init_and_apply(model41, x, mask, cid)
        phis41 = np.asarray(variables41["params"]["phis"]["kernel"])
        assert np.abs(phis41).max() <= 0.5 / np.sqrt(dim_in) + 1e-6


class TestDualTransHS:
    def test_padding_invariance_whole_regions(self):
        model = DualTransHS(DIMS, nhead=4, use_pallas=False)
        x = _bag(64)  # 4 regions
        mask = jnp.ones((1, 64), jnp.float32)
        variables, h = _init_and_apply(model, x, mask)
        assert h.shape == (1, 32)
        xp = _pad_bag(x, 128)  # pad 4 full regions
        mp = jnp.pad(mask, ((0, 0), (0, 64)))
        hp = model.apply(variables, xp, mp, None, deterministic=True)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(h), atol=1e-4)


class TestPatchGCN:
    def _graph(self, n, epn=2):
        # chain graph in the dense node-bucketed layout: node a's incoming
        # edges come from a-1 and a+1 (where they exist)
        esrc = np.zeros((1, n, epn), np.int32)
        em = np.zeros((1, n, epn), np.float32)
        for a in range(n):
            slot = 0
            for b in (a - 1, a + 1):
                if 0 <= b < n:
                    esrc[0, a, slot] = b
                    em[0, a, slot] = 1.0
                    slot += 1
        return jnp.asarray(esrc), jnp.asarray(em)

    def test_padding_invariance(self):
        model = PatchGCN(DIMS, num_layers=1)
        n = 24
        x = _bag(n)
        mask = jnp.ones((1, n), jnp.float32)
        esrc, em = self._graph(n)
        extra = {"edge_src": esrc, "edge_mask": em}
        variables, h = _init_and_apply(model, x, mask, extra)
        assert h.shape == (1, 32)
        # pad nodes and edge tables
        xp = _pad_bag(x, 48)
        mp = jnp.pad(mask, ((0, 0), (0, 24)))
        eip = jnp.pad(esrc, ((0, 0), (0, 24), (0, 0)))
        emp = jnp.pad(em, ((0, 0), (0, 24), (0, 0)))
        hp = model.apply(variables, xp, mp,
                         {"edge_src": eip, "edge_mask": emp},
                         deterministic=True)
        np.testing.assert_allclose(np.asarray(hp), np.asarray(h), atol=1e-5)

    def test_multi_layer(self):
        model = PatchGCN(DIMS, num_layers=3)
        n = 16
        x = _bag(n)
        mask = jnp.ones((1, n), jnp.float32)
        esrc, em = self._graph(n)
        _, h = _init_and_apply(model, x, mask,
                               {"edge_src": esrc, "edge_mask": em})
        assert h.shape == (1, 32)

    def test_dense_aggregate_matches_segment_ops(self):
        # the dense fixed-degree aggregation must equal the scatter-based
        # segment softmax on the same graph (compile-latency rework, r1 #5)
        from advmil_tpu.ops.segment import (knn_edge_softmax_aggregate,
                                            segment_softmax_aggregate)
        rng = np.random.default_rng(0)
        n, epn, c = 12, 3, 5
        esrc = rng.integers(0, n, size=(n, epn)).astype(np.int32)
        em = (rng.uniform(size=(n, epn)) < 0.8).astype(np.float32)
        msg_tab = rng.normal(size=(n, epn, c)).astype(np.float32)
        t = np.float32(1.7)
        dense = knn_edge_softmax_aggregate(jnp.asarray(msg_tab),
                                           jnp.asarray(em), t)
        # same edges as a flat dst-sorted list
        dst = np.repeat(np.arange(n), epn)
        keep = em.reshape(-1) > 0
        flat_msg = msg_tab.reshape(-1, c)
        seg = segment_softmax_aggregate(jnp.asarray(flat_msg),
                                        jnp.asarray(dst),
                                        jnp.asarray(em.reshape(-1)), n, t)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(seg),
                                   rtol=1e-5, atol=1e-6)
        assert keep.sum() > 0

    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    def test_fused_pallas_aggregate_matches_oracle(self, dtype):
        # fused one-pass Pallas softmax aggregation (interpret mode on CPU)
        # must equal the jnp chain: values, message grads, and the learnable
        # temperature grad — including a zero-edge node and masked slots
        from advmil_tpu.ops.segment import (fused_knn_softmax_aggregate,
                                            knn_edge_softmax_aggregate)
        rng = np.random.default_rng(7)
        n, epn, c = 40, 4, 128
        msg = jnp.asarray(rng.normal(size=(n, epn, c)), dtype)
        em = (rng.uniform(size=(n, epn)) < 0.75).astype(np.float32)
        em[5] = 0.0                                    # zero-edge node
        em = jnp.asarray(em)
        t = jnp.float32(1.45)
        ref = knn_edge_softmax_aggregate(msg, em, t)
        got = fused_knn_softmax_aggregate(msg, em, t, True)
        tol = 1e-6 if dtype == "float32" else 2e-2
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=tol)
        assert np.all(np.asarray(got, np.float32)[5] == 0.0)

        def loss(fn, m, tt):
            return jnp.sum(fn(m, tt).astype(jnp.float32) ** 2)

        gr_m, gr_t = jax.grad(
            lambda m, tt: loss(lambda a, b: knn_edge_softmax_aggregate(a, em, b), m, tt),
            argnums=(0, 1))(msg, t)
        gf_m, gf_t = jax.grad(
            lambda m, tt: loss(lambda a, b: fused_knn_softmax_aggregate(a, em, b, True), m, tt),
            argnums=(0, 1))(msg, t)
        np.testing.assert_allclose(np.asarray(gf_m, np.float32),
                                   np.asarray(gr_m, np.float32), atol=tol * 40)
        np.testing.assert_allclose(float(gf_t), float(gr_t),
                                   rtol=1e-4 if dtype == "float32" else 3e-2)

    def test_fused_pallas_aggregate_vmapped(self):
        # the kernel runs under nn.vmap inside PatchGCN — the vmapped call
        # must agree with the per-graph oracle
        from advmil_tpu.ops.segment import (fused_knn_softmax_aggregate,
                                            knn_edge_softmax_aggregate)
        rng = np.random.default_rng(8)
        b, n, epn, c = 3, 24, 3, 128
        msg = jnp.asarray(rng.normal(size=(b, n, epn, c)), jnp.float32)
        em = jnp.asarray((rng.uniform(size=(b, n, epn)) < 0.8), jnp.float32)
        t = jnp.float32(0.8)
        ref = jax.vmap(lambda m, e: knn_edge_softmax_aggregate(m, e, t))(msg, em)
        got = jax.vmap(
            lambda m, e: fused_knn_softmax_aggregate(m, e, t, True))(msg, em)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def test_reverse_table_is_exact_transpose(self):
        from advmil_tpu.ops.segment import build_reverse_edge_table
        rng = np.random.default_rng(3)
        n, epn = 20, 4
        esrc = rng.integers(0, n, size=(n, epn)).astype(np.int32)
        em = (rng.uniform(size=(n, epn)) < 0.7).astype(np.float32)
        esrc = esrc * (em > 0)
        rev_idx, rev_mask = build_reverse_edge_table(esrc, em)
        assert rev_idx.shape[1] % 8 == 0
        # every real edge slot appears exactly once, at the row of its source
        seen = set()
        for j in range(n):
            for r in range(rev_idx.shape[1]):
                if rev_mask[j, r]:
                    flat = int(rev_idx[j, r])
                    assert flat not in seen
                    seen.add(flat)
                    assert esrc.reshape(-1)[flat] == j
                    assert em.reshape(-1)[flat] == 1.0
        assert len(seen) == int(em.sum())

    def test_reverse_gather_grads_match_scatter_path(self):
        # gather_rows_rev's custom VJP (scatter-free backward) must produce
        # the same gradients as the plain gather through PatchGCN, including
        # padded nodes, masked edges, and the remat'd multi-layer stack
        from advmil_tpu.ops.segment import build_reverse_edge_table
        rng = np.random.default_rng(1)
        n, epn, b = 32, 3, 2
        x = jnp.asarray(rng.normal(size=(b, n, DIMS[0])), jnp.float32)
        mask = np.zeros((b, n), np.float32)
        mask[:, :24] = 1.0
        esrc = rng.integers(0, 24, size=(b, n, epn)).astype(np.int32)
        em = np.zeros((b, n, epn), np.float32)
        em[:, :24] = (rng.uniform(size=(b, 24, epn)) < 0.85)
        esrc = esrc * (em > 0).astype(np.int32)
        revs = [build_reverse_edge_table(esrc[j], em[j], k=24)
                for j in range(b)]
        plain = {"edge_src": jnp.asarray(esrc), "edge_mask": jnp.asarray(em)}
        withrev = dict(plain,
                       rev_idx=jnp.asarray(np.stack([r[0] for r in revs])),
                       rev_mask=jnp.asarray(np.stack([r[1] for r in revs])))
        model = PatchGCN(DIMS, num_layers=3)
        params = model.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            x, jnp.asarray(mask), plain, deterministic=True)

        def loss(p, extra):
            out = model.apply(p, x, jnp.asarray(mask), extra,
                              deterministic=True)
            return jnp.sum(out ** 2)

        v1, g1 = jax.value_and_grad(loss)(params, plain)
        v2, g2 = jax.value_and_grad(loss)(params, withrev)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        for a, c in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-5, atol=1e-6)


class TestGAN:
    def test_generator_shapes_and_noise(self):
        bcb = ABMIL(DIMS)
        gen = Generator(backbone=bcb, dim_in=32, dim_out=1, noise=(0, 1),
                        hops=1, out_scale="sigmoid")
        x = _bag(32)
        mask = jnp.ones((1, 32), jnp.float32)
        key = jax.random.PRNGKey(0)
        variables = gen.init({"params": key, "noise": key, "dropout": key},
                             x, mask, None, zero_noise=True, deterministic=True)
        y1 = gen.apply(variables, x, mask, None, zero_noise=False,
                       deterministic=True, rngs={"noise": jax.random.PRNGKey(1)})
        y2 = gen.apply(variables, x, mask, None, zero_noise=False,
                       deterministic=True, rngs={"noise": jax.random.PRNGKey(2)})
        y0a = gen.apply(variables, x, mask, None, zero_noise=True,
                        deterministic=True, rngs={"noise": jax.random.PRNGKey(3)})
        y0b = gen.apply(variables, x, mask, None, zero_noise=True,
                        deterministic=True, rngs={"noise": jax.random.PRNGKey(4)})
        assert y1.shape == (1, 1)
        assert abs(float(np.squeeze(y1 - y2))) > 0          # noise changes output
        np.testing.assert_allclose(np.asarray(y0a), np.asarray(y0b))  # zero-noise deterministic
        assert 0.0 <= float(np.squeeze(y1)) <= 1.0               # sigmoid out_scale

    @pytest.mark.parametrize("iprd", ["bag", "instance"])
    def test_prj_discriminator_padding_invariance(self, iprd):
        disc = PrjDiscriminator(netx_in_dim=64, netx_out_dim=16,
                                nety_in_dim=1, nety_hid_dims=(8, 16),
                                prj_path="x", inner_product=iprd)
        x = _bag(32)
        t = jnp.asarray([[0.7]], jnp.float32)
        mask = jnp.ones((1, 32), jnp.float32)
        key = jax.random.PRNGKey(0)
        variables = disc.init({"params": key, "dropout": key}, x, t, mask,
                              deterministic=True)
        s = disc.apply(variables, x, t, mask, deterministic=True)
        assert s.shape == (1, 1)
        xp = _pad_bag(x, 64)
        mp = jnp.pad(mask, ((0, 0), (0, 32)))
        sp = disc.apply(variables, xp, t, mp, deterministic=True)
        np.testing.assert_allclose(np.asarray(sp), np.asarray(s), atol=1e-5)

    def test_cat_discriminator(self):
        disc = Discriminator(netx_in_dim=64, netx_out_dim=16, nety_in_dim=4,
                             nety_hid_dims=(8, 16))
        x = _bag(32)
        t = jnp.asarray(RNG.uniform(size=(1, 4)), jnp.float32)
        mask = jnp.ones((1, 32), jnp.float32)
        key = jax.random.PRNGKey(0)
        variables = disc.init({"params": key, "dropout": key}, x, t, mask,
                              deterministic=True)
        s = disc.apply(variables, x, t, mask, deterministic=True)
        assert s.shape == (1, 1)

    def test_survnet(self):
        bcb = ABMIL(DIMS)
        net = SurvNet(backbone=bcb, dim_in=32, dim_out=4, out_scale="sigmoid")
        x = _bag(32)
        mask = jnp.ones((1, 32), jnp.float32)
        key = jax.random.PRNGKey(0)
        variables = net.init({"params": key, "dropout": key}, x, mask, None,
                             deterministic=True)
        y = net.apply(variables, x, mask, None, deterministic=True)
        assert y.shape == (1, 4)
        assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))


class TestPositionalEmbedding:
    def test_dualtrans_with_region_coords(self):
        """Optional 2-D sin-cos PE path (reference compute_pe,
        model/backbone_utils.py:90-99): region coords change the embedding but
        keep padding invariance."""
        from advmil_tpu.ops.pe import compute_pe, posemb_sincos_2d
        model = DualTransHS(DIMS, nhead=4, use_pallas=False)
        x = _bag(64)  # 4 regions
        mask = jnp.ones((1, 64), jnp.float32)
        coords = jnp.asarray([[[0, 0], [0, 1], [1, 0], [1, 1]]], jnp.float32)
        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key, "dropout": key}, x, mask,
                               coords, deterministic=True)
        h_pe = model.apply(variables, x, mask, coords, deterministic=True)
        h_nope = model.apply(variables, x, mask, None, deterministic=True)
        assert np.abs(np.asarray(h_pe - h_nope)).max() > 1e-4
        # PE dims: [B, L, ndim], values bounded by sin/cos
        pe = compute_pe(coords, ndim=32)
        assert pe.shape == (1, 4, 32)
        assert np.abs(np.asarray(pe)).max() <= 1.0 + 1e-6

    def test_posemb_formula(self):
        from advmil_tpu.ops.pe import posemb_sincos_2d
        y = jnp.asarray([0.0, 2.0])
        x = jnp.asarray([1.0, 3.0])
        pe = posemb_sincos_2d(y, x, dim=8)
        # layout [sin(x*w), cos(x*w), sin(y*w), cos(y*w)] with w = [1, 1e-4]
        np.testing.assert_allclose(np.asarray(pe[0]),
                                   [np.sin(1), np.sin(1e-4), np.cos(1),
                                    np.cos(1e-4), 0, 0, 1, 1], atol=1e-6)


def test_discriminator_pair_call_matches_two_single_calls():
    """The D phase's pair-batched call (t as a tuple) shares only the
    dropout-free patch-embedding node: with dropout disabled it must equal
    two independent single calls bitwise, for both discriminator classes,
    and its gradients must equal the SUM of the single calls' gradients
    (the merged feats-reading dW — BENCHNOTES round-4 roofline)."""
    import jax
    import jax.numpy as jnp
    from advmil_tpu.models.gan import Discriminator, PrjDiscriminator

    rng = np.random.default_rng(11)
    B, N, C = 3, 64, 32
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    mask = jnp.ones((B, N), jnp.float32)
    t1 = jnp.asarray(rng.uniform(size=(B, 1)), jnp.float32)
    t2 = jnp.asarray(rng.uniform(size=(B, 1)), jnp.float32)
    for disc in [
        PrjDiscriminator(netx_in_dim=C, netx_out_dim=16, nety_in_dim=1,
                         nety_hid_dims=(8, 16), prj_path="x",
                         inner_product="instance"),
        PrjDiscriminator(netx_in_dim=C, netx_out_dim=16, nety_in_dim=1,
                         nety_hid_dims=(8, 16), prj_path="y",
                         inner_product="bag"),
        Discriminator(netx_in_dim=C, netx_out_dim=16, nety_in_dim=1,
                      nety_hid_dims=(8, 16)),
    ]:
        key = jax.random.PRNGKey(0)
        params = disc.init({"params": key, "dropout": key}, x, t1, mask,
                           deterministic=True)["params"]
        fr, ff = disc.apply({"params": params}, x, (t1, t2), mask,
                            deterministic=True)
        f1 = disc.apply({"params": params}, x, t1, mask, deterministic=True)
        f2 = disc.apply({"params": params}, x, t2, mask, deterministic=True)
        np.testing.assert_array_equal(np.asarray(fr), np.asarray(f1))
        np.testing.assert_array_equal(np.asarray(ff), np.asarray(f2))

        def loss_pair(p):
            a, b = disc.apply({"params": p}, x, (t1, t2), mask,
                              deterministic=True)
            return jnp.sum(a) + 2.0 * jnp.sum(b)

        def loss_two(p):
            a = disc.apply({"params": p}, x, t1, mask, deterministic=True)
            b = disc.apply({"params": p}, x, t2, mask, deterministic=True)
            return jnp.sum(a) + 2.0 * jnp.sum(b)

        gp = jax.grad(loss_pair)(params)
        gt = jax.grad(loss_two)(params)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gt)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)


class TestMaskDropout:
    """Dropout drop-in (models/layers.py): u8 mask bits under rbg keys,
    bitwise nn.Dropout parity under threefry keys."""

    def test_threefry_matches_flax_dropout_bitwise(self):
        import flax.linen as nn
        from advmil_tpu.models.layers import Dropout
        x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 33, 17)),
                        jnp.float32)
        rng = jax.random.key(7, impl="threefry2x32")
        ours = Dropout(0.37).apply({}, x, deterministic=False,
                                   rngs={"dropout": rng})
        ref = nn.Dropout(0.37, deterministic=False).apply(
            {}, x, rngs={"dropout": rng})
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_rbg_u8_path_statistics_and_scaling(self):
        from advmil_tpu.models.layers import Dropout
        rate = 0.25  # thresh 64 -> quantized rate exactly 0.25
        x = jnp.ones((256, 256), jnp.float32)
        rng = jax.random.key(3, impl="rbg")
        out = np.asarray(Dropout(rate).apply({}, x, deterministic=False,
                                             rngs={"dropout": rng}))
        kept = out != 0.0
        # kept elements are scaled by exactly 1/(1-rate_q)
        np.testing.assert_allclose(out[kept], 1.0 / (1.0 - rate), rtol=1e-6)
        # drop fraction within 4 sigma of the quantized rate
        n = out.size
        assert abs((~kept).mean() - rate) < 4 * np.sqrt(rate * (1 - rate) / n)
        # unbiased: E[out] == 1
        assert abs(out.mean() - 1.0) < 0.02

    def test_rbg_unrepresentable_rate_falls_back_exact(self):
        # rate 1/1000 rounds to thresh 0 -> must NOT become a no-drop u8 mask
        from advmil_tpu.models.layers import mask_dropout
        x = jnp.ones((512, 512), jnp.float32)
        rng = jax.random.key(5, impl="rbg")
        out = np.asarray(mask_dropout(rng, 0.001, x))
        frac = (out == 0.0).mean()
        assert 0.0 < frac < 0.003

    def test_deterministic_identity(self):
        from advmil_tpu.models.layers import Dropout
        x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)),
                        jnp.float32)
        out = Dropout(0.5).apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
