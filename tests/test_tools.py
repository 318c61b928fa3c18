"""Offline-tool tests: native kNN/KMeans, graph building, coordinate
expansion, clustering (SURVEY.md §2.9)."""
import numpy as np
import pytest

from advmil_tpu.native import knn_l2, kmeans
from advmil_tpu.tools.build_graphs import build_graph, edges_from_knn, knn_l2_device
from advmil_tpu.tools.big_to_small_patching import get_scaled_matrix

RNG = np.random.default_rng(5)


def test_native_knn_exact():
    X = RNG.normal(size=(300, 2)).astype(np.float32)
    idx = knn_l2(X, 9)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    for i in range(0, 300, 37):
        want = set(np.argsort(d2[i])[:9])
        assert set(idx[i]) == want
    assert (idx[:, 0] == np.arange(300)).all()


def test_device_knn_matches_native():
    X = RNG.normal(size=(500, 64)).astype(np.float32)
    a = knn_l2(X, 5)
    b = knn_l2_device(X, 5, block=128)
    # same neighbor sets (order can differ on exact ties; none expected here)
    assert (a == b).mean() > 0.99


def test_native_kmeans_quality():
    # three well-separated blobs -> kmeans must recover them
    centers = np.array([[0, 0], [10, 10], [-10, 10]], np.float32)
    X = np.concatenate([c + RNG.normal(0, 0.5, size=(50, 2)) for c in centers])
    labels, cents = kmeans(X.astype(np.float32), 3, seed=0)
    # each blob maps to exactly one cluster
    for s in range(0, 150, 50):
        blk = labels[s:s + 50]
        assert (blk == blk[0]).all()
    assert len(set(labels[::50])) == 3


def test_edges_from_knn_strips_self():
    idx = np.array([[0, 1, 2], [1, 0, 2], [2, 1, 0]], np.int32)
    e = edges_from_knn(idx)
    assert e.shape == (2, 6)
    assert not np.any(e[0] == e[1])


def test_build_graph_shapes():
    n = 64
    coords = RNG.integers(0, 100, size=(n, 2)).astype(np.float32)
    feats = RNG.normal(size=(n, 32)).astype(np.float32)
    g = build_graph(coords, feats, radius=5, use_device_for_feats=False)
    assert g["edge_index"].shape == (2, n * 4)
    assert g["edge_latent"].shape == (2, n * 4)
    assert int(g["num_nodes"]) == n
    assert g["edge_index"].max() < n


def test_scaled_matrix_is_4x4_grid():
    m = get_scaled_matrix(256, 256, 4)
    assert m.shape == (16, 2)
    assert (m[0] == [0, 0]).all()
    assert (m[-1] == [3 * 256, 3 * 256]).all()
    # expanding one coord gives 16 unique positions
    c = np.array([1024, 2048])
    grid = m + c
    assert len({tuple(r) for r in grid}) == 16
