"""Patient-level WSI bag dataset + bucketed padded batching.

This is the single most consequential departure from the reference
(SURVEY.md §2.3): the reference trains with batch_size=1 over exact-length
bags, accumulating 16 micro-batches per optimizer step (reference
dataset/PatchWSI.py:17-110, model/model_handler.py:301-347). XLA wants static
shapes, so here bags are grouped into a small set of length buckets, padded to
the bucket length, and stacked into true [B, N, C] batches with masks. Every
downstream op is mask-correct, so a padded batch computes exactly what the
reference computes per bag.

Patch-mode buckets are multiples of 16 so padding forms whole 4x4 regions
(the reference guarantees N % 16 == 0 via tools/big_to_small_patching.py).
Ragged tail batches are filled with duplicated bags carrying sample_mask=0.
"""
from __future__ import annotations

import os.path as osp
from dataclasses import dataclass, field

import numpy as np

from ..utils.io import (retrieve_from_table, read_patch_feature,
                        read_patch_coord)
from ..utils.func import sampling_data, random_mask_square_instance
from ..ops.segment import build_reverse_edge_table


def default_buckets(max_n: int, min_bucket: int = 256,
                    growth: float = 2.0, n_multiple: int = 16) -> list:
    """Geometric bucket sizes (multiples of ``n_multiple``) covering max_n.

    ``growth`` trades padding waste against compiled-shape count: each bucket
    is one more train-step compile (served by the persistent XLA cache after
    the first run), and mean padding waste within a bucket is roughly
    (growth - 1) / 2. The top bucket is clamped to the dataset's own max bag
    size rounded up (a bag of 3400 patches pads to 3408, not 4096).
    ``n_multiple`` is 16 (the 4x4 region-pool requirement) times the
    instance-parallel device count, so every padded N stays evenly shardable
    over the 'inst' mesh axis. ``min_bucket`` stays a floor: datasets whose
    largest bag is below it get the single [min_bucket] shape (stable across
    folds) rather than a per-fold max-sized one.
    """
    m = max(16, int(n_multiple))
    floor = -(-int(min_bucket) // m) * m
    top = max(-(-int(max_n) // m) * m, floor)
    sizes = []
    b = floor
    while b < top:
        sizes.append(b)
        b = max(b + m, -(-int(b * growth) // m) * m)
    sizes.append(top)
    return sizes


class BagDataset:
    """Patient-level bags with labels; modes patch / cluster / graph / abmil.

    Per patient: concatenated patch features of all their slides, label (t, e)
    (time already transformed by time_format), plus mode extras — cluster ids,
    a padded kNN graph, or region coordinates.
    """

    def __init__(self, patient_ids: list, patch_path: str, label_path: str,
                 mode: str, read_format: str = "pt", time_format: str = "ratio",
                 time_bins: int = 4, ratio_sampling=None, ratio_mask=None,
                 cluster_path=None, coord_path=None, graph_path=None,
                 rng: np.random.Generator | None = None, cache: bool = True,
                 edge_agg: str = "spatial"):
        assert mode in ["patch", "cluster", "graph", "abmil"]
        self.mode = mode
        if ratio_sampling is not None:
            print(f"[dataset] Sampling with ratio_sampling = {ratio_sampling}")
            patient_ids, left = sampling_data(list(patient_ids), ratio_sampling, rng=rng)
            print(f"[dataset] Sampled {len(patient_ids)} patients, left {len(left)}")
        if ratio_mask is not None and ratio_mask > 1e-5:
            assert ratio_mask <= 1
            # abmil loads patch-style data, so masking applies there too
            # (reference dataset/utils.py:26-27 maps abmil -> patch mode)
            assert mode in ("patch", "abmil"), \
                "Only patch-style modes support instance masking."
            self.ratio_mask = float(ratio_mask)
        else:
            self.ratio_mask = None
        self.pids, self.pid2sid, self.pid2label = retrieve_from_table(
            patient_ids, label_path, ret=["pid", "pid2sid", "pid2label"],
            time_format=time_format, time_bins=time_bins)
        self.read_path = patch_path
        self.read_format = read_format
        self.cluster_path = cluster_path
        self.coord_path = coord_path
        self.graph_path = graph_path
        # which kNN edge set PatchGCN aggregates over: 'spatial' (coords) or
        # 'latent' (feature space) (reference model/backbone.py:148-153)
        assert edge_agg in ("spatial", "latent")
        self.edge_agg = edge_agg
        self.rng = rng if rng is not None else np.random.default_rng()
        self._cache: dict | None = {} if cache else None
        print(f"[dataset] BagDataset({mode}): {len(self.pids)} patients")

    def __len__(self):
        return len(self.pids)

    def bag_size(self, index: int) -> int:
        """Patch count of a bag WITHOUT loading the features (header peek for
        .npy/.h5); lets the bucketer initialize instantly and the prefetch
        thread overlap real loading with device compute."""
        pid = self.pids[index]
        total = 0
        for sid in self.pid2sid[pid]:
            path = osp.join(self.read_path, f"{sid}.{self.read_format}")
            if self.read_format == "npy":
                total += int(np.load(path, mmap_mode="r").shape[0])
            elif self.read_format == "h5":
                import h5py
                with h5py.File(path, "r") as hf:
                    total += int(hf["features"].shape[0])
            else:
                # .pt: mmap-load (zipfile serialization) so only the header
                # is touched; legacy formats fall back to a full load that
                # lands in the bag cache when enabled.
                try:
                    import torch
                    t = torch.load(path, map_location="cpu", mmap=True,
                                   weights_only=True)
                    total += int(t.shape[0])
                except Exception:
                    item = self[index]  # populates self._cache when enabled
                    return int(item["feats"].shape[0])
        return total

    def bag_sizes(self) -> np.ndarray:
        return np.array([self.bag_size(i) for i in range(len(self))])

    def _load_feats(self, pid: str) -> np.ndarray:
        feats = [read_patch_feature(
            osp.join(self.read_path, f"{sid}.{self.read_format}"))
            for sid in self.pid2sid[pid]]
        return np.concatenate(feats, axis=0).astype(np.float32)

    def __getitem__(self, index: int) -> dict:
        if self._cache is not None and index in self._cache:
            item = self._cache[index]
        else:
            item = self._load(index)
            if self._cache is not None:
                self._cache[index] = item
        if self.ratio_mask:
            item = dict(item)
            item["feats"] = random_mask_square_instance(
                item["feats"], self.ratio_mask, scale=4, mask_way="mask_zero",
                rng=self.rng)
        return item

    def _coord_file(self, sid: str) -> str:
        for ext in ("h5", "npz", "npy"):
            path = osp.join(self.coord_path, f"{sid}.{ext}")
            if osp.exists(path):
                return path
        raise FileNotFoundError(f"no coord file for slide {sid} under "
                                f"{self.coord_path} (tried .h5/.npz/.npy)")

    def _load(self, index: int) -> dict:
        pid = self.pids[index]
        label = np.asarray(self.pid2label[pid], np.float32)
        feats = self._load_feats(pid)
        item = {"index": index, "pid": pid, "feats": feats, "label": label}
        if self.mode == "cluster":
            cids = np.load(osp.join(self.cluster_path, f"{pid}.npy"))
            assert cids.shape[0] == feats.shape[0]
            item["cluster_id"] = cids.astype(np.int32)
        elif self.mode == "graph":
            item["edge_index"] = self._load_edges(pid)
        elif self.mode == "patch" and self.coord_path:
            coords = [read_patch_coord(self._coord_file(sid))
                      for sid in self.pid2sid[pid]]
            item["coords"] = np.concatenate(coords, axis=0)
        return item

    def _load_edges(self, pid: str) -> np.ndarray:
        """Concatenated multi-slide [2, E] (dst, src) edge table for one
        patient — graph files only, no feature load."""
        edges = []
        offset = 0
        key = "edge_index" if self.edge_agg == "spatial" else "edge_latent"
        for sid in self.pid2sid[pid]:
            npz_path = osp.join(self.graph_path, f"{sid}.npz")
            if osp.exists(npz_path):
                g = np.load(npz_path)
                # stored as [2, E] (dst, src) per slide; offset per slide
                ei = g[key].astype(np.int64) + offset
                nn_ = int(g["num_nodes"])
            else:
                # reference-format torch_geometric geomData pickle
                # (reference dataset/PatchWSI.py:96-105). PyG rows are
                # (source, target) with aggregation at the TARGET
                # (MessagePassing flow source_to_target), so flip to our
                # (dst, src) convention.
                from ..utils.io import read_geom_graph
                g = read_geom_graph(osp.join(self.graph_path, f"{sid}.pt"))
                ei = g[key][::-1].astype(np.int64) + offset
                nn_ = int(g["num_nodes"])
            edges.append(ei)
            offset += nn_
        ei = np.concatenate(edges, axis=1)  # [2, E_total]
        # dst-sorted edges let the segment reductions lower as sorted
        # (per-slide output is already sorted; concat keeps it sorted
        # since offsets increase, but enforce for foreign graph files)
        if not np.all(np.diff(ei[0]) >= 0):
            ei = ei[:, np.argsort(ei[0], kind="stable")]
        return ei

    def peek_edges(self, index: int) -> np.ndarray:
        """Edge table for bag ``index`` WITHOUT loading its features: the
        batcher's construction-time graph pre-scan reads every bag's edges,
        and going through __getitem__ would drag the whole feature corpus
        into host RAM (and the bag cache) before the first batch."""
        return self._load_edges(self.pids[index])

    def peek_grid(self, index: int):
        """Per-bag grid coordinates for grid-raster banding, or None.

        Snaps each slide's patch centroids (stored in the graph files by
        tools/build_graphs.py) to its extraction grid via
        ops/segment.grid_layout; multi-slide bags stack slides vertically
        (cumulative row offsets), mirroring _load_edges' index offsets —
        edges never cross slides, so banding is per slide. Returns
        (rc [N, 2] int64 (row, col), W, H_total) or None when any slide
        lacks centroids or is not grid-regular (the batcher then keeps the
        compact gather paths).
        """
        from ..ops.segment import crop_empty_grid_lines, grid_layout
        pid = self.pids[index]
        rcs, row_off, wmax = [], 0, 0
        for sid in self.pid2sid[pid]:
            npz_path = osp.join(self.graph_path, f"{sid}.npz")
            if osp.exists(npz_path):
                g = dict(np.load(npz_path))
            else:
                from ..utils.io import read_geom_graph
                g = read_geom_graph(osp.join(self.graph_path, f"{sid}.pt"))
            cent = g.get("centroid")
            if cent is None:
                return None
            gl = grid_layout(np.asarray(cent))
            if gl is None:
                return None
            gidx, W, H = gl
            # round 5: crop fully-empty bounding-box rows/columns — kernel
            # work scales with grid area, and tissue fills ~half the bbox
            row, col, W, H = crop_empty_grid_lines(gidx, W)
            rcs.append(np.stack([row + row_off, col], axis=1))
            row_off += H
            wmax = max(wmax, W)
        rc = np.concatenate(rcs, axis=0)
        return rc, wmax, row_off


def prepare_dataset(patient_ids: list, cfg: dict, **kws) -> BagDataset:
    """Build a BagDataset from the flat config (reference dataset/utils.py:4-33)."""
    ratio_sampling = kws.get("ratio_sampling")
    ratio_mask = kws.get("mask_ratio") if cfg.get("test") else None
    mode = cfg["bcb_mode"]
    if mode not in ["patch", "graph", "cluster"]:
        mode = "abmil"
    return BagDataset(
        patient_ids, cfg["path_patch"], cfg["path_label"], mode,
        read_format=cfg["feat_format"], time_format=cfg["time_format"],
        time_bins=cfg["time_bins"], ratio_sampling=ratio_sampling,
        ratio_mask=ratio_mask, cluster_path=cfg.get("path_cluster"),
        coord_path=(cfg.get("path_coordx5")
                    if cfg.get("use_coords_pe", False) else None),
        graph_path=cfg.get("path_graph"),
        rng=kws.get("rng"), edge_agg=cfg.get("graph_edge_agg", "spatial"),
        cache=cfg.get("cache_bags", True))


@dataclass
class Batch:
    """One padded batch. All arrays are numpy; converted on device transfer."""
    idx: np.ndarray          # [B] dataset indices (of the real samples)
    feats: np.ndarray        # [B, N, C]
    mask: np.ndarray         # [B, N] 1 = real patch
    label: np.ndarray        # [B, 2] (t, e)
    sample_mask: np.ndarray  # [B] 1 = real bag (0 = duplicated tail filler)
    extra: dict = field(default_factory=dict)


class BucketBatcher:
    """Groups bags into length buckets and emits fixed-shape padded batches.

    Per bucket of size Nb, batch size Bb = clip(token_budget // Nb, 1,
    max_batch). The number of distinct compiled shapes is bounded by the
    number of buckets actually used.
    """

    def __init__(self, dataset: BagDataset, token_budget: int = 32768,
                 max_batch: int = 64, min_bucket: int = 256,
                 edges_per_node: int = 9, batch_multiple: int = 1,
                 scatter_free: str = "auto", banded: str = "auto",
                 grid_max_inflation: float = 3.0,
                 bucket_growth: float = 2.0, n_multiple: int = 16):
        self.ds = dataset
        self.token_budget = token_budget
        self.max_batch = max_batch
        self.min_bucket = min_bucket
        self.edges_per_node = edges_per_node
        self.batch_multiple = batch_multiple  # e.g. the DP device count
        self.prefetch_depth = 2   # set from cfg num_workers by the handlers
        self.prefetch_workers = 1  # loader threads; ditto
        self._warned_edge_truncation = False
        # per-bag edge/band/reverse tables, keyed by dataset index (graph
        # mode): static per bag, so computed once and reused every epoch.
        # Follows the dataset's bag-cache policy (cache_bags=False = tight
        # host RAM; the tables are ~2% of the feature cache).
        self._tab_cache = {} if dataset._cache is not None else None
        # reverse edge tables (graph mode) make the GNN's message-gather
        # backward scatter-free, but padding the table to the max out-degree
        # costs gather volume: measured on-TPU, rev-gather wins when the max
        # out-degree stays near epn (spatial kNN) and loses on hub-heavy
        # graphs (BENCHNOTES.md). 'auto' emits the tables only while the
        # needed columns stay <= roundup(2*epn, 8); 'on'/'off' force it.
        self.scatter_free = scatter_free
        # column cap beyond which 'auto' gives up (padded rev-gather loses to
        # the scatter it replaces, BENCHNOTES.md)
        self._rev_cap = -(-2 * edges_per_node // 8) * 8
        self._rev_slots = 0
        self._rev_disabled = False
        sizes = dataset.bag_sizes()
        self.buckets = default_buckets(int(sizes.max()), min_bucket,
                                       growth=bucket_growth,
                                       n_multiple=n_multiple)
        self.item_bucket = np.searchsorted(self.buckets, sizes)
        self._by_bucket: dict = {}
        for i, b in enumerate(self.item_bucket):
            self._by_bucket.setdefault(int(b), []).append(i)
        # Pre-scan the (static) bag graphs ONCE so the 'auto' decisions
        # (banded streaming, reverse tables) and every padded column count
        # are fixed before the first batch (advisor r2): deciding mid-epoch
        # would change the batch pytree structure (keys appearing/
        # disappearing) or grow K/R, forcing train-step recompiles. The
        # scan reads ONLY the edge files (peek_edges) — never the features.
        self._band_on = False
        self._band_res_slots = 0
        self._band_u_slots = 0     # >0 => Pallas-kernel row tables shipped
        # grid-raster banding (real tissue graphs): compact numbering is not
        # banded, but embedded in the slide's bounding-box grid every grid
        # neighbor is a constant offset (ops/segment.grid_layout +
        # build_band_tables_matched). Engaged when compact banding fails its
        # gate but the grid layout is available, covers >= 0.7 of the edges,
        # and inflates the aggregation's node count by at most
        # `grid_max_inflation`.
        self._grid_on = False
        self._grid_max_inflation = float(grid_max_inflation)
        self._grid_res_slots = 0
        self._grid_u_slots = 0
        self._grid_rc: dict = {}        # bag index -> (rc [N,2], W, H)
        self._groups: list | None = None  # lazy [(bucket_n, grid_n, items)]
        if dataset.mode == "graph" and (scatter_free != "off"
                                        or banded != "off"):
            from ..ops.segment import band_coverage
            kmax = 1
            band_edges = band_total = 0
            res_max = u_max = off_max = 0
            for i in range(len(sizes)):
                e = dataset.peek_edges(i)  # [2, E] (dst, src), dst-sorted
                dst, src = e[0], e[1]
                first = np.searchsorted(dst, dst, side="left")
                pos = np.arange(dst.shape[0]) - first
                kept = pos < edges_per_node
                if kept.any():
                    kmax = max(kmax, int(np.bincount(src[kept]).max()))
                if banded != "off":
                    n = int(sizes[i])
                    esrc = np.zeros((n, edges_per_node), np.int32)
                    em = np.zeros((n, edges_per_node), np.float32)
                    esrc[dst[kept], pos[kept]] = src[kept]
                    em[dst[kept], pos[kept]] = 1.0
                    cov, nres, nrows, omax = band_coverage(esrc, em)
                    band_edges += cov * em.sum()
                    band_total += em.sum()
                    res_max = max(res_max, nres)
                    u_max = max(u_max, nrows)
                    off_max = max(off_max, omax)
            total_cov = band_edges / max(band_total, 1)
            if banded != "off" and total_cov >= 0.7:
                # banded streaming replaces the gather entirely (fwd AND
                # bwd) — reverse tables become redundant
                self._band_on = True
                self._band_res_slots = -(-max(res_max, 1) // 128) * 128
                # Pallas banded kernel admissibility: every |offset| must
                # fit the kernel's 128-row block (ops/banded_pallas.py);
                # wider-raster graphs keep the jnp rolls path
                if off_max <= 128:
                    self._band_u_slots = -(-max(u_max, 1) // 8) * 8
                self._rev_disabled = True
                print(f"[batcher] banded graph streaming ON: coverage "
                      f"{total_cov:.3f}, residual slots "
                      f"{self._band_res_slots}, residual rows "
                      f"{self._band_u_slots or 'n/a (rolls path)'}")
                return
            if banded != "off" and self._scan_grid(sizes):
                return
            k_cols = -(-kmax // 8) * 8
            if scatter_free == "auto" and k_cols > self._rev_cap:
                # hub-heavy graphs: padded rev-gather would cost more than
                # the scatter it replaces — use the scatter backward
                self._rev_disabled = True
            else:
                self._rev_slots = k_cols

    def _scan_grid(self, sizes) -> bool:
        """Second-chance pre-scan: compact banding failed its coverage gate
        (real tissue graphs — the tissue mask makes vertical raster offsets
        vary per row), so try the grid-raster layout. Returns True and fixes
        the grid slot counts when engaged."""
        from ..ops.segment import build_band_tables_matched
        epn = self.edges_per_node
        band_edges = band_total = 0
        res_max = u_max = off_max = 0
        grid_sum = node_sum = 0
        for i in range(len(sizes)):
            g = self.ds.peek_grid(i)
            n = int(sizes[i])
            if g is None or g[0].shape[0] != n:
                return False
            rc, W, H = g
            self._grid_rc[i] = g
            gidx = rc[:, 0] * W + rc[:, 1]
            grid_n = W * H
            e = self.ds.peek_edges(i)
            dst, src = e[0], e[1]
            first = np.searchsorted(dst, dst, side="left")
            pos = np.arange(dst.shape[0]) - first
            kept = pos < epn
            esrc_g = np.zeros((grid_n, epn), np.int32)
            em_g = np.zeros((grid_n, epn), np.float32)
            esrc_g[gidx[dst[kept]], pos[kept]] = gidx[src[kept]]
            em_g[gidx[dst[kept]], pos[kept]] = 1.0
            offs, _, ebanded, _, _, res_mask = build_band_tables_matched(
                esrc_g, em_g, k=epn)
            band_edges += float(ebanded.sum())
            band_total += float(em_g.sum())
            res_max = max(res_max, int(res_mask.sum()))
            resid_rows = np.unique(
                np.nonzero((em_g > 0) & (ebanded <= 0))[0]).size
            u_max = max(u_max, resid_rows)
            off_max = max(off_max, int(np.abs(offs).max(initial=0)))
            grid_sum += grid_n
            node_sum += n
        cov = band_edges / max(band_total, 1)
        inflation = grid_sum / max(node_sum, 1)
        if cov < 0.7 or inflation > self._grid_max_inflation:
            print(f"[batcher] grid-raster banding not engaged: coverage "
                  f"{cov:.3f}, inflation {inflation:.2f}")
            self._grid_rc.clear()
            return False
        self._grid_on = True
        self._grid_res_slots = -(-max(res_max, 1) // 128) * 128
        if off_max <= 128:  # Pallas kernel 3-block window admissibility
            self._grid_u_slots = -(-max(u_max, 1) // 8) * 8
        self._rev_disabled = True
        # padded grid node counts are per batch GROUP, not per node bucket:
        # _groups_list subdivides each bucket on grid area (round 5)
        print(f"[batcher] grid-raster banded streaming ON: coverage "
              f"{cov:.3f}, inflation {inflation:.2f}, residual slots "
              f"{self._grid_res_slots}, residual rows "
              f"{self._grid_u_slots or 'n/a (rolls path)'}")
        return True

    def _graph_tables(self, it: dict, bucket_n: int,
                      grid_n: int | None = None) -> dict:
        """Per-bag padded edge / band / reverse tables (graph mode).

        Pure function of the bag's static edge list and the pre-scan's
        fixed slot counts, so the result is cached by dataset index and
        reused every epoch; tail-filler duplicates hit the cache too. With
        banding on, only the band/residual tables are kept — the dense
        [bucket_n, epn] edge tables are a construction intermediate and
        never shipped to the device (the banded aggregation replaces the
        message gather entirely, forward and backward)."""
        idx = int(it["index"])
        if self._tab_cache is not None:
            cached = self._tab_cache.get(idx)
            if (cached is not None and cached["_bucket_n"] == bucket_n
                    and cached.get("_grid_n") == grid_n):
                return cached
        epn = self.edges_per_node
        e = it["edge_index"]  # [2, E] rows (dst, src), dst-sorted
        dst, src = e[0], e[1]
        # slot of each edge within its dst group (dst is sorted)
        first = np.searchsorted(dst, dst, side="left")
        pos = np.arange(dst.shape[0]) - first
        keep = pos < epn
        dropped = int((~keep).sum())
        if dropped and not self._warned_edge_truncation:
            self._warned_edge_truncation = True
            print(f"[batcher] WARNING: node in-degree exceeds {epn}; "
                  f"dropping {dropped} edges per bag (raise "
                  f"graph_edges_per_node)")
        esrc = np.zeros((bucket_n, epn), np.int32)
        em = np.zeros((bucket_n, epn), np.float32)
        esrc[dst[keep], pos[keep]] = src[keep]
        em[dst[keep], pos[keep]] = 1.0
        tabs = {"_bucket_n": bucket_n, "_grid_n": grid_n}
        if self._grid_on:
            # grid-raster banding: rebuild the dense table in the slide's
            # bounding-box grid layout (constant neighbor offsets) and ship
            # offset-matched band tables + the tissue->grid index map
            rc, W, H = self._grid_rc[idx]
            assert grid_n is not None and W * H <= grid_n
            gidx = (rc[:, 0] * W + rc[:, 1]).astype(np.int64)
            n = rc.shape[0]
            from ..ops.segment import build_band_tables_matched
            from ..ops.banded_pallas import build_u_inv, build_u_tables
            esrc_g = np.zeros((grid_n, epn), np.int32)
            em_g = np.zeros((grid_n, epn), np.float32)
            esrc_g[gidx[dst[keep]], pos[keep]] = gidx[src[keep]]
            em_g[gidx[dst[keep]], pos[keep]] = 1.0
            o, bmk, ebanded, rn_, rs_, rm_ = build_band_tables_matched(
                esrc_g, em_g, k=epn, res_slots=self._grid_res_slots)
            tabs.update(band_offs=o, band_mask=bmk, res_node=rn_,
                        res_src=rs_, res_mask=rm_)
            if self._grid_u_slots:
                ur, us, ue = build_u_tables(esrc_g, em_g, ebanded,
                                            u_slots=self._grid_u_slots)
                tabs.update(band_urows=ur, band_usrc=us, band_uemask=ue,
                            band_uinv=build_u_inv(ur, grid_n))
            gfull = np.full(bucket_n, grid_n, np.int32)  # sentinel: dropped
            gfull[:n] = gidx
            tabs["band_gidx"] = gfull
            # inverse map (grid cell -> patch row, sentinel bucket_n for
            # tissue-free cells): gidx is a bijection on the valid entries,
            # so shipping both directions makes the model's grid placement
            # and its VJP pure gathers (ops/segment.grid_place/grid_take)
            ginv = np.full(grid_n, bucket_n, np.int32)
            ginv[gidx] = np.arange(n, dtype=np.int32)
            tabs["band_ginv"] = ginv
        elif self._band_on:
            from ..ops.segment import build_band_tables
            o, bmk, rn, rs, rm = build_band_tables(
                esrc, em, res_slots=self._band_res_slots)
            tabs.update(band_offs=o, band_mask=bmk, res_node=rn,
                        res_src=rs, res_mask=rm)
            if self._band_u_slots:
                from ..ops.banded_pallas import build_u_inv, build_u_tables
                ur, us, ue = build_u_tables(esrc, em, bmk,
                                            u_slots=self._band_u_slots)
                tabs.update(band_urows=ur, band_usrc=us, band_uemask=ue,
                            band_uinv=build_u_inv(ur, bucket_n))
        else:
            tabs.update(edge_src=esrc, edge_mask=em)
            if self.scatter_free != "off" and not self._rev_disabled:
                ri, rm = build_reverse_edge_table(esrc, em,
                                                  k=self._rev_slots)
                tabs.update(rev_idx=ri, rev_mask=rm)
        if self._tab_cache is not None:
            self._tab_cache[idx] = tabs
        return tabs

    def batch_size_for(self, bucket_n: int) -> int:
        bb = int(np.clip(self.token_budget // bucket_n, 1, self.max_batch))
        m = self.batch_multiple
        if m > 1:
            bb = max(m, (bb // m) * m)  # divisible by the DP device count
        return bb

    def _groups_list(self) -> list:
        """The epoch's batch groups: [(bucket_n, grid_n, items)].

        grid_n is None off the grid-raster path, and every node bucket is
        one group. With grid-raster banding on, kernel work scales with the
        padded grid AREA, not the node count — so each node bucket is
        partitioned over its items sorted by grid area (a small exact DP)
        to minimize  sum over groups of  ceil(m/bb)*bb*grid_n  plus half a
        batch per group for the extra compiled shape. One sprawling slide
        then pays for its own bounding box instead of setting grid_n for
        every same-size bag (VERDICT r4 #2)."""
        if self._groups is not None:
            return self._groups
        groups = []
        for b in sorted(self._by_bucket):
            items = self._by_bucket[b]
            bn = int(self.buckets[b])
            if not self._grid_on:
                groups.append((bn, None, list(items)))
                continue
            area = {i: int(self._grid_rc[i][1]) * int(self._grid_rc[i][2])
                    for i in items}
            order = sorted(items, key=lambda i: (area[i], i))
            bb = self.batch_size_for(bn)
            m = len(order)
            rup = lambda a: -(-max(a, 1) // 128) * 128  # noqa: E731
            # candidate boundaries sit on batch-size multiples (an interior
            # boundary off a multiple would only add tail-filler waste) plus
            # the end — keeps the DP at O((m/bb)^2) for 10k-slide datasets
            pos = list(range(0, m, bb)) + [m]

            def seg_cost(s: int, e: int) -> float:  # items order[s:e]
                n_batches = -(-(e - s) // bb)
                gn = rup(area[order[e - 1]])
                return (n_batches + 0.5) * bb * gn

            best = {0: 0.0}               # best[e] = min cost of order[:e]
            cut = {}
            for e in pos[1:]:
                best[e] = np.inf
                for s in pos:
                    if s >= e:
                        break
                    c = best[s] + seg_cost(s, e)
                    if c < best[e]:
                        best[e], cut[e] = c, s
            bounds = []
            e = m
            while e > 0:
                bounds.append((cut[e], e))
                e = cut[e]
            for s, e in reversed(bounds):
                # restore ascending-index order inside the segment: the
                # area sort exists only to define the segmentation, and a
                # single-segment bucket must shuffle/batch exactly like the
                # non-grid path (lockstep with the gather-oracle regime)
                groups.append((bn, rup(area[order[e - 1]]),
                               sorted(order[s:e])))
        self._groups = groups
        return groups

    def num_batches(self) -> int:
        total = 0
        for bn, _, items in self._groups_list():
            bb = self.batch_size_for(bn)
            total += (len(items) + bb - 1) // bb
        return total

    def _epoch_chunks(self, shuffle: bool = False,
                      rng: np.random.Generator | None = None) -> list:
        """The epoch's (group, item-chunk) schedule — the deterministic
        order both the serial and the threaded loaders follow."""
        chunks = []
        for gi, (bn, _, items) in enumerate(self._groups_list()):
            items = list(items)
            if shuffle:
                (rng or np.random).shuffle(items)
            bb = self.batch_size_for(bn)
            for s in range(0, len(items), bb):
                chunks.append((gi, items[s:s + bb]))
        if shuffle:
            (rng or np.random).shuffle(chunks)
        return chunks

    def epoch_batches(self, shuffle: bool = False,
                      rng: np.random.Generator | None = None):
        """Yield Batch objects covering the dataset once."""
        for gi, chunk in self._epoch_chunks(shuffle=shuffle, rng=rng):
            yield self._make_batch(gi, chunk)

    def prefetch(self, shuffle: bool = False,
                 rng: np.random.Generator | None = None,
                 depth: int | None = None, workers: int | None = None):
        """Prefetching over epoch_batches: overlaps host-side bag IO/assembly
        with device compute (the TPU-side analogue of the reference's
        DataLoader(num_workers=8), reference model/model_handler.py:158-172).

        workers <= 1: one background thread runs the whole epoch serially.
        workers > 1: a thread pool assembles up to `workers` batches
        concurrently (plus `depth` queued ahead), yielding in the SAME
        deterministic chunk order as the serial path — batch content is
        identical, only wall-clock changes. Feature-file reads (np.load /
        torch unpickling) release the GIL during IO, so threads overlap
        disk reads with padding even on a single core; this is what feeds
        a multi-k-bags/s device on a cold cache (BENCHNOTES host-pipeline
        section). Falls back to serial when test-mode occlusion masking is
        active (item assembly then draws from a shared np RNG whose order
        must match the serial path)."""
        import queue
        import threading
        if depth is None:
            depth = max(2, self.prefetch_depth)
        if workers is None:
            workers = self.prefetch_workers
        if workers > 1 and self.ds.ratio_mask is None:
            yield from self._prefetch_pool(shuffle, rng, depth, workers)
            return
        q: queue.Queue = queue.Queue(maxsize=depth)
        sentinel = object()
        error: list = []

        def worker():
            try:
                for b in self.epoch_batches(shuffle=shuffle, rng=rng):
                    q.put(b)
            except BaseException as exc:  # propagate to the consumer
                error.append(exc)
            finally:
                q.put(sentinel)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        th.join()
        if error:
            raise error[0]

    def _prefetch_pool(self, shuffle, rng, depth: int, workers: int):
        """Thread-pool batch assembly, in-order yield. Safe because
        _make_batch touches only per-index caches (dict writes are atomic
        under the GIL; a rare duplicate load is benign) and the pre-scan
        froze every padding decision before the first batch."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        chunks = self._epoch_chunks(shuffle=shuffle, rng=rng)
        with ThreadPoolExecutor(max_workers=workers,
                                thread_name_prefix="advmil-loader") as ex:
            pending: deque = deque()
            it = iter(chunks)
            for gi, chunk in it:
                pending.append(ex.submit(self._make_batch, gi, chunk))
                if len(pending) >= workers + depth:
                    break
            for gi, chunk in it:
                yield pending.popleft().result()
                pending.append(ex.submit(self._make_batch, gi, chunk))
            while pending:
                yield pending.popleft().result()

    def _make_batch(self, group_i: int, item_ids: list) -> Batch:
        bucket_n, grid_n, _ = self._groups_list()[group_i]
        bb = self.batch_size_for(bucket_n)
        n_real = len(item_ids)
        # fill ragged tails by duplicating the first item with sample_mask 0
        fill = [item_ids[0]] * (bb - n_real)
        ids = list(item_ids) + fill
        items = [self.ds[i] for i in ids]
        C = items[0]["feats"].shape[1]
        feats = np.zeros((bb, bucket_n, C), np.float32)
        mask = np.zeros((bb, bucket_n), np.float32)
        label = np.zeros((bb, 2), np.float32)
        for j, it in enumerate(items):
            n = it["feats"].shape[0]
            assert n <= bucket_n
            feats[j, :n] = it["feats"]
            mask[j, :n] = 1.0
            label[j] = it["label"]
        sample_mask = np.zeros((bb,), np.float32)
        sample_mask[:n_real] = 1.0
        extra = {}
        if self.ds.mode == "cluster":
            cid = np.full((bb, bucket_n), -1, np.int32)
            for j, it in enumerate(items):
                n = it["feats"].shape[0]
                cid[j, :n] = it["cluster_id"]
            extra["cluster_id"] = cid
        elif self.ds.mode == "graph":
            # Per-bag edge/band/reverse tables are pure functions of each
            # bag's STATIC graph and the pre-scan's fixed slot counts, so
            # they are computed once per bag and cached (advisor r3) —
            # without the cache the band decomposition re-ran for every bag
            # in every batch of every epoch on the host hot path.
            per = [self._graph_tables(it, bucket_n, grid_n) for it in items]
            if self._band_on or self._grid_on:
                # banded streaming: the message gather (and therefore the
                # dense [N, epn] edge tables) never reaches the device —
                # ship only the band/residual tables (advisor r3)
                keys = ["band_offs", "band_mask", "res_node", "res_src",
                        "res_mask"]
                if (self._grid_u_slots if self._grid_on
                        else self._band_u_slots):
                    keys += ["band_urows", "band_usrc", "band_uemask",
                             "band_uinv"]
                if self._grid_on:
                    keys += ["band_gidx", "band_ginv"]
            else:
                # node-bucketed DENSE edge layout: per destination node, up
                # to `edges_per_node` incoming source indices. kNN graphs
                # have bounded in-degree, so this is lossless for tool-built
                # graphs; the dense table lets the GNN aggregate with a
                # masked softmax instead of scatters
                # (ops/segment.knn_edge_softmax_aggregate). Reverse tables
                # (optional) make the gather's VJP scatter-free; their
                # column count K and the auto on/off decision were fixed by
                # the construction-time pre-scan, so every batch shares one
                # pytree structure and one compiled K.
                keys = ["edge_src", "edge_mask"]
                if self.scatter_free != "off" and not self._rev_disabled:
                    keys += ["rev_idx", "rev_mask"]
            for k in keys:
                extra[k] = np.stack([t[k] for t in per])
        elif self.ds.mode == "patch" and "coords" in items[0]:
            # region-level coords: one per 16 patches
            Lb = bucket_n // 16
            rc = np.zeros((bb, Lb, 2), np.float32)
            for j, it in enumerate(items):
                c = it["coords"]
                L = min(c.shape[0], Lb)
                rc[j, :L] = c[:L]
            extra["coords"] = rc
        return Batch(idx=np.asarray(ids, np.int32), feats=feats, mask=mask,
                     label=label, sample_mask=sample_mask, extra=extra)
