"""TFCE/cluster parity: scipy backend vs slow reference semantics vs native C++.

The slow reference below implements the documented algorithm of
/root/reference/analyses/cluster_analysis.py:15-75,248-312 (incremental edge
merging over a {(v0,v1): length} dict) independently, as the ground truth for
both fast backends.
"""

import numpy as np
import pytest

from multimodal_decoding_tpu.io.surface import edge_lengths, icosphere
from multimodal_decoding_tpu.ops import tfce as T


# --- slow reference (dict/set based, straight from the documented semantics) ---

def slow_clusters(scores, threshold, edge_length_dict):
    filtered = {
        e: l
        for e, l in edge_length_dict.items()
        if (scores[e[0]] >= threshold) and (scores[e[1]] >= threshold)
    }
    clusters = []  # list of (set, edge_len_sum)
    node_to_cluster = {}
    for (n0, n1), length in filtered.items():
        c0, c1 = node_to_cluster.get(n0), node_to_cluster.get(n1)
        if c0 is not None and c1 is not None:
            if c0 == c1:
                clusters[c0][1] += length
                continue
            a, b = sorted([c0, c1])
            nodes_b, len_b = clusters[b]
            for nd in nodes_b:
                node_to_cluster[nd] = a
            clusters[a][0] |= nodes_b
            clusters[a][1] += len_b + length
            clusters[b] = None  # tombstone
            continue
        cid = c0 if c0 is not None else c1
        if cid is None:
            clusters.append([set(), 0.0])
            cid = len(clusters) - 1
        node_to_cluster[n0] = cid
        node_to_cluster[n1] = cid
        clusters[cid][0] |= {n0, n1}
        clusters[cid][1] += length
    live = [c for c in clusters if c is not None]
    return [c[0] for c in live], [c[1] for c in live]


def slow_tfce(values, edge_length_dict, h=2.0, e=1.0, dh=0.1, extents="num_vertices"):
    out = np.zeros_like(values, dtype=np.float32)
    mx = np.nanmax(values)
    if np.isnan(mx) or np.isinf(mx) or mx <= 0:
        return out
    step = mx / 100 if dh in (0, "auto") else dh
    for th in np.arange(step, mx + step, step):
        clusters, lens = slow_clusters(values, th, edge_length_dict)
        if extents == "num_vertices":
            ext = np.array([len(c) for c in clusters])
        else:
            ext = np.array(lens)
        tfces = (ext**e) * (th**h) * step
        covered = set()
        for c, val in zip(clusters, tfces):
            out[list(c)] += val
            covered |= c
        if extents == "num_vertices":
            singles = set(np.argwhere(values > th)[:, 0]) - covered
            if singles:
                out[list(singles)] += (1**e) * (th**h) * step
    return out


@pytest.fixture(scope="module")
def mesh():
    return icosphere(subdivisions=2, radius=50.0)  # 162 vertices


def make_tmap(rng, v, smooth_mesh=None):
    vals = rng.randn(v).astype(np.float32) * 1.5 + 0.5
    vals[rng.choice(v, size=v // 10, replace=False)] = np.nan
    return vals


def test_clusters_match_slow_reference(mesh, rng):
    edges, lens = edge_lengths(mesh)
    eld = {(int(a), int(b)): float(l) for (a, b), l in zip(edges, lens)}
    vals = make_tmap(rng, mesh.n_vertices)
    for th in [0.0, 0.5, 1.5]:
        ref_clusters, ref_lens = slow_clusters(vals, th, eld)
        res = T.calc_clusters(
            vals, th, edges, lens, return_clusters=True,
            return_cluster_edge_lengths=True, return_agg_t_values=True,
        )
        assert sorted(map(frozenset, res["clusters"])) == sorted(map(frozenset, ref_clusters))
        # edge-length sums match when aligned by cluster content
        ref_by_nodes = {frozenset(c): l for c, l in zip(ref_clusters, ref_lens)}
        for c, l in zip(res["clusters"], res["cluster_edge_lengths"]):
            assert abs(ref_by_nodes[frozenset(c)] - l) < 1e-6
        # agg t values
        for c, tv in zip(res["clusters"], res["agg_t_values"]):
            assert abs(sum(vals[list(c)]) - tv) < 1e-4


def test_tfce_numpy_matches_slow_reference(mesh, rng):
    edges, lens = edge_lengths(mesh)
    eld = {(int(a), int(b)): float(l) for (a, b), l in zip(edges, lens)}
    vals = make_tmap(rng, mesh.n_vertices)

    ref = slow_tfce(vals, eld, h=2.0, e=1.0, dh=0.1)
    ours = T.tfce_map_numpy(vals, edges, lens, h=2.0, e=1.0, dh=0.1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)

    # edge-length extents mode
    ref_el = slow_tfce(vals, eld, dh=0.2, extents="edge_lengths")
    ours_el = T.tfce_map_numpy(
        vals, edges, lens, dh=0.2, cluster_extents_measure="edge_lengths"
    )
    np.testing.assert_allclose(ours_el, ref_el, rtol=1e-4, atol=1e-3)

    # auto dh
    ref_auto = slow_tfce(vals, eld, dh=0)
    ours_auto = T.tfce_map_numpy(vals, edges, lens, dh=0)
    np.testing.assert_allclose(ours_auto, ref_auto, rtol=1e-5, atol=1e-4)


def test_tfce_degenerate_maps(mesh):
    edges, lens = edge_lengths(mesh)
    v = mesh.n_vertices
    for vals in [
        np.full(v, np.nan, dtype=np.float32),
        np.full(v, -1.0, dtype=np.float32),
        np.zeros(v, dtype=np.float32),
    ]:
        out = T.tfce_map_numpy(vals, edges, lens)
        assert np.all(out == 0)


@pytest.mark.skipif(not T.native_available(), reason="native lib not built")
def test_tfce_native_matches_numpy(mesh, rng):
    edges, lens = edge_lengths(mesh)
    vals = np.stack([make_tmap(rng, mesh.n_vertices) for _ in range(6)])

    ours_np = np.stack([T.tfce_map_numpy(v, edges, lens, dh=0.1) for v in vals])
    ours_nat = T.tfce_map_native(vals, edges, lens, dh=0.1)
    np.testing.assert_allclose(ours_nat, ours_np, rtol=1e-4, atol=1e-3)

    # edge-length extents
    nat_el = T.tfce_map_native(vals, edges, lens, cluster_extents_measure="edge_lengths")
    np_el = np.stack(
        [T.tfce_map_numpy(v, edges, lens, cluster_extents_measure="edge_lengths") for v in vals]
    )
    np.testing.assert_allclose(nat_el, np_el, rtol=1e-4, atol=1e-3)

    # auto dh + degenerate maps in a batch
    batch = np.stack([vals[0], np.full(mesh.n_vertices, np.nan, np.float32)])
    nat = T.tfce_map_native(batch, edges, lens, dh=0)
    ref0 = T.tfce_map_numpy(batch[0], edges, lens, dh=0)
    np.testing.assert_allclose(nat[0], ref0, rtol=1e-4, atol=1e-3)
    assert np.all(nat[1] == 0)


@pytest.mark.skipif(not T.native_available(), reason="native lib not built")
def test_tfce_native_fuzz_many_seeds(mesh):
    """Property fuzz: random maps across magnitudes/sparsity, native == scipy."""
    edges, lens = edge_lengths(mesh)
    for seed in range(8):
        r = np.random.RandomState(seed)
        scale = 10.0 ** r.uniform(-2, 2)
        vals = (r.randn(mesh.n_vertices) * scale + r.uniform(-1, 1) * scale).astype(np.float32)
        vals[r.rand(mesh.n_vertices) < r.uniform(0, 0.5)] = np.nan
        ref = T.tfce_map_numpy(vals, edges, lens, dh=0.1 * scale)
        nat = T.tfce_map_native(vals[None], edges, lens, dh=0.1 * scale)[0]
        denom = max(float(np.max(np.abs(ref))), 1e-9)
        assert np.max(np.abs(nat - ref)) / denom < 1e-4, seed


@pytest.mark.skipif(not T.native_available(), reason="native lib not built")
def test_tfce_native_disconnected_and_uniform(mesh):
    edges, lens = edge_lengths(mesh)
    v = mesh.n_vertices
    # all-equal positive values: one giant cluster per threshold level
    vals = np.full(v, 2.0, dtype=np.float32)
    ref = T.tfce_map_numpy(vals, edges, lens, dh=0.5)
    nat = T.tfce_map_native(vals[None], edges, lens, dh=0.5)[0]
    np.testing.assert_allclose(nat, ref, rtol=1e-5)
    # no edges at all: every above-threshold vertex is a singleton
    no_edges = np.zeros((0, 2), dtype=np.int32)
    vals = np.random.RandomState(0).rand(v).astype(np.float32) * 3
    ref = T.tfce_map_numpy(vals, no_edges, np.zeros(0), dh=0.3)
    nat = T.tfce_map_native(vals[None], no_edges, np.zeros(0), dh=0.3)[0]
    np.testing.assert_allclose(nat, ref, rtol=1e-5, atol=1e-5)


def test_native_tfce_thread_knob(mesh):
    """n_threads fan-out over the maps axis is a pure parallelisation: any
    thread count (explicit or via MMD_TFCE_THREADS) gives identical maps."""
    import os

    if not T.native_available():
        pytest.skip("native TFCE library not built")
    edges, lengths = edge_lengths(mesh)
    v = mesh.n_vertices
    rng = np.random.RandomState(3)
    maps = rng.randn(8, v).astype(np.float32) * 2.0
    base = T.tfce_map_native(maps, edges, lengths, n_threads=1)
    for nt in (2, 4):
        np.testing.assert_array_equal(
            T.tfce_map_native(maps, edges, lengths, n_threads=nt), base
        )
    os.environ["MMD_TFCE_THREADS"] = "3"
    try:
        np.testing.assert_array_equal(
            T.tfce_map_native(maps, edges, lengths), base
        )
    finally:
        del os.environ["MMD_TFCE_THREADS"]
