"""Multi-host input pipeline on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import pytest

from multimodal_decoding_tpu.parallel import multihost as MH
from multimodal_decoding_tpu.parallel.mesh import vertex_mesh


def test_host_shard_bounds_cover_exactly():
    for n_rows in (7, 8, 16, 23):
        for n_hosts in (1, 2, 3, 8):
            seen = []
            for h in range(n_hosts):
                lo, hi = MH.host_shard_bounds(n_rows, h, n_hosts)
                seen.extend(range(lo, hi))
            assert seen == list(range(n_rows)), (n_rows, n_hosts)
    with pytest.raises(ValueError):
        MH.host_shard_bounds(10, 3, 3)


def test_global_assembly_and_replication(rng):
    mesh = vertex_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    n, v = 4 * n_dev, 33
    rows = rng.randn(n, v).astype(np.float32)

    x_sharded = MH.global_from_host_shards(rows, 0, n, mesh)
    # sharded along rows: each device holds n/n_dev rows
    assert x_sharded.sharding.shard_shape(x_sharded.shape) == (n // n_dev, v)

    x_rep = MH.replicate_rows(x_sharded, mesh)
    assert x_rep.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(x_rep), rows)


def test_non_divisible_rows_rejected(rng):
    mesh = vertex_mesh()
    rows = rng.randn(9, 4).astype(np.float32)
    with pytest.raises(ValueError, match="divisible"):
        MH.global_from_host_shards(rows, 0, 9, mesh)


def test_distributed_beta_matrix_reads_and_pads(tmp_path, rng):
    from multimodal_decoding_tpu.io.gifti import write_gifti

    mesh = vertex_mesh()
    v = 12
    n = 11  # not a device multiple: exercises padding
    data = rng.randn(n, v).astype(np.float32)
    paths = []
    for i in range(n):
        p = str(tmp_path / f"beta_{i:04d}.gii")
        write_gifti(p, data[i])
        paths.append(p)

    x_rep, n_orig = MH.distributed_beta_matrix(paths, mesh)
    assert n_orig == n
    assert x_rep.shape == (16, v)  # padded to the 8-device multiple
    np.testing.assert_allclose(np.asarray(x_rep)[:n], data, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(x_rep)[n:], 0.0)


def test_replicated_rows_feed_searchlight_runner(tmp_path, rng):
    """The assembled matrix drives the runner identically to host numpy."""
    from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight

    mesh = vertex_mesh(jax.devices()[:1])
    n_train, v, k, d = 27, 32, 5, 4  # 27 + 10 + 3 = 40 rows: an 8-device multiple
    X = rng.randn(n_train + 10 + 3, v).astype(np.float32)
    p = dict(
        X_train=X[:n_train], X_test=X[n_train:n_train + 10], X_imag=X[-3:],
        Y_train=rng.randn(n_train, d).astype(np.float32),
        Y_test=rng.randn(10, d).astype(np.float32),
        Y_imag=rng.randn(3, d).astype(np.float32),
        adjacency=np.stack([rng.choice(v, size=k, replace=False) for _ in range(v)]
                           ).astype(np.int32),
        stim_types_test=np.array(["caption"] * 5 + ["image"] * 5),
    )
    ref, _ = run_searchlight(**p, alpha=1.0, block_size=8, progress=False, mesh=mesh)

    # same X but arriving as a replicated global array from the input pipeline
    full_mesh = vertex_mesh()
    x_sharded = MH.global_from_host_shards(X, 0, len(X), full_mesh)
    x_rep = np.asarray(MH.replicate_rows(x_sharded, full_mesh))
    p2 = dict(p, X_train=x_rep[:n_train], X_test=x_rep[n_train:n_train + 10],
              X_imag=x_rep[-3:])
    got, _ = run_searchlight(**p2, alpha=1.0, block_size=8, progress=False, mesh=mesh)
    for m in ref:
        np.testing.assert_allclose(got[m], ref[m], atol=1e-6)


def test_sharded_null_t_maps_matches_single_device(rng):
    """Permutation axis sharded over the 8-device mesh == unsharded t-maps."""
    from multimodal_decoding_tpu.ops.stats import group_permutations, null_t_maps
    from multimodal_decoding_tpu.parallel.distributed import sharded_null_t_maps

    s, p_subj, v = 5, 7, 30
    scores = rng.randn(s, p_subj, v).astype(np.float32) * 0.05 + 0.5
    perms = group_permutations(p_subj, s, 16)  # divisible by the 8-dev mesh

    ref = np.asarray(null_t_maps(scores, perms, popmean=0.5))
    mesh = vertex_mesh()
    got = np.asarray(sharded_null_t_maps(scores, perms, 0.5, mesh))
    assert got.shape == (16, v)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_feature_sharded_gram_cache_matches_single_device(rng):
    """Whole-brain kernels with the feature axis sharded over the 8-dev mesh
    equal the single-device computation (tensor-parallel gram)."""
    from multimodal_decoding_tpu.decoding.whole_brain import GramCache
    from multimodal_decoding_tpu.parallel.mesh import feature_mesh

    n, f = 20, 53  # f not divisible by 8: exercises the zero-pad path
    Xtr = rng.randn(n, f).astype(np.float32)
    Xte = rng.randn(7, f).astype(np.float32)
    Xim = rng.randn(3, f).astype(np.float32)
    ref = GramCache(Xtr, Xte, Xim)
    got = GramCache(Xtr, Xte, Xim, mesh=feature_mesh())
    np.testing.assert_allclose(np.asarray(got.K), np.asarray(ref.K), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.K_test), np.asarray(ref.K_test), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.K_imag), np.asarray(ref.K_imag), atol=1e-4)
