"""Scale-realistic multi-device integration (VERDICT round-2 #4).

The REAL production entry points — parallel.searchlight_runner.run_searchlight
(alpha-CV + null mode + checkpoint/resume) and the permutation pipeline — on
the 8-virtual-device CPU mesh at fsaverage5 scale: 10,242 vertices, which
does NOT divide the mesh evenly (10242 % 8 == 2), exercising block padding,
uneven shards, [B, P] null outputs and mesh-sharded group statistics, with
score/null parity asserted against the single-device run.
"""

import os

import numpy as np
import pytest

import jax

from multimodal_decoding_tpu.io.surface import edge_lengths, icosphere, knn_adjacency
from multimodal_decoding_tpu.parallel.mesh import vertex_mesh

N_TRAIN, N_TEST, N_IMAG, D, K = 24, 10, 3, 4, 6
ALPHAS = [1e-1, 1e1, 1e3]
P_SHUFFLES = 4
BLOCK = 1024


@pytest.fixture(scope="module")
def fs5_problem():
    mesh = icosphere(subdivisions=5, radius=50.0)
    assert mesh.n_vertices == 10242 and mesh.n_vertices % 8 != 0
    adjacency, _ = knn_adjacency(mesh.coordinates, K)
    rng = np.random.RandomState(0)
    Y_train = rng.randn(N_TRAIN, D).astype(np.float32)
    Y_test = rng.randn(N_TEST, D).astype(np.float32)
    Y_imag = rng.randn(N_IMAG, D).astype(np.float32)
    W = rng.randn(D, mesh.n_vertices).astype(np.float32) * 0.4
    X = np.concatenate([Y_train, Y_test, Y_imag]) @ W
    X += rng.randn(*X.shape).astype(np.float32)
    # within-modality shuffles (reference data.py:554-561): the engine's
    # rank-count gather assumes each permutation maps captions to captions
    # and images to images
    n_cap = 5
    shuffles = np.stack([
        np.concatenate([rng.permutation(n_cap), n_cap + rng.permutation(n_cap)])
        for _ in range(P_SHUFFLES)
    ]).astype(np.int32)
    stim_types = np.array(["caption"] * n_cap + ["image"] * n_cap)
    return mesh, adjacency, X, Y_train, Y_test, Y_imag, shuffles, stim_types


def _run(fs5_problem, mesh_devices, checkpoint_path=None, **kw):
    from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight

    mesh, adjacency, X, Y_train, Y_test, Y_imag, shuffles, stim_types = fs5_problem
    return run_searchlight(
        X[:N_TRAIN], X[N_TRAIN:N_TRAIN + N_TEST], X[N_TRAIN + N_TEST:],
        Y_train, Y_test, Y_imag, adjacency, stim_types,
        alphas_cv=ALPHAS, shuffles=shuffles, block_size=BLOCK,
        mesh=vertex_mesh(mesh_devices), progress=False,
        cv_precision=jax.lax.Precision.DEFAULT, cv_solver="schur-cb",
        checkpoint_path=checkpoint_path, checkpoint_every=2, **kw,
    )


def test_fs5_cv_null_mesh_parity_and_resume(fs5_problem, tmp_path):
    """8-device CV+null run (resumed from a mid-run kill) == 1-device run."""
    import multimodal_decoding_tpu.parallel.searchlight_runner as runner_mod

    # --- single-device reference ------------------------------------------
    scores_1, aux_1 = _run(fs5_problem, jax.devices()[:1])
    assert scores_1[next(iter(scores_1))].shape == (10242,)

    # --- 8-device run, killed mid-way, then resumed -----------------------
    ckpt = str(tmp_path / "sl.ckpt.npz")
    real_block = runner_mod.searchlight_block_cv_with_null
    calls = {"n": 0}

    def dying_block(*a, **k):
        calls["n"] += 1
        if calls["n"] == 6:
            raise RuntimeError("injected mid-run failure")
        return real_block(*a, **k)

    runner_mod.searchlight_block_cv_with_null = dying_block
    try:
        with pytest.raises(RuntimeError, match="injected"):
            _run(fs5_problem, jax.devices()[:8], checkpoint_path=ckpt)
    finally:
        runner_mod.searchlight_block_cv_with_null = real_block
    assert os.path.isfile(ckpt)  # shard-granular checkpoint survived the kill

    scores_8, aux_8 = _run(fs5_problem, jax.devices()[:8], checkpoint_path=ckpt)
    assert not os.path.isfile(ckpt)  # consumed on completion
    assert aux_8["resumed_at_block"] >= 1  # really resumed, and reported it

    # --- parity: scores, alphas, null distributions -----------------------
    for m in scores_1:
        np.testing.assert_allclose(scores_8[m], scores_1[m], rtol=2e-5,
                                   atol=2e-6, err_msg=m)
    np.testing.assert_array_equal(aux_8["best_alpha"], aux_1["best_alpha"])
    for m in aux_1["null_scores"]:
        assert aux_1["null_scores"][m].shape == (10242, P_SHUFFLES)
        np.testing.assert_allclose(
            aux_8["null_scores"][m], aux_1["null_scores"][m], rtol=2e-5,
            atol=2e-6, err_msg=m,
        )


def test_fs5_permutation_pipeline_sharded(fs5_problem, tmp_path):
    """Permutation pipeline at fsaverage5 scale on the 8-device mesh.

    Builds production-layout artifacts (results pickle + null npz per
    training mode) from a real run_searchlight null run, then checks the
    mesh-sharded group-null statistics against the single-device path.
    """
    from multimodal_decoding_tpu.config import (
        MODALITY_AGNOSTIC,
        MODALITY_SPECIFIC_CAPTIONS,
        MODALITY_SPECIFIC_IMAGES,
        LatentFeatsConfig,
    )
    from multimodal_decoding_tpu.decoding import permutation as PT
    from multimodal_decoding_tpu.decoding.searchlight import get_results_file_path
    from multimodal_decoding_tpu.io import artifacts

    mesh, adjacency, X, Y_train, Y_test, Y_imag, shuffles, stim_types = fs5_problem
    subjects = ["sub-01", "sub-02", "sub-03"]
    sl_out = str(tmp_path / "searchlight")
    feats = LatentFeatsConfig("clip", verbose=False)
    rng = np.random.RandomState(7)

    for subject in subjects:
        # per-subject latents vary; the compiled program is reused across
        # subjects and modes (same shapes), so this stays cheap
        Yt = Y_train + 0.3 * rng.randn(*Y_train.shape).astype(np.float32)
        scores, aux = _run(
            (mesh, adjacency, X, Yt, Y_test, Y_imag, shuffles, stim_types),
            jax.devices()[:8],
        )
        for mode in (MODALITY_AGNOSTIC, MODALITY_SPECIFIC_IMAGES,
                     MODALITY_SPECIFIC_CAPTIONS):
            path = get_results_file_path(
                feats, "left", subject, mode, "fsaverage5", f"n_neighbors_{K}",
                "cv", sl_out,
            )
            artifacts.save_pickle(
                {"nan_locations": np.zeros(mesh.n_vertices, bool),
                 "score_maps": scores}, path,
            )
            artifacts.save_null_scores_npz(
                os.path.join(os.path.dirname(path), "null_distr.npz"),
                aux["null_scores"],
            )

    edges, lens = edge_lengths(mesh)
    base = dict(
        subjects=subjects, model="clip", mod_specific_images_model="clip",
        mod_specific_captions_model="clip", n_neighbors=K,
        l2_regularization_alpha="cv", resolution="fsaverage5",
        n_permutations_group_level=16, p_value_threshold=0.07,
        edges_by_hemi={"left": (edges, lens)}, hemis=["left"],
        searchlight_out_dir=sl_out, null_chunk=6,  # does NOT divide the mesh
    )
    cfg_1 = PT.PermutationConfig(out_dir=str(tmp_path / "perm1"), **base)
    res_1 = PT.null_max_tfce_statistics(cfg_1, mesh=None)

    cfg_8 = PT.PermutationConfig(out_dir=str(tmp_path / "perm8"), **base)
    res_8 = PT.null_max_tfce_statistics(cfg_8, mesh=vertex_mesh(jax.devices()[:8]),
                                       emulate_host_ingestion=True)

    assert res_1["null_max"].shape == (16,)
    np.testing.assert_allclose(res_8["null_max"], res_1["null_max"], rtol=1e-5)

    # full stats on the sharded path: t -> TFCE -> p at 10,242 vertices
    stats = PT.calc_test_statistics(cfg_8, mesh=vertex_mesh(jax.devices()[:8]))
    assert stats["p_values"]["left"].shape == (10242,)
    assert np.isfinite(stats["significance_cutoff"])
