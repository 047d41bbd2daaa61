"""Shared fsaverage5-scale CV+null searchlight problem (VERDICT r4 #6).

One deterministic problem definition used by BOTH sides of the 2-process
parity evidence: the in-process single-device reference
(tests/test_multiprocess_distributed.py) and the real
``jax.distributed`` workers (tests/mp_fs5_worker.py).  Mirrors the
single-process fs5 scenario of tests/test_scale_integration.py — 10,242
vertices (10242 % 8 == 2: uneven shards + block padding), alpha-CV, null
shuffles, checkpoint/resume — so the multi-host branch is exercised at a
scale where sharding is uneven and checkpoints actually rotate.
"""

import numpy as np

N_TRAIN, N_TEST, N_IMAG, D, K = 24, 10, 3, 4, 6
ALPHAS = [1e-1, 1e1, 1e3]
P_SHUFFLES = 4
BLOCK = 1024
CHECKPOINT_EVERY = 2
DIE_AT_CALL = 6  # injected failure: mid-run, after two checkpoint rotations


def make_fs5_problem():
    from multimodal_decoding_tpu.io.surface import icosphere, knn_adjacency

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
    n_cap = 5
    shuffles = np.stack([
        np.concatenate([rng.permutation(n_cap), n_cap + rng.permutation(n_cap)])
        for _ in range(P_SHUFFLES)
    ]).astype(np.int32)
    stim_types = np.array(["caption"] * n_cap + ["image"] * n_cap)
    return dict(
        X=X, Y_train=Y_train, Y_test=Y_test, Y_imag=Y_imag,
        adjacency=adjacency, shuffles=shuffles, stim_types=stim_types,
    )


def run_fs5(problem, mesh_devices, checkpoint_path=None):
    import jax

    from multimodal_decoding_tpu.parallel.mesh import vertex_mesh
    from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight

    X = problem["X"]
    return run_searchlight(
        X[:N_TRAIN], X[N_TRAIN:N_TRAIN + N_TEST], X[N_TRAIN + N_TEST:],
        problem["Y_train"], problem["Y_test"], problem["Y_imag"],
        problem["adjacency"], problem["stim_types"],
        alphas_cv=ALPHAS, shuffles=problem["shuffles"], block_size=BLOCK,
        mesh=vertex_mesh(mesh_devices), progress=False,
        cv_precision=jax.lax.Precision.DEFAULT, cv_solver="schur-cb",
        checkpoint_path=checkpoint_path, checkpoint_every=CHECKPOINT_EVERY,
    )
