"""Runner shard-granular checkpoint/resume."""

import os

import numpy as np
import jax

from multimodal_decoding_tpu.parallel.mesh import vertex_mesh
from multimodal_decoding_tpu.parallel.searchlight_runner import run_searchlight


def _problem(rng, v=64, k=6):
    n_train, d = 30, 5
    return dict(
        X_train=rng.randn(n_train, v).astype(np.float32),
        X_test=rng.randn(10, v).astype(np.float32),
        X_imag=rng.randn(3, v).astype(np.float32),
        Y_train=rng.randn(n_train, d).astype(np.float32),
        Y_test=rng.randn(10, d).astype(np.float32),
        Y_imag=rng.randn(3, d).astype(np.float32),
        adjacency=np.stack(
            [rng.choice(v, size=k, replace=False) for _ in range(v)]
        ).astype(np.int32),
        stim_types_test=np.array(["caption"] * 5 + ["image"] * 5),
    )


def test_checkpoint_resume_equivalence(tmp_path, rng):
    p = _problem(rng)
    mesh = vertex_mesh(jax.devices()[:1])
    common = dict(alpha=2.0, block_size=8, progress=False, mesh=mesh)

    ref_scores, _ = run_searchlight(**p, **common)

    # simulate a killed run: run with checkpointing, then fake partial state
    ckpt = str(tmp_path / "run.ckpt.npz")
    full_scores, _ = run_searchlight(**p, **common, checkpoint_path=ckpt, checkpoint_every=4)
    # successful completion removes the checkpoint
    assert not os.path.isfile(ckpt)
    for m in ref_scores:
        np.testing.assert_allclose(full_scores[m], ref_scores[m], atol=1e-6)

    # now create a partial checkpoint by interrupting manually: run 4 blocks
    # via a tiny adjacency slice, then write the checkpoint shape the runner
    # expects and resume over the full problem
    partial, _ = run_searchlight(
        **{**p, "adjacency": p["adjacency"][:32]}, **common
    )
    blocks = [
        {m: partial[m][i * 8 : (i + 1) * 8] for m in partial} for i in range(4)
    ]
    np.savez(
        str(tmp_path / "run.ckpt"),
        done_blocks=3,
        results=np.array(blocks, dtype=object),
        null_results=np.array([], dtype=object),
    )
    resumed, _ = run_searchlight(**p, **common, checkpoint_path=ckpt)
    for m in ref_scores:
        np.testing.assert_allclose(resumed[m], ref_scores[m], atol=1e-6)
