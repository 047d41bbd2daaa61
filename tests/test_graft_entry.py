"""Driver-contract coverage: entry() compiles, dryrun_multichip runs on 8 CPU devs."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_jits():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    out_np = np.asarray(out)
    assert out_np.ndim == 2 and np.all(np.isfinite(out_np))


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_2():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)


def test_sharded_gram_matches_dense(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from multimodal_decoding_tpu.parallel.distributed import sharded_gram

    mesh = Mesh(np.asarray(jax.devices()), ("f",))
    X = rng.randn(20, 64).astype(np.float32)
    Xs = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P(None, "f")))
    K = np.asarray(sharded_gram(Xs, mesh))
    np.testing.assert_allclose(K, X @ X.T, atol=1e-4)
