"""Group permutation-statistics throughput (the reference's entry point #3).

The BASELINE config is 10,000 group permutations at fsaverage7 resolution
(searchlight_permutation_testing.py:644-660, joblib n_jobs=10 + per-shard
HDF5).  Our pipeline splits into:

  1. t-map sweep   [S, P_subj, V] scores + [P, S] permutation matrix ->
                   [P, V] t-maps, one batched gather+reduction on device
                   (ops/stats.null_t_maps; vertex-shardable over a mesh via
                   parallel/distributed.sharded_null_t_maps)
  2. TFCE          per-map descending-threshold union-find on host
                   (native/tfce.cpp, threads across permutations); only the
                   per-permutation MAX statistic feeds the null distribution

This measures both stages at production V with a reduced P and projects the
10k-permutation wall-clock.  Device timing uses chained checksums; TFCE is
timed on whatever cores this host has (rate reported per-thread so
production n-core hosts scale it).

Run exclusively:  python benchmarks/bench_group_stats.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p-device", type=int, default=2000,
                    help="group permutations for the device t-map timing")
    ap.add_argument("--p-tfce", type=int, default=50,
                    help="maps for the host TFCE timing")
    ap.add_argument("--target-p", type=int, default=10000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.io.surface import icosphere, mesh_edges
    from multimodal_decoding_tpu.ops.stats import group_permutations, null_t_maps
    from multimodal_decoding_tpu.ops.tfce import tfce_map

    on_accel = jax.devices()[0].platform != "cpu"
    S, P_subj = 6, 100
    if on_accel:
        V, P_dev, subdiv = 163842, args.p_device, 7
    else:
        V, P_dev, subdiv = 10242, 50, 3
    chance = 0.5

    key = jax.random.PRNGKey(0)
    scores = chance + 0.05 * jax.random.normal(key, (S, P_subj, V), dtype=jnp.float32)
    perms = jnp.asarray(group_permutations(P_subj, S, P_dev).astype(np.int32))
    _ = float(scores[0, 0, 0])
    log(f"scores [S={S}, P_subj={P_subj}, V={V}] on device; "
        f"P_dev={P_dev} group permutations")

    # ---- stage 1: device t-map sweep (chunked like the production path) ---
    chunk = 250
    jsweep = jax.jit(lambda sc, pm: null_t_maps(sc, pm, chance).sum())
    t0 = time.time()
    acc = jsweep(scores, perms[:chunk])
    _ = float(acc)
    log(f"t-map sweep compiled in {time.time() - t0:.0f}s; timing ...")
    t0 = time.time()
    c = jnp.float32(0.0)
    for s in range(0, P_dev, chunk):
        c = c + jsweep(scores, perms[s : s + chunk])
    assert np.isfinite(float(c))
    dt = time.time() - t0
    rate_t = P_dev / dt
    log(f"t-map sweep: {P_dev} permutations x {V} vertices in {dt:.1f}s "
        f"-> {rate_t:.0f} t-maps/s on device")

    # ---- stage 2: host TFCE over the observed-scale maps ------------------
    mesh = icosphere(subdivisions=subdiv, radius=100.0)
    edges = mesh_edges(mesh)
    rng = np.random.default_rng(0)
    t_maps_host = rng.standard_normal((args.p_tfce, mesh.n_vertices)).astype(np.float32) * 3
    # warmup (loads/builds the native lib)
    _ = tfce_map(t_maps_host[0], edges)
    t0 = time.time()
    mx = [float(np.max(tfce_map(t_maps_host[i], edges))) for i in range(args.p_tfce)]
    dt_tfce = (time.time() - t0) / args.p_tfce
    assert all(np.isfinite(mx))
    n_cores = os.cpu_count() or 1
    log(f"TFCE (native): {dt_tfce * 1e3:.1f} ms/map at V={mesh.n_vertices} "
        f"on {n_cores} core(s)")

    # ---- projection to the BASELINE 10k config ----------------------------
    target = args.target_p
    t_stage1 = target / rate_t
    t_stage2_1core = target * dt_tfce
    log(f"\nprojected {target} permutations, one hemisphere:")
    log(f"  t-map sweep (device): {t_stage1:.0f}s")
    log(f"  TFCE: {t_stage2_1core:.0f}s on 1 core -> "
        f"{t_stage2_1core / 10:.0f}s at the reference's n_jobs=10")
    log("  (stages pipeline: TFCE of chunk i overlaps the sweep of chunk "
        "i+1; the reference runs BOTH stages on CPU with joblib + HDF5 "
        "round-trips)")


if __name__ == "__main__":
    main()
