"""Radius-mode memory profile at fsaverage7 scale (VERDICT r1 #8).

Radius-mode adjacency pads every vertex's neighbour list to the global max
count Kmax (io/surface.py radius_adjacency); the gathered patch tensor costs
``N * B * Kmax * 4`` bytes regardless of the mean count, so the padding waste
ratio Kmax/Kmean decides whether the static-shape design holds or a
masked-gram/Pallas variant is needed.

fsaverage7 has 163,842 vertices per hemisphere — exactly an order-7
icosphere.  Vertex density on the inflated surface is near-uniform (it is a
sphere), so the icosphere is the right geometry model; real cortical meshes
add ~10-20% spread.  This script sweeps radii around the one matching the
reference's default 750-NN patch size and reports Kmax/Kmean + the patch
tensor HBM cost at production N and block size.

Host-only (no TPU needed):  python benchmarks/radius_profile.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_decoding_tpu.io.surface import icosphere  # noqa: E402


def main():
    subdiv = int(os.environ.get("RADIUS_PROFILE_SUBDIV", "6"))
    mesh = icosphere(subdivisions=subdiv, radius=100.0)  # ~inflated-surface scale
    v = mesh.n_vertices
    coords = mesh.coordinates.astype(np.float32)
    print(f"icosphere subdiv={subdiv}: V={v} (fsaverage7 = 163842 = subdiv 7)")

    # densities scale with 4^subdiv: map results to fsaverage7 by scaling the
    # radius by 2^(7-subdiv) equivalence (same expected neighbour count)
    scale_note = 2.0 ** (7 - subdiv)

    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors().fit(coords)

    # radius giving ~750 mean neighbours: area fraction 750/V of the sphere
    # -> r ~ 2 R sin(theta/2) with cos(theta) = 1 - 2*750/V
    area_frac = 750.0 / 163842
    cos_t = 1 - 2 * area_frac * scale_note**2  # adjusted for this density
    r750 = float(100.0 * np.sqrt(2 * (1 - cos_t)))

    n_train, block = 8192, 128
    for radius in (0.75 * r750, r750, 1.25 * r750):
        counts = np.array([len(x) for x in nn.radius_neighbors(
            coords, radius=radius, return_distance=False)])
        kmax, kmean, kmin = counts.max(), counts.mean(), counts.min()
        waste = kmax / kmean
        patch_gb = n_train * block * kmax * 4 / 2**30
        print(f"radius={radius:6.2f}mm (fs7-equivalent {radius / scale_note:6.2f}mm): "
              f"Kmean={kmean:7.1f} Kmax={kmax:5d} Kmin={kmin:5d} "
              f"pad-waste={waste:4.2f}x "
              f"patch[N={n_train},B={block},Kmax] = {patch_gb:.2f} GiB")

    # ---- density-warped variants (VERDICT r2 weak #6) ---------------------
    # Real cortical meshes are not perfectly uniform: inflation leaves
    # ~10-40% metric distortion, and the searchlight runs on the inflated
    # surface.  Model this as a smooth low-frequency tangential warp of the
    # sphere — q = normalize(p + lam * grad_tan f(p)) with f a sum of random
    # quadratic lobes — and sweep the warp amplitude until the local-area
    # spread brackets published cortical distortion.  Reported per variant:
    # the area spread actually achieved (p95/p5 of local neighbour counts)
    # and the resulting pad waste.
    rng = np.random.default_rng(0)
    units = rng.standard_normal((4, 3))
    units /= np.linalg.norm(units, axis=1, keepdims=True)
    cs = rng.standard_normal(4)

    p_hat = coords / np.linalg.norm(coords, axis=1, keepdims=True)

    def warp(lam):
        # grad of f(p) = sum_j c_j (u_j . p)^2 projected to the tangent plane
        dots = p_hat @ units.T  # [V, 4]
        grad = 2 * (dots * cs) @ units  # [V, 3]
        grad_tan = grad - (np.sum(grad * p_hat, axis=1, keepdims=True)) * p_hat
        q = p_hat + lam * grad_tan
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return (q * 100.0).astype(np.float32)

    for lam in (0.01, 0.02, 0.04, 0.1):
        wc = warp(lam)
        nn_w = NearestNeighbors().fit(wc)
        counts = np.array([len(x) for x in nn_w.radius_neighbors(
            wc, radius=r750, return_distance=False)])
        kmax, kmean = counts.max(), counts.mean()
        p5, p95 = np.percentile(counts, [5, 95])
        waste = kmax / kmean
        patch_gb = n_train * block * kmax * 4 / 2**30
        print(f"warp lam={lam:4.2f}: density spread p95/p5={p95 / p5:4.2f}x "
              f"Kmean={kmean:7.1f} Kmax={kmax:5d} pad-waste={waste:4.2f}x "
              f"patch = {patch_gb:.2f} GiB")

    print(
        "\nverdict: on the near-uniform inflated sphere the padding waste is the "
        "Kmax/Kmean ratio above; block size (searchlight_runner._auto_block_size) "
        "already divides the 2 GiB patch budget by Kmax, so radius mode trades "
        "block size, not correctness. A masked-gram Pallas kernel is only "
        "worthwhile if pad-waste exceeds ~1.5x on real cortical meshes — the "
        "warped variants above show where that line sits in density-spread terms."
    )


if __name__ == "__main__":
    main()
