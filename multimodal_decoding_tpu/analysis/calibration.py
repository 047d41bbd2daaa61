"""Statistical calibration: t-cutoff Monte-Carlo + closed-form t CDFs.

Rebuilds /root/reference/analyses/visualization/t_val_threshold.py:11-46
(Monte-Carlo calibration of group-level t cutoffs for pairwise accuracy with
6 subjects) and /root/reference/analyses/supplementary/
t_value_simulations.py:9-29 (exact Student-t(5) CDF and the min-of-two-t
composite calibration), device-batched: the reference loops 10k x 6
pairwise-accuracy computations in Python; here all permutations are one
[P, S, ...] batched accuracy + t pass.
"""

from __future__ import annotations

import numpy as np


def t_threshold_monte_carlo(
    n_perms: int = 10000,
    n_subjects: int = 6,
    n_latents: int = 73,
    n_preds: int = 3,
    dim: int = 1024,
    p_vals=(0.05, 1e-2, 1e-3, 1e-4),
    seed: int = 0,
):
    """Null t distribution for chance-level pairwise accuracy (t_val_threshold.py:11-46).

    Returns {p: (t_cutoff, min_mean_acc_above_cutoff)}.
    """
    import jax
    import jax.numpy as jnp

    from multimodal_decoding_tpu.ops.metrics import pairwise_accuracy
    from multimodal_decoding_tpu.ops.stats import ttest_1samp_no_p

    key = jax.random.PRNGKey(seed)

    def one_perm(k):
        ks = jax.random.split(k, 2)
        latents = jax.random.normal(ks[0], (n_subjects, n_latents, dim))
        preds = jax.random.normal(ks[1], (n_subjects, n_preds, dim))
        accs = pairwise_accuracy(latents, preds)  # [S]
        t = ttest_1samp_no_p(accs[:, None] - 0.5)[0]
        return t, jnp.mean(accs)

    # chunked batch to bound memory
    t_vals, mean_accs = [], []
    chunk = 200
    keys = jax.random.split(key, n_perms)
    fn = jax.jit(jax.vmap(one_perm))
    for start in range(0, n_perms, chunk):
        t, m = fn(keys[start : start + chunk])
        t_vals.append(np.asarray(t))
        mean_accs.append(np.asarray(m))
    t_vals = np.concatenate(t_vals)
    mean_accs = np.concatenate(mean_accs)
    t_vals = np.where(np.isnan(t_vals) | np.isinf(t_vals), 0.0, t_vals)

    out = {}
    for thresh in p_vals:
        if thresh == 1 / n_perms:
            cutoff = float(np.max(t_vals))
        else:
            cutoff = float(np.quantile(t_vals, 1 - thresh, method="closest_observation"))
        above = mean_accs[t_vals > cutoff]
        out[thresh] = (cutoff, float(np.min(above)) if len(above) else np.nan)
    return out


def t5_cdf(t):
    """Closed-form Student-t CDF with 5 dof (t_value_simulations.py:9-10)."""
    t = np.asarray(t, dtype=np.float64)
    return 0.5 + (1 / np.pi) * (
        (t / (np.sqrt(5) * (1 + t**2 / 5))) * (1 + 2 / (3 * (1 + t**2 / 5)))
        + np.arctan(t / np.sqrt(5))
    )


def t5_min_of_two_cdf(t):
    """CDF of min of two independent t(5) variables (t_value_simulations.py:20-21)."""
    return 1 - (1 - t5_cdf(t)) ** 2


def t5_quantile(q: float, cdf=t5_cdf, lo=-50.0, hi=50.0, tol=1e-10) -> float:
    """Invert a monotone CDF by bisection (replaces the reference's linspace scan)."""
    while hi - lo > tol:
        mid = (lo + hi) / 2
        if cdf(mid) < q:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2
