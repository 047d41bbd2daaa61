"""Analysis modules: generative simulation, calibration, noise ceilings."""

import numpy as np
import pytest

from multimodal_decoding_tpu.analysis import calibration as C
from multimodal_decoding_tpu.analysis import simulation as S
from multimodal_decoding_tpu.analysis.noise_ceilings import noise_ceilings


def test_ridge_classifier_matches_sklearn(rng):
    from sklearn.linear_model import RidgeClassifier
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler

    n, f, c = 120, 12, 5
    protos = rng.randn(c, f) * 2
    labels = rng.randint(0, c, size=n)
    X = (protos[labels] + rng.randn(n, f)).astype(np.float32)
    Xq = (protos[rng.randint(0, c, 40)] + rng.randn(40, f)).astype(np.float32)

    preds = S.ridge_classifier_fit_predict(X, labels, [Xq], alpha=1.0, n_classes=c)[0]
    ref = make_pipeline(StandardScaler(), RidgeClassifier(alpha=1.0)).fit(X, labels)
    ref_preds = ref.predict(Xq)
    # identical up to ties in the decision scores
    assert np.mean(preds == ref_preds) > 0.95


def test_simulation_conditions_sanity():
    """Same-representation condition: agnostic ~ specific; just_noise mod2 fails."""
    rows = S.train_and_eval(
        "gauss_same_stddev", alpha=1.0, n_seeds=2,
        n_train_per_class=20, n_test_per_class=20, n_classes=8, n_voxels=200,
    )
    import pandas as pd

    df = pd.DataFrame(rows)
    agn = df[(df.decoder_type == "modality_agnostic") & (df.modality == "avg")].acc.mean()
    assert agn > 0.4  # well above chance (1/8)

    rows_noise = S.train_and_eval(
        "just_noise", alpha=1.0, n_seeds=2,
        n_train_per_class=20, n_test_per_class=20, n_classes=8, n_voxels=200,
    )
    dfn = pd.DataFrame(rows_noise)
    mod2 = dfn[(dfn.decoder_type == "modality_specific_mod2") & (dfn.modality == "mod2")]
    assert mod2.acc.mean() < 0.3  # mod2 carries no signal


def test_mod2_prototype_conditions(rng):
    protos = rng.rand(4, 8)
    indep = rng.rand(4, 8)
    g = np.random.default_rng(0)
    for cond in S.SECOND_MODALITY_CONDITIONS:
        out = S._mod2_prototypes(protos, indep, cond, g)
        assert out.shape == protos.shape
    np.testing.assert_allclose(S._mod2_prototypes(protos, indep, "inverse", g), -protos)
    half = S._mod2_prototypes(protos, indep, "half_noise_half_same", g)
    np.testing.assert_allclose(half[:, 4:], protos[:, 4:])
    assert np.all(half[:, :4] == 0)
    ortho = S._mod2_prototypes(protos, indep, "orthogonal", g)
    # reference formula (modeling_decoding.py:85-91): x -= x.dot(k)*k without
    # normalising k first, then x /= |x| — output is unit-norm but only
    # approximately decorrelated; we replicate the formula, so assert its
    # actual invariant (unit norm) rather than true orthogonality.
    np.testing.assert_allclose(np.linalg.norm(ortho, axis=1), 1.0, atol=1e-9)


def test_t5_cdf_matches_scipy():
    from scipy import stats as sps

    ts = np.linspace(-4, 4, 9)
    np.testing.assert_allclose(C.t5_cdf(ts), sps.t.cdf(ts, df=5), atol=1e-10)
    q95 = C.t5_quantile(0.95)
    assert abs(q95 - sps.t.ppf(0.95, df=5)) < 1e-6
    # min-of-two calibration: the reference records x~=0.82 shift at 0.95
    # min of two t's is stochastically smaller -> smaller 95th percentile;
    # the reference records x=0.824 for this quantile
    # (t_value_simulations.py:32 comment)
    q95_min = C.t5_quantile(0.95, cdf=C.t5_min_of_two_cdf)
    assert q95_min < q95
    assert abs(q95_min - 0.824) < 1e-3
    np.testing.assert_allclose(
        C.t5_min_of_two_cdf(2.0), 1 - (1 - sps.t.cdf(2.0, df=5)) ** 2, atol=1e-10
    )


def test_t_threshold_monte_carlo_small():
    out = C.t_threshold_monte_carlo(
        n_perms=200, n_subjects=6, n_latents=20, n_preds=3, dim=32,
        p_vals=(0.05,), seed=0,
    )
    cutoff, min_acc = out[0.05]
    assert 0.5 < cutoff < 15.0  # positive-tail cutoff for a null t
    assert np.isnan(min_acc) or min_acc > 0.4


def test_noise_ceilings(rng):
    base = rng.randn(20, 15)
    betas = {f"sub-0{i}": base + 0.3 * rng.randn(20, 15) for i in range(1, 5)}
    out = noise_ceilings(betas)
    for s, (lower, upper) in out.items():
        assert -1 <= lower <= upper <= 1
        assert upper > 0.5  # shared structure dominates


def test_intersession_alignment_qc_example(tmp_path):
    """examples/intersession_alignment_qc.py: MI-based QC across synthetic
    sessions (intersession_alignment.ipynb pattern; VERDICT round-2 #8)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "intersession_qc",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "intersession_alignment_qc.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    data = mod.synthetic_sessions(n_subjects=2, n_sessions=3, shape=(12, 14, 10))
    rows = mod.qc_table(data, bins=32)
    # 2 subjects x 2 non-reference sessions x 2 variants
    assert len(rows) == 8
    # coregistration recovers alignment lost to drift for every subject
    for subject in data:
        raw = [r["mutual_information"] for r in rows
               if r["subject"] == subject and r["variant"] == "raw"]
        coreg = [r["mutual_information"] for r in rows
                 if r["subject"] == subject and r["variant"] == "coregistered"]
        assert np.mean(coreg) > np.mean(raw)
    out = mod.plot_qc(rows, str(tmp_path / "mi.png"))
    assert os.path.getsize(out) > 1000
