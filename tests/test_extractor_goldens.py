"""Golden-fixture extraction parity (VERDICT round 1, next-round #7).

Recomputes the seeded tiny-model extractor outputs and compares against the
checked-in fixture: any change to a pooling recipe (CLS selection, mask
handling, projection+normalization, fused pooling) breaks these tests even
though the semantics tests still pass on their own recomputation.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "extractor_goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    assert os.path.isfile(FIXTURE), (
        "missing fixture; regenerate with python tests/make_extractor_goldens.py"
    )
    return dict(np.load(FIXTURE))


@pytest.fixture(scope="module")
def recomputed():
    from tests.make_extractor_goldens import compute_all

    return compute_all()


GOLDEN_KEYS = [
    "clip_text_embeds", "clip_image_embeds",
    "bert_lang_mean", "bert_lang_cls",
    "flava_lang_cls", "flava_vision_cls", "flava_fused_mean", "flava_fused_cls",
    "vilt_fused_mean", "vilt_fused_cls",
    "visualbert_fused_mean", "visualbert_fused_cls",
    "imagebind_lang_cls", "imagebind_vision_cls",
]


def test_golden_keys_complete(goldens):
    assert set(goldens) == set(GOLDEN_KEYS)


@pytest.mark.parametrize("key", GOLDEN_KEYS)
def test_extractor_output_matches_golden(goldens, recomputed, key):
    np.testing.assert_allclose(recomputed[key], goldens[key], rtol=2e-4, atol=2e-5)


# --- real-weight goldens (VERDICT round-2 #6) ------------------------------

REAL_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures", "extractor_goldens_real.npz")


def test_real_weight_goldens_when_present():
    """Auto-verify real pretrained goldens if the captured fixture was copied
    onto this box (tests/make_extractor_goldens.py --real handoff).

    Models whose weights are not in the local cache are skipped per-model,
    so a partial cache still verifies what it can.
    """
    if not os.path.isfile(REAL_FIXTURE):
        pytest.skip("no real-weight fixture (capture on a networked host: "
                    "python tests/make_extractor_goldens.py --real)")
    from multimodal_decoding_tpu.extraction.extractors import build_extractor
    from tests.make_extractor_goldens import real_golden_stimuli

    goldens = dict(np.load(REAL_FIXTURE))
    ids, captions, images = real_golden_stimuli()
    models = sorted({k.split("/")[0] for k in goldens})
    verified = 0
    for name in models:
        try:
            _, _, extract = build_extractor(name, pretrained=True)
            out = extract(ids, captions, images)
        except Exception as e:
            continue  # weights not available locally
        for key, val in out.items():
            np.testing.assert_allclose(
                np.asarray(val), goldens[f"{name}/{key}"],
                rtol=1e-3, atol=1e-4, err_msg=f"{name}/{key}",
            )
        verified += 1
    if verified == 0:
        pytest.skip("real fixture present but no model weights cached locally")


def test_real_capture_dry_run(tmp_path, monkeypatch):
    """The --real capture path runs end-to-end in CI with stub extractors:
    argument plumbing, per-model skip handling, npz + manifest outputs."""
    import json

    from multimodal_decoding_tpu import config as C
    from tests import make_extractor_goldens as G

    def stub_build(name, pretrained=True):
        assert pretrained
        if name == "blip2":
            raise RuntimeError("no weights on this box")

        def extract(ids, captions, images):
            rng = np.random.RandomState(len(name))
            return {C.VISION_CLS_FEAT_KEY: rng.randn(len(ids), 8).astype(np.float32)}

        return None, None, extract

    arrays, manifest = G.compute_real(models=["clip", "blip2", "siglip"],
                                      build=stub_build)
    assert set(arrays) == {f"clip/{C.VISION_CLS_FEAT_KEY}",
                           f"siglip/{C.VISION_CLS_FEAT_KEY}"}
    assert manifest["models"]["blip2"]["status"].startswith("skipped")
    assert manifest["models"]["clip"]["status"] == "captured"

    # CLI plumbing writes both artifacts
    out = str(tmp_path / "real.npz")
    monkeypatch.setattr(G, "compute_real", lambda models: (arrays, manifest))
    G.main(["--real", "--out", out])
    assert os.path.isfile(out)
    with open(out.replace(".npz", "_manifest.json")) as f:
        m = json.load(f)
    assert m["models"]["siglip"]["status"] == "captured"
