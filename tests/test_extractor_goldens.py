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
