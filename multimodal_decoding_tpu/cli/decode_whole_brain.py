"""CLI: whole-brain ridge decoding.

Mirrors /root/reference/analyses/decoding/ridge_regression_decoding.py:190-229
(same flags, same defaults) over the TPU-native pipeline.

Usage: python -m multimodal_decoding_tpu.cli.decode_whole_brain [--surface] ...
"""

import argparse
import os

from multimodal_decoding_tpu.config import (
    DEFAULT_ALPHAS,
    DEFAULT_MODEL,
    DEFAULT_RESOLUTION,
    FEATURE_COMBINATION_CHOICES,
    FMRI_BETAS_DIR,
    LANG_FEAT_COMBINATION_CHOICES,
    MODALITY_AGNOSTIC,
    RIDGE_DECODER_OUT_DIR,
    SELECT_DEFAULT,
    SUBJECTS,
    TRAINING_MODES,
    VISION_FEAT_COMBINATION_CHOICES,
)
from multimodal_decoding_tpu.decoding.whole_brain import WholeBrainConfig, run


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--betas-dir", type=str, default=FMRI_BETAS_DIR)
    parser.add_argument("--training-modes", type=str, nargs="+",
                        default=[MODALITY_AGNOSTIC], choices=TRAINING_MODES)
    parser.add_argument("--models", type=str, nargs="+", default=[DEFAULT_MODEL])
    parser.add_argument("--features", type=str, default=SELECT_DEFAULT,
                        choices=FEATURE_COMBINATION_CHOICES)
    parser.add_argument("--test-features", type=str, default=SELECT_DEFAULT,
                        choices=FEATURE_COMBINATION_CHOICES)
    parser.add_argument("--vision-features", type=str, default=SELECT_DEFAULT,
                        choices=VISION_FEAT_COMBINATION_CHOICES)
    parser.add_argument("--lang-features", type=str, default=SELECT_DEFAULT,
                        choices=LANG_FEAT_COMBINATION_CHOICES)
    parser.add_argument("--subjects", type=str, nargs="+", default=SUBJECTS)
    parser.add_argument("--l2-regularization-alphas", type=float, nargs="+",
                        default=list(DEFAULT_ALPHAS))
    parser.add_argument("--surface", action="store_true", default=False)
    parser.add_argument("--resolution", default=DEFAULT_RESOLUTION)
    parser.add_argument("--masks", nargs="+", type=str, default=[None])
    parser.add_argument("--multichip", action="store_true", default=False,
                        help="feature-shard the gram/query kernels over all "
                             "local devices (tensor parallel)")
    parser.add_argument("--overwrite", action="store_true", default=False)
    parser.add_argument("--out-dir", type=str, default=RIDGE_DECODER_OUT_DIR)
    return parser.parse_args()


def main():
    args = get_args()
    os.makedirs(args.out_dir, exist_ok=True)
    cfg = WholeBrainConfig(
        betas_dir=args.betas_dir,
        training_modes=args.training_modes,
        subjects=args.subjects,
        models=args.models,
        features=args.features,
        test_features=args.test_features,
        vision_features=args.vision_features,
        lang_features=args.lang_features,
        alphas=tuple(args.l2_regularization_alphas),
        surface=args.surface,
        resolution=args.resolution,
        masks=args.masks,
        overwrite=args.overwrite,
        out_dir=args.out_dir,
        mesh="auto" if args.multichip else None,
    )
    run(cfg)


if __name__ == "__main__":
    main()
