"""CLI: DNN feature extraction.

One entry point replacing the reference's per-model scripts under
/root/reference/feature_extraction/ (extract_clip_features.py etc.):

  python -m multimodal_decoding_tpu.cli.extract_features --model clip
  python -m multimodal_decoding_tpu.cli.extract_features --model gabor
  python -m multimodal_decoding_tpu.cli.extract_features --model clip --random-init

Model registry (Flax-native vs torch-CPU backends, reference batch sizes):
multimodal_decoding_tpu/extraction/extractors.py.
"""

import argparse

from multimodal_decoding_tpu.extraction.harness import StimuliDataset, run_extraction


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--random-init", action="store_true", default=False,
                        help="random-weight control variant "
                             "(the reference's random-imagebind pattern)")
    parser.add_argument("--stim-info-path", type=str, default=None)
    parser.add_argument("--coco-root", type=str, default=None)
    parser.add_argument("--out-path", type=str, default=None)
    return parser.parse_args()


def main():
    args = get_args()
    dataset = StimuliDataset.from_csv(args.stim_info_path, args.coco_root)

    if args.model == "gabor":
        from multimodal_decoding_tpu.extraction.gabor import make_gabor_extractor

        extract_fn = make_gabor_extractor()
        batch_size = args.batch_size or 100
        model_name = "gabor"
    elif args.model == "moten":
        from multimodal_decoding_tpu.extraction.motion_energy import (
            make_motion_energy_extractor,
        )

        extract_fn = make_motion_energy_extractor()
        batch_size = args.batch_size or 100
        model_name = "moten"
    else:
        from multimodal_decoding_tpu.extraction.extractors import REGISTRY, build_extractor

        if args.model not in REGISTRY:
            raise SystemExit(
                f"Unknown model '{args.model}'. Registered: {sorted(REGISTRY)} (+ 'gabor', 'moten'). "
                "For models without local weights, use "
                "extraction.harness.import_external_features."
            )
        _, _, extract_fn = build_extractor(args.model, pretrained=not args.random_init)
        batch_size = args.batch_size or REGISTRY[args.model].batch_size
        model_name = f"random-{args.model}" if args.random_init else args.model

    run_extraction(extract_fn, model_name, dataset, batch_size, args.out_path)


if __name__ == "__main__":
    main()
