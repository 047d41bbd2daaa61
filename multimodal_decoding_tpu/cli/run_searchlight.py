"""CLI: surface searchlight decoding.

Mirrors /root/reference/analyses/decoding/searchlight/searchlight.py:321-362
plus TPU-native extensions (--l2-alphas for per-vertex CV, --block-size,
--mesh-dir pointing at FreeSurfer {lh,rh}.inflated geometry).
"""

import argparse
import os

from multimodal_decoding_tpu.config import (
    DEFAULT_MODEL,
    DEFAULT_RESOLUTION,
    FEATURE_COMBINATION_CHOICES,
    FMRI_BETAS_SURFACE_DIR,
    FS_HEMI_NAMES,
    LANG_FEAT_COMBINATION_CHOICES,
    MODALITY_AGNOSTIC,
    SEARCHLIGHT_OUT_DIR,
    SELECT_DEFAULT,
    SUBJECTS,
    SURFACE_MESH_DIR,
    TRAINING_MODES,
    VISION_FEAT_COMBINATION_CHOICES,
)
from multimodal_decoding_tpu.decoding.searchlight import SearchlightConfig, run
from multimodal_decoding_tpu.io.surface import read_freesurfer_geometry


def load_mesh_coords(mesh_dir: str, resolution: str, hemis) -> dict:
    """Load inflated-mesh coordinates: <mesh_dir>/<resolution>/{lh,rh}.inflated."""
    coords = {}
    for hemi in hemis:
        path = os.path.join(mesh_dir, resolution, f"{FS_HEMI_NAMES[hemi]}.inflated")
        coords[hemi] = read_freesurfer_geometry(path).coordinates
    return coords


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--betas-dir", type=str, default=FMRI_BETAS_SURFACE_DIR)
    parser.add_argument("--training-modes", type=str, nargs="+",
                        default=[MODALITY_AGNOSTIC], choices=TRAINING_MODES)
    parser.add_argument("--model", type=str, default=DEFAULT_MODEL)
    parser.add_argument("--features", type=str, default=SELECT_DEFAULT,
                        choices=FEATURE_COMBINATION_CHOICES)
    parser.add_argument("--test-features", type=str, default=SELECT_DEFAULT,
                        choices=FEATURE_COMBINATION_CHOICES)
    parser.add_argument("--vision-features", type=str, default=SELECT_DEFAULT,
                        choices=VISION_FEAT_COMBINATION_CHOICES)
    parser.add_argument("--lang-features", type=str, default=SELECT_DEFAULT,
                        choices=LANG_FEAT_COMBINATION_CHOICES)
    parser.add_argument("--subjects", type=str, nargs="+", default=SUBJECTS)
    parser.add_argument("--resolution", type=str, default=DEFAULT_RESOLUTION)
    parser.add_argument("--hemis", type=str, nargs="+", default=["left", "right"])
    parser.add_argument("--l2-regularization-alpha", type=float, default=1)
    parser.add_argument("--l2-alphas", type=float, nargs="+", default=None,
                        help="enable per-vertex CV over this alpha grid")
    parser.add_argument("--radius", type=float, default=None)
    parser.add_argument("--n-neighbors", type=int, default=None)
    parser.add_argument("--create-null-distr", default=False, action="store_true")
    parser.add_argument("--n-permutations-per-subject", type=int, default=100)
    parser.add_argument("--block-size", type=int, default=None)
    parser.add_argument("--mesh-dir", type=str, default=SURFACE_MESH_DIR)
    parser.add_argument("--out-dir", type=str, default=SEARCHLIGHT_OUT_DIR)
    parser.add_argument("--overwrite", action="store_true", default=False)
    parser.add_argument("--fast-math", action="store_true", default=False,
                        help="bfloat16 storage + single-pass MXU (~2-4x faster; "
                             "accuracy deviations ~1e-2, cf. the reference's "
                             "float16 inputs)")
    parser.add_argument("--adjacency-cache-dir", type=str, default="auto",
                        help="cache dir for the kNN/radius adjacency build "
                             "(~680s single-core at fsaverage7); 'auto' = "
                             "<out-dir>/.adjacency_cache, 'none' disables")
    parser.add_argument("--stream-ingest", type=str, default=None,
                        choices=["auto", "on", "off"],
                        help="stream betas cache -> device in O(chunk) host "
                             "RAM (parallel/ingest.py); auto = on for >2 GB "
                             "cached single-process runs; unset = env "
                             "MMD_STREAM_INGEST, default auto")
    parser.add_argument("--strict-cv", action="store_true", default=False,
                        help="run CV alpha selection at f32-HIGHEST cholesky "
                             "instead of the fast path (~3.5x slower; the fast "
                             "path is parity-exact, check_cv_parity.py)")
    return parser.parse_args()


def main():
    args = get_args()
    os.makedirs(args.out_dir, exist_ok=True)
    coords = load_mesh_coords(args.mesh_dir, args.resolution, args.hemis)
    cfg = SearchlightConfig(
        betas_dir=args.betas_dir,
        mesh_coords=coords,
        model=args.model,
        features=args.features,
        test_features=args.test_features,
        vision_features=args.vision_features,
        lang_features=args.lang_features,
        subjects=args.subjects,
        training_modes=args.training_modes,
        hemis=args.hemis,
        resolution=args.resolution,
        l2_regularization_alpha=args.l2_regularization_alpha,
        alphas_cv=args.l2_alphas,
        radius=args.radius,
        n_neighbors=args.n_neighbors,
        create_null_distr=args.create_null_distr,
        n_permutations_per_subject=args.n_permutations_per_subject,
        block_size=args.block_size,
        out_dir=args.out_dir,
        overwrite=args.overwrite,
        fast_math=args.fast_math,
        fast_cv=not args.strict_cv,
        stream_ingest=args.stream_ingest,
        adjacency_cache_dir=(
            None if args.adjacency_cache_dir == "none"
            else os.path.join(args.out_dir, ".adjacency_cache")
            if args.adjacency_cache_dir == "auto" else args.adjacency_cache_dir),
    )
    run(cfg)


if __name__ == "__main__":
    main()
