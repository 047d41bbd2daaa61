"""Example: nearest-neighbour stimulus ranking from stored predictions.

The script form of the reference's NN-ranking notebook: load a whole-brain
results pickle (which stores predictions + latents — the offline-recompute
contract, ridge_regression_decoding.py:137-157), rank every test stimulus by
cosine distance to each prediction, print top-k retrievals and the
identification rank distribution.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

from multimodal_decoding_tpu.io.artifacts import load_pickle
from multimodal_decoding_tpu.ops.metrics import cosine_distances, standardize


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("results_pickle", type=str)
    parser.add_argument("--top-k", type=int, default=5)
    args = parser.parse_args()

    res = load_pickle(args.results_pickle)
    preds = np.asarray(standardize(res["predictions"]))
    latents = np.asarray(res["latents"])
    ids = np.asarray(res["stimulus_ids"])
    types = np.asarray(res["stimulus_types"])

    dist = np.asarray(cosine_distances(preds, latents))
    order = np.argsort(dist, axis=1)
    ranks = np.array([int(np.where(order[i] == i)[0][0]) for i in range(len(ids))])

    print(f"{len(ids)} test stimuli | median identification rank: {np.median(ranks):.0f} "
          f"| top-1: {(ranks == 0).mean():.2f} | top-{args.top_k}: "
          f"{(ranks < args.top_k).mean():.2f}")
    for i in range(min(10, len(ids))):
        top = [f"{ids[j]}({types[j][:3]})" for j in order[i, : args.top_k]]
        print(f"  {ids[i]}({types[i][:3]}) rank={ranks[i]:3d} -> {', '.join(top)}")


if __name__ == "__main__":
    main()
