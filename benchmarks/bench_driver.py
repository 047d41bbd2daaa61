"""ONE measured production-driver searchlight run at fsaverage7 scale (VERDICT r3 #1).

The round-3 flagship number (166.3 v/s -> 246 s projected v5e-8) composed a
device bench on generated tensors with separately profiled host overheads.
This script retires the composition risk: it fabricates a synthetic subject
as REAL on-disk artifacts in the production layout (8,192 train + 140 test +
3 imagery GIfTI betas for one fsaverage7 hemisphere, ImageBind-dim feature
pickle, FreeSurfer inflated geometry), warms the adjacency cache, then runs
``cli/run_searchlight.py`` — the actual production entry point — as ONE
process on the chip (BASELINE CV config: 750-NN patches, 6-alpha CV,
checkpointing on) and records the driver-measured wall clock + vertices/sec
into BENCH_DRIVER.json.  Match: /root/reference/analyses/decoding/
searchlight/searchlight.py:181-296 (its driver loop over real artifacts).

Stages (prep runs pinned to CPU so the TPU window stays exclusive):
  1. dataset fabrication  (data.synthetic.make_synthetic_dataset at fs7)
  2. adjacency warm       (build_adjacency 750-NN into the cache the CLI reads)
  3. THE run              (cli.run_searchlight, one TPU process, timed)

Usage:  python benchmarks/bench_driver.py [--root /root/driver_fs7] [--skip-prep]
"""

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_TRAIN, K, D, BLOCK, ICO = 8192, 750, 1024, 128, 7
ALPHAS = ["100", "1000", "10000", "100000", "1000000", "10000000"]
BENCH_PROJECTION_VPS = 166.3       # BENCH_r03.json cv-fast headline
BENCH_PROJECTION_NULL_VPS = 162.82  # BENCH_r05 capture, shipped CV+null P=1000


def log(*a):
    print(*a, flush=True)


def relay_listening(ports=(8083, 8082)) -> bool:
    """True iff the box's axon relay is accepting connections (stateless
    :8083 / claim :8082).  A TCP connect is claim-free: it cannot wedge the
    chip the way a killed claim poll can."""
    for port in ports:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            pass
    return False


def wait_for_relay(max_wait_s: float, poll_s: float = 15.0) -> bool:
    t0 = time.time()
    while True:
        if relay_listening():
            return True
        waited = time.time() - t0
        if waited >= max_wait_s:
            return False
        if int(waited) % 300 < poll_s:
            log(f"[relay] down for {waited:.0f}s; polling :8083/:8082 ...")
        time.sleep(poll_s)


def run_cpu_snippet(code: str, env=None):
    """Run a python snippet in a subprocess pinned to the CPU backend."""
    prelude = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n" % REPO
    )
    subprocess.run([sys.executable, "-c", prelude + code], check=True,
                   env=dict(os.environ, **(env or {})))


def prep_dataset(root: str):
    code = f"""
import time, os
import numpy as np
from multimodal_decoding_tpu.data.synthetic import make_synthetic_dataset
from multimodal_decoding_tpu.io.surface import icosphere, write_freesurfer_geometry

t0 = time.time()
mesh = icosphere({ICO}, 50.0)  # subdivisions 7 = 163,842 vertices: fsaverage7 scale

print(f"mesh built in {{time.time() - t0:.0f}}s", flush=True)
t0 = time.time()
make_synthetic_dataset(
    {root!r}, subject="sub-01", n_train={N_TRAIN}, n_vertices=mesh.n_vertices,
    latent_dim={D}, model="imagebind", hemis=["left"], progress=True,
)
print(f"betas + features written in {{time.time() - t0:.0f}}s", flush=True)
os.makedirs(os.path.join({root!r}, "surfaces", "fsaverage7"), exist_ok=True)
write_freesurfer_geometry(
    os.path.join({root!r}, "surfaces", "fsaverage7", "lh.inflated"), mesh)
os.makedirs(os.path.join({root!r}, "fmri"), exist_ok=True)
link = os.path.join({root!r}, "fmri", "stim_info")
os.path.islink(link) or os.symlink(os.path.join({root!r}, "stim_info"), link)
np.save(os.path.join({root!r}, "coords.npy"), mesh.coordinates)
"""
    run_cpu_snippet(code)


def warm_betas_cache(root: str):
    """Eager-load each split once on CPU so the betas npz cache exists —
    the prerequisite of the timed run's ``--stream-ingest on`` (the CLI
    fails fast rather than fall back to the eager loader)."""
    code = f"""
import time
from multimodal_decoding_tpu.config import (
    MODALITY_AGNOSTIC, SPLIT_IMAGERY, SPLIT_TEST, SPLIT_TRAIN)
from multimodal_decoding_tpu.data.betas import get_fmri_surface_data
bd = {os.path.join(root, "betas", "surface")!r}
t0 = time.time()
for split in (SPLIT_TRAIN, SPLIT_TEST, SPLIT_IMAGERY):
    get_fmri_surface_data(bd, "sub-01", split, MODALITY_AGNOSTIC, "left")
print(f"betas npz cache warmed in {{time.time() - t0:.0f}}s", flush=True)
"""
    run_cpu_snippet(code, env={"MMD_DATA_DIR": root})


def warm_adjacency(root: str, out_dir: str):
    code = f"""
import time, os
import numpy as np
from multimodal_decoding_tpu.io.gifti import read_gifti
from multimodal_decoding_tpu.io.surface import read_freesurfer_geometry
from multimodal_decoding_tpu.decoding.searchlight import build_adjacency
from glob import glob

# read the coords back through the SAME path the CLI uses: the cache key
# hashes coordinate bytes, and the FreeSurfer file stores f32 while the
# in-memory icosphere is f64 — hashing the pre-roundtrip array misses
coords = read_freesurfer_geometry(os.path.join(
    {root!r}, "surfaces", "fsaverage7", "lh.inflated")).coordinates
first = sorted(glob(os.path.join(
    {root!r}, "betas", "surface", "left", "sub-01", "betas_train_*", "*.gii")))[0]
nan_locations = np.isnan(read_gifti(first).darrays[0].data)
print(f"{{nan_locations.sum()}} NaN vertices", flush=True)
cache_dir = os.path.join({out_dir!r}, ".adjacency_cache")
t0 = time.time()
build_adjacency(coords, nan_locations, n_neighbors={K}, cache_dir=cache_dir)
print(f"adjacency warmed in {{time.time() - t0:.0f}}s -> {{cache_dir}}", flush=True)
"""
    run_cpu_snippet(code)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/root/driver_fs7")
    ap.add_argument("--skip-prep", action="store_true", default=False)
    ap.add_argument("--small", action="store_true", default=False,
                    help="tiny smoke of the full orchestration (CPU scale)")
    ap.add_argument("--null", action="store_true", default=False,
                    help="ALSO emit null distributions at the reference's "
                         "config (--create-null-distr, 100 permutations per "
                         "subject: searchlight_permutation_testing.py's "
                         "per-subject null input) — the shipped one-hot "
                         "null-gather path under the production CLI")
    ap.add_argument("--out", type=str, default=None,
                    help="default BENCH_DRIVER.json / BENCH_DRIVER_NULL.json")
    ap.add_argument("--attempts", type=int, default=1,
                    help="retry the CLI run this many times on failure "
                         "(chip-claim flakes; each failed claim poll costs "
                         "~35 min, so attempts are gated on --wait-relay)")
    ap.add_argument("--wait-relay", type=float, default=0.0,
                    help="seconds to wait for the axon relay ports before "
                         "each attempt (0 = launch immediately; this round's "
                         "host-side relay outage is the motivating case)")
    args = ap.parse_args()
    global N_TRAIN, K, D, BLOCK, ICO
    if args.small:
        N_TRAIN, K, D, BLOCK, ICO = 64, 8, 16, 32, 2
    if args.out is None:
        args.out = os.path.join(
            REPO, "BENCH_DRIVER_NULL.json" if args.null else "BENCH_DRIVER.json")
    root = args.root
    sl_out = os.path.join(root, "searchlight_out_null" if args.null
                          else "searchlight_out")
    # ONE adjacency cache shared by the base and --null variants (the build
    # depends only on the mesh + NaN mask, not on the null config)
    adj_cache = os.path.join(root, "searchlight_out", ".adjacency_cache")
    stages = {}

    if not args.skip_prep:
        t0 = time.time()
        prep_dataset(root)
        stages["prep_dataset_s"] = round(time.time() - t0, 1)
        log(f"[prep] dataset done in {stages['prep_dataset_s']}s")
        if not args.small:
            t0 = time.time()
            warm_betas_cache(root)
            stages["prep_betas_cache_s"] = round(time.time() - t0, 1)
            log(f"[prep] betas cache warmed in {stages['prep_betas_cache_s']}s")
        t0 = time.time()
        warm_adjacency(root, os.path.join(root, "searchlight_out"))
        stages["prep_adjacency_s"] = round(time.time() - t0, 1)
        log(f"[prep] adjacency cache warmed in {stages['prep_adjacency_s']}s")

    # --- THE measured run: one process, the production CLI, the chip ------
    if args.small:
        # smoke mode must NOT claim the chip: run the module through a
        # CPU-pinning launcher (the axon sitecustomize ignores env vars)
        launcher = os.path.join(root, "_cli_cpu.py")
        with open(launcher, "w") as f:
            f.write(
                "import sys, runpy, jax\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                "module = sys.argv[1]; sys.argv = [module.split('.')[-1]] + sys.argv[2:]\n"
                f"sys.path.insert(0, {REPO!r}); runpy.run_module(module, run_name='__main__')\n"
            )
        runner = [sys.executable, launcher, "multimodal_decoding_tpu.cli.run_searchlight"]
    else:
        runner = [sys.executable, "-m", "multimodal_decoding_tpu.cli.run_searchlight"]
    cli = runner + [
        "--betas-dir", os.path.join(root, "betas", "surface"),
        "--subjects", "sub-01", "--model", "imagebind",
        "--training-modes", "agnostic", "--hemis", "left",
        "--n-neighbors", str(K), "--l2-alphas", *ALPHAS,
        "--block-size", str(BLOCK),
        "--mesh-dir", os.path.join(root, "surfaces"),
        "--out-dir", sl_out, "--overwrite",
        "--adjacency-cache-dir", adj_cache,
    ]
    if args.null:
        # reference null config: 100 permutations/subject feeding the group
        # stage (searchlight.py:61-79, permutation_testing input contract)
        cli += ["--create-null-distr", "--n-permutations-per-subject", "100"]
    if not args.small:
        # loud streaming ingestion (parallel/ingest.py): the eager path's
        # ~16 GB of fresh host pages costs ~50 min on this box's ~5 MB/s
        # first-touch backing (PERF_NOTES round-4 entry); 'on' fails fast
        # instead of silently falling back to eager if the cache is absent
        cli += ["--stream-ingest", "on"]
    # APPEND the repo to PYTHONPATH — overwriting it clobbers the TPU
    # plugin's sitecustomize dir (/root/.axon_site on this box) and the
    # backend never registers
    pp = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, MMD_DATA_DIR=root,
               PYTHONPATH=REPO + (os.pathsep + pp if pp else ""))
    log("[run] launching production CLI (one TPU process):\n  " + " ".join(cli))
    for attempt in range(1, max(1, args.attempts) + 1):
        if not args.small and args.wait_relay > 0:
            if not wait_for_relay(args.wait_relay):
                raise SystemExit(
                    f"axon relay stayed down for {args.wait_relay:.0f}s "
                    "(ports 8083/8082 closed) — not launching a claim poll "
                    "against a dead relay"
                )
        t0 = time.time()
        proc = subprocess.run(cli, env=env, capture_output=True, text=True)
        wall = time.time() - t0
        sys.stdout.write(proc.stdout[-4000:])
        sys.stderr.write(proc.stderr[-4000:])
        if proc.returncode == 0:
            break
        log(f"[run] attempt {attempt}/{args.attempts} failed "
            f"(rc={proc.returncode}) after {wall:.0f}s")
        if attempt >= max(1, args.attempts):
            raise SystemExit(f"driver run failed ({proc.returncode})")

    # driver-printed searchlight stage + runlog-recorded v/s
    m = re.search(r"Searchlight time: (\d+)s \((\d+) vertices/s\)", proc.stdout)
    sl_s, vps = (float(m.group(1)), float(m.group(2))) if m else (None, None)
    runlogs = []
    for d, _, files in os.walk(sl_out):
        runlogs += [os.path.join(d, f) for f in files if f.endswith(".runlog.jsonl")]
    if runlogs:
        with open(sorted(runlogs)[-1]) as f:
            ev = json.loads(f.readlines()[-1])
        vps = ev.get("vertices_per_sec", vps)
        sl_s = ev.get("elapsed_s", sl_s)

    result = {
        "metric": ("driver_searchlight_cv_null_vertices_per_sec" if args.null
                   else "driver_searchlight_vertices_per_sec"),
        "value": round(vps, 1) if vps else None,
        "unit": "vertices/s",
        "config": {
            "resolution": "fsaverage7" if ICO == 7 else f"icosphere{ICO}",
            "n_vertices": 10 * 4 ** ICO + 2, "hemis": 1,
            "n_train": N_TRAIN, "k": K, "d": D, "block_size": BLOCK,
            "alphas": len(ALPHAS), "cv": True,
            "nulls": 100 if args.null else False,
            "entry_point": "cli.run_searchlight", "processes": 1,
            "stream_ingest": not args.small,
        },
        "driver_wall_s": round(wall, 1),
        "searchlight_stage_s": round(sl_s, 1) if sl_s else None,
        "overhead_s": round(wall - sl_s, 1) if sl_s else None,
        "bench_projection_vps": (BENCH_PROJECTION_NULL_VPS if args.null
                                 else BENCH_PROJECTION_VPS),
        "ratio_vs_projection": (
            round(vps / (BENCH_PROJECTION_NULL_VPS if args.null
                         else BENCH_PROJECTION_VPS), 3) if vps else None),
        "stages": stages,
        "note": (
            "one-process production-CLI run over real on-disk GIfTI betas at "
            "fsaverage7 scale (synthetic subject, production layout): betas "
            "parse + standardize + adjacency-cache load + H2D upload + "
            "1,280-block CV searchlight + artifact write.  Overheads on this "
            "box include the ~25 MB/s relay H2D (~220 s for 5.5 GB betas) "
            "that is PCIe-fast on production hosts."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    log(f"\nBENCH_DRIVER -> {args.out}")
    log(json.dumps({k: result[k] for k in
                    ("value", "driver_wall_s", "searchlight_stage_s",
                     "ratio_vs_projection")}))


if __name__ == "__main__":
    main()
