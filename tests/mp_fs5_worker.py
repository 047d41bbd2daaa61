"""Worker for the fs5-scale REAL 2-process searchlight test (VERDICT r4 #6).

Launched twice (process_id 0/1) by tests/test_multiprocess_distributed.py.
Each process owns 4 virtual CPU devices -> an 8-device global mesh over 2
genuine ``jax.distributed`` processes.  Runs the production searchlight
runner (alpha-CV + null shuffles + shard-granular checkpointing) at
fsaverage5 scale (10,242 vertices — uneven shards), with an injected
mid-run failure on the FIRST attempt and a resume from the process-0
checkpoint on the second, exercising:

* ``multihost.replicated_from_host`` ingestion of X/Y/shuffles,
* ``multihost.shard_rows_from_host`` per-block index/derangement lifting,
* ``multihost.host_numpy`` collective block materialisation,
* the process-0-only checkpoint publish + all-process resume read.

Usage: python mp_fs5_worker.py <process_id> <coordinator_port> <spec.json>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pid, port, spec_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    with open(spec_path) as f:
        spec = json.load(f)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fs5_problem import DIE_AT_CALL, make_fs5_problem, run_fs5

    import multimodal_decoding_tpu.parallel.searchlight_runner as runner_mod

    problem = make_fs5_problem()
    ckpt = spec["checkpoint_path"]

    # --- attempt 1: die mid-run (both processes raise at the same call,
    # before the failing block dispatches, so no collective is left hanging)
    real_block = runner_mod.searchlight_block_cv_with_null
    calls = {"n": 0}

    def dying_block(*a, **k):
        calls["n"] += 1
        if calls["n"] == DIE_AT_CALL:
            raise RuntimeError("injected mid-run failure")
        return real_block(*a, **k)

    runner_mod.searchlight_block_cv_with_null = dying_block
    died = False
    try:
        run_fs5(problem, jax.devices(), checkpoint_path=ckpt)
    except RuntimeError as e:
        died = "injected" in str(e)
    finally:
        runner_mod.searchlight_block_cv_with_null = real_block
    assert died, "injected failure did not fire"
    # process 0 published the checkpoint strictly before its own raise;
    # this barrier makes that a happens-before for process 1's resume read
    multihost_utils.sync_global_devices("fs5-resume")
    assert os.path.isfile(ckpt), "checkpoint missing at resume"

    # --- attempt 2: resume to completion ---------------------------------
    scores, aux = run_fs5(problem, jax.devices(), checkpoint_path=ckpt)
    multihost_utils.sync_global_devices("fs5-done")
    assert not os.path.isfile(ckpt), "checkpoint not consumed"

    if pid == 0:
        np.savez(
            spec["result_path"],
            best_alpha=aux["best_alpha"],
            **{f"score_{m}": v for m, v in scores.items()},
            **{f"null_{m}": v for m, v in aux["null_scores"].items()},
        )
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
