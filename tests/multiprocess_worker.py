"""Worker process for the 2-process multi-host DP integration test.

Launched by tests/test_multiprocess.py via subprocess. Joins a real
``jax.distributed`` process group over a localhost coordinator, with 4
virtual CPU devices per process (global mesh: 8), runs a full training
job through ``t48.train.trainer.train(data_parallel=0)`` — the exact
code path a multi-host TPU slice uses — and prints a JSON digest of the
final state for the test to compare across processes and against a
single-process run of the same program.

Not named test_*.py: pytest must not collect it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid, nproc, port, root = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"

    # the container's sitecustomize imports jax at interpreter startup, so
    # the platform/device-count must be forced through the live config
    # (same pattern as tests/conftest.py and __graft_entry__)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from t48.distrib import fully_replicated, init_distributed, make_mesh

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    import numpy as np

    from t48.configs import get_preset
    from t48.train.trainer import train

    cfg = get_preset(
        "dense",
        env_batch=16,
        batch_size=32,
        replay_buffer_length=512,
        no_episodes=60,
        no_episodes_before_training=2,
        no_episodes_before_updating_target=5,
        chunk_iters=16,
        episode_log_size=128,
        snapshot_game_every_n_episodes=16,
        seed=0,
    )
    if mode == "failtest":
        # one-process-failure drill: this process has
        # T48_FAULT_INJECT_EPISODES set (the test sets it for pid 1 only);
        # train() must NOT deadlock — the failing process dumps its
        # addressable shards collective-free, the survivor errors out of
        # its next collective and dumps its own.
        cfg_fail = cfg.replace(no_episodes=100_000, watchdog_timeout_s=45.0)
        try:
            train(
                cfg_fail, root_dir=root, job_name="mp_job",
                verbose=False, data_parallel=0,
            )
        except BaseException as e:
            print(f"FAILED_AS_EXPECTED:{type(e).__name__}", flush=True)
            # skip the interpreter's atexit distributed shutdown: it would
            # block on a barrier with the (wedged) peer and this process's
            # exit code would then be clobbered by the coordination
            # service's LOG(FATAL) teardown
            os._exit(17)
        print("COMPLETED_UNEXPECTEDLY", flush=True)
        os._exit(18)

    state, experiment = train(
        cfg, root_dir=root, job_name="mp_job", verbose=False, data_parallel=0
    )

    # gather so this process can digest every leaf
    gathered = fully_replicated(state, make_mesh())

    def psum(tree):
        return float(
            sum(
                float(np.abs(np.asarray(jax.device_get(x))).sum())
                for x in jax.tree_util.tree_leaves(tree)
            )
        )

    digest = {
        "pid": pid,
        "process_count": jax.process_count(),
        "episodes_done": int(gathered.episodes_done),
        "env_steps": int(gathered.env_steps),
        "train_steps": int(gathered.train_steps),
        "boards_sum": int(np.asarray(jax.device_get(gathered.env.boards)).sum()),
        "replay_fill": int(gathered.replay.fill),
        "replay_state_sum": int(
            np.asarray(jax.device_get(gathered.replay.state)).astype(np.int64).sum()
        ),
        "params_abs_sum": psum(gathered.params),
        "folder": experiment.folder,
    }
    print("DIGEST:" + json.dumps(digest), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
