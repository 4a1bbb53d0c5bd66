"""Multi-host data-parallel training over a REAL 2-process group.

SURVEY.md §2.3 mandates multi-host DP ("envs sharded per host feeding a
data-parallel learner via psum gradient collectives"). The CPU-mesh tests
in test_sharding.py are single-process; this suite launches two actual
processes joined through ``jax.distributed.initialize`` (localhost
coordinator, Gloo CPU collectives, 4 virtual devices each → one global
8-device mesh) and asserts:

- both processes run the full trainer to completion and agree bitwise on
  the integer state (env dynamics, replay contents, counters);
- the result matches a single-process run over the same 8-device mesh
  (GSPMD semantics are placement-invariant);
- artifact writes happened on process 0 ONLY (host-0 gating).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import jax

from t48.configs import get_preset
from t48.train.trainer import train

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multiprocess_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_config():
    return get_preset(
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


class TestTwoProcessTraining:
    def test_two_process_dp_matches_single_process(self, tmp_path):
        port = _free_port()
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
        }
        root = str(tmp_path / "shared_root")  # same dir: shared-FS semantics
        procs = [
            subprocess.Popen(
                [sys.executable, _WORKER, str(i), "2", str(port), root],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                cwd=_REPO,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode(errors="replace"))
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

        digests = []
        for out in outs:
            lines = [l for l in out.splitlines() if l.startswith("DIGEST:")]
            assert lines, out[-4000:]
            digests.append(json.loads(lines[-1][len("DIGEST:"):]))
        d0 = next(d for d in digests if d["pid"] == 0)
        d1 = next(d for d in digests if d["pid"] == 1)

        # both processes saw the same global program state
        assert d0["process_count"] == d1["process_count"] == 2
        for key in ("episodes_done", "env_steps", "train_steps",
                    "boards_sum", "replay_fill", "replay_state_sum"):
            assert d0[key] == d1[key], (key, d0[key], d1[key])
        assert d0["params_abs_sum"] == d1["params_abs_sum"]
        assert d0["episodes_done"] >= 60
        assert d0["train_steps"] > 0

        # host-0 gating: exactly one job folder (plus the repo-level
        # HISTORY.md hyperparameter log), written by process 0
        assert sorted(os.listdir(root)) == ["HISTORY.md", "mp_job"]
        assert d1["folder"] == "<non-coordinator>"
        job = os.path.join(root, "mp_job")
        assert os.path.isfile(os.path.join(job, "binary/checkpoint.npz"))
        assert os.path.isfile(os.path.join(job, "binary/episodes.jsonl"))

        # placement invariance: the same program over the same 8-device
        # mesh in ONE process produces the same state (GSPMD semantics)
        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        state, _ = train(
            _worker_config(),
            root_dir=str(tmp_path / "single"),
            job_name="sp_job",
            verbose=False,
            data_parallel=0,
        )
        assert int(state.episodes_done) == d0["episodes_done"]
        assert int(state.env_steps) == d0["env_steps"]
        assert int(state.train_steps) == d0["train_steps"]
        assert (
            int(np.asarray(jax.device_get(state.env.boards)).sum())
            == d0["boards_sum"]
        )
        assert (
            int(
                np.asarray(jax.device_get(state.replay.state))
                .astype(np.int64)
                .sum()
            )
            == d0["replay_state_sum"]
        )
        params_abs_sum = float(
            sum(
                float(np.abs(np.asarray(jax.device_get(x))).sum())
                for x in jax.tree_util.tree_leaves(state.params)
            )
        )
        np.testing.assert_allclose(
            params_abs_sum, d0["params_abs_sum"], rtol=1e-5
        )


class TestOneProcessFailure:
    def test_failing_process_leaves_loadable_state(self, tmp_path):
        """Kill-one-process drill (VERDICT r2 task 4): process 1 raises
        mid-run (fault injection); the failure path must be
        collective-free — process 1 dumps its addressable shards and
        exits promptly instead of deadlocking in a gather, process 0
        errors out of its next collective and dumps its own, and the job
        directory is loadable afterwards with the learned (replicated)
        params intact."""
        port = _free_port()
        base_env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")
        }
        root = str(tmp_path / "shared_root")
        envs = [dict(base_env), dict(base_env)]
        envs[1]["T48_FAULT_INJECT_EPISODES"] = "20"
        procs = [
            subprocess.Popen(
                [sys.executable, _WORKER, str(i), "2", str(port), root,
                 "failtest"],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=envs[i],
                cwd=_REPO,
            )
            for i in range(2)
        ]
        outs = []
        # the injected failure must not deadlock either process — a hang
        # here (the old collective-on-exception bug) fails via timeout
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode(errors="replace"))
        assert procs[1].returncode == 17, outs[1][-4000:]
        assert "FAILED_AS_EXPECTED:RuntimeError" in outs[1]
        # process 0 blocks in its next collective once the peer is gone;
        # the chunk watchdog must detect the stall, dump shards
        # collective-free and exit (42 = dump written; any other nonzero
        # means the runtime surfaced a distributed error first, also fine
        # — the hard failure is hanging until the communicate() timeout)
        assert procs[0].returncode != 0, outs[0][-4000:]

        emergency = os.path.join(root, "mp_job", "binary", "emergency")
        assert os.path.isdir(emergency), os.listdir(
            os.path.join(root, "mp_job", "binary")
        )
        dumps = sorted(os.listdir(emergency))
        assert "shards.proc1.npz" in dumps, dumps

        # the dump restores: params (replicated) must be complete even if
        # the other process's env/replay shards are missing
        from t48.exp.checkpoint import restore_from_shards
        from t48.train import loop as loop_lib

        template = loop_lib.create_train_state(_worker_config())
        state, missing = restore_from_shards(emergency, template)
        assert int(state.episodes_done) >= 20
        param_keys = [m for m in missing if m.startswith(".params")]
        assert not param_keys, param_keys
        # params moved off their fresh values (training happened)
        t0 = jax.tree_util.tree_leaves(template.params)
        t1 = jax.tree_util.tree_leaves(state.params)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(t0, t1)
        )
