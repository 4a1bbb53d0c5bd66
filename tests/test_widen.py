"""Env-batch widening surgery (t48/train/widen.py — VERDICT r04 task 5)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from t48.configs import get_preset
from t48.replay import buffer as replay_lib
from t48.train import loop as loop_lib
from t48.train import trainer as trainer_lib
from t48.train import widen as widen_lib


def _cfg(**kw):
    base = dict(
        arch="dense",
        env_batch=8,
        chunk_iters=32,
        batch_size=16,
        replay_buffer_length=64,
        no_episodes_before_training=0,
        no_episodes_to_reach_epsilon=10,
        no_episodes_before_updating_target=10,
        use_astar_seed=False,
        env_backend="xla",
        seed=1,
    )
    base.update(kw)
    return get_preset("dense", **base)


def _stamped_transition(b0: int, t: int) -> replay_lib.Transition:
    """A lockstep insert whose reward encodes (timestep, env)."""
    return replay_lib.Transition(
        state=jnp.full((b0, 16), t % 12, jnp.int8),
        action=jnp.zeros((b0,), jnp.int32),
        reward=jnp.asarray(
            [t * 1000.0 + e for e in range(b0)], jnp.float32
        ),
        next_state=jnp.zeros((b0, 16), jnp.int8),
        done=jnp.zeros((b0,), bool),
    )


class TestWidenReplay:
    def _fill(self, b0, cap, steps):
        rs = replay_lib.create(cap, 16, b0)
        for t in range(steps):
            rs = replay_lib.add_step(rs, _stamped_transition(b0, t))
        return rs

    def _rewards(self, rs):
        """Decoded reward of every live row, chronological order."""
        rows = np.asarray(rs.rows).astype(np.float32)
        dec = replay_lib._decode_rows(jnp.asarray(rows))
        rew = np.asarray(dec.reward)  # [M, B]
        fill, ptr, m = int(rs.fill), int(rs.ptr), rs.per_env_capacity
        order = (
            [(ptr + i) % m for i in range(m)] if fill >= m else list(range(fill))
        )
        return rew[order, :].reshape(-1)

    def test_full_ring_preserves_all_rows_chronologically(self):
        b0, b1 = 4, 8
        rs = self._fill(b0, cap=16, steps=9)  # m0=4, wrapped (9 > 4)
        old = self._rewards(rs)
        out = widen_lib.widen_replay(rs, b1, 16)
        assert out.per_env_capacity == 2 and int(out.fill) == 2
        new = self._rewards(out)
        np.testing.assert_array_equal(new, old)  # same rows, same order

    def test_not_yet_full_ring(self):
        b0, b1 = 4, 8
        rs = self._fill(b0, cap=16, steps=2)  # fill=2 of m0=4
        old = self._rewards(rs)
        out = widen_lib.widen_replay(rs, b1, 16)
        assert int(out.fill) == 1  # 8 rows = 1 new lockstep step
        np.testing.assert_array_equal(self._rewards(out), old)

    def test_oldest_surplus_dropped(self):
        # new geometry smaller than live data: keeps the NEWEST rows
        b0, b1 = 4, 8
        rs = self._fill(b0, cap=16, steps=20)
        old = self._rewards(rs)  # 16 rows
        out = widen_lib.widen_replay(rs, b1, 8)  # m1=1 -> keeps 8
        np.testing.assert_array_equal(self._rewards(out), old[-8:])

    def test_insert_after_widen_evicts_oldest(self):
        b0, b1 = 4, 8
        rs = self._fill(b0, cap=16, steps=9)
        out = widen_lib.widen_replay(rs, b1, 16)
        oldest_before = self._rewards(out)[:b1]
        out = replay_lib.add_step(out, _stamped_transition(b1, 99))
        after = self._rewards(out)
        assert not np.isin(oldest_before, after).any()
        assert np.isin(99_000.0, after)


class TestWidenTrainState:
    def test_carries_everything_and_pads_envs(self):
        cfg_a = _cfg(env_batch=8)
        cfg_b = _cfg(env_batch=24)
        chunk = loop_lib.make_train_chunk(cfg_a)
        state = loop_lib.create_train_state(cfg_a)
        for _ in range(3):
            state, _ = chunk(state)
        out = widen_lib.widen_train_state(state, cfg_a, cfg_b)
        # params / counters untouched
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            state.params, out.params,
        )
        assert int(out.episodes_done) == int(state.episodes_done)
        assert int(out.train_steps) == int(state.train_steps)
        # old envs occupy the first slots, in-flight episodes intact
        np.testing.assert_array_equal(
            np.asarray(out.env.boards[:8]), np.asarray(state.env.boards)
        )
        np.testing.assert_array_equal(
            np.asarray(out.env.step_counts[:8]),
            np.asarray(state.env.step_counts),
        )
        np.testing.assert_array_equal(
            np.asarray(out.ep_reward_sum[:8]), np.asarray(state.ep_reward_sum)
        )
        assert float(jnp.abs(out.ep_reward_sum[8:]).sum()) == 0.0
        # fresh envs are playable 2-tile boards
        fresh = np.asarray(out.env.boards[8:])
        assert ((fresh > 0).sum(axis=(1, 2)) == 2).all()
        assert (np.asarray(out.env.step_counts[8:]) == 0).all()

    def test_widened_state_trains(self):
        cfg_a = _cfg(env_batch=8)
        cfg_b = _cfg(env_batch=24)
        chunk_a = loop_lib.make_train_chunk(cfg_a)
        state = loop_lib.create_train_state(cfg_a)
        for _ in range(2):
            state, _ = chunk_a(state)
        out = widen_lib.widen_train_state(state, cfg_a, cfg_b)
        chunk_b = loop_lib.make_train_chunk(cfg_b)
        before = int(out.episodes_done)
        for _ in range(3):
            out, _ = chunk_b(out)
        assert int(out.episodes_done) > before
        assert np.isfinite(float(out.last_loss))


class TestWidenUnderMesh:
    def test_widened_state_distributes_and_trains_on_mesh(self):
        """The widened state places onto the 8-device 'data' mesh and the
        meshed chunk runs — the staged schedule composes with DP."""
        from t48.distrib import distribute_train_state, make_mesh

        cfg_a = _cfg(env_batch=8)
        cfg_b = _cfg(env_batch=32)
        state = loop_lib.create_train_state(cfg_a)
        chunk_a = loop_lib.make_train_chunk(cfg_a)
        state, _ = chunk_a(state)
        wide = widen_lib.widen_train_state(state, cfg_a, cfg_b)
        mesh = make_mesh(n_data=8)
        dist = distribute_train_state(wide, mesh, cfg_b)
        chunk_b = loop_lib.make_train_chunk(cfg_b, mesh=mesh)
        out, _ = chunk_b(dist)
        assert int(out.episodes_done) >= int(wide.episodes_done)
        assert np.isfinite(float(out.last_loss))


class TestStagedResume:
    def test_widen_checkpoint_then_resume_continues_curve(self, tmp_path):
        """Phase 1 at a small batch, widen the checkpoint in place, phase
        2 resumes the SAME job at the wide batch: one continuous episode
        log, counters/replay carried."""
        root = str(tmp_path)
        cfg_a = _cfg(env_batch=8)
        trainer_lib.train(
            cfg_a, root_dir=root, job_name="staged", max_episodes=30,
            verbose=False,
        )
        job = os.path.join(root, "staged")
        with open(os.path.join(job, "text", "hyperparams.json")) as f:
            phase1 = json.load(f)["counter_totals"]
        assert phase1["episodes"] >= 30

        cfg_b = _cfg(env_batch=24)
        widen_lib.widen_job_checkpoint(job, cfg_a, cfg_b)
        trainer_lib.train(
            cfg_b, root_dir=root, job_name="staged", resume=True,
            max_episodes=phase1["episodes"] + 40, verbose=False,
        )
        with open(os.path.join(job, "text", "hyperparams.json")) as f:
            hp = json.load(f)
        assert hp["counter_totals"]["episodes"] >= phase1["episodes"] + 40
        assert hp["env_batch"] == 24
        # episode numbers continue monotonically across the widening
        nums = []
        with open(os.path.join(job, "binary", "episodes.jsonl")) as f:
            for line in f:
                nums.append(json.loads(line)["number"])
        assert nums == sorted(nums)
        assert nums[-1] >= phase1["episodes"] + 39


class TestWidenEmergencyGuard:
    def test_widen_refuses_newer_emergency_dump(self, tmp_path):
        """A crash after phase 1 leaves binary/emergency newer than
        checkpoint.npz; load_resume_state would prefer it, restoring
        un-widened state into the widened template. widen_job_checkpoint
        must refuse (r04 advisor finding)."""
        import pytest

        from t48.exp.checkpoint import save_process_shards

        root = str(tmp_path)
        cfg_a = _cfg(env_batch=8)
        state, _ = trainer_lib.train(
            cfg_a, root_dir=root, job_name="staged", max_episodes=20,
            verbose=False,
        )
        job = os.path.join(root, "staged")
        # simulate a crash-dump written AFTER the checkpoint
        save_process_shards(os.path.join(job, "binary", "emergency"), state)
        cfg_b = _cfg(env_batch=24)
        with pytest.raises(RuntimeError, match="emergency"):
            widen_lib.widen_job_checkpoint(job, cfg_a, cfg_b)

    def test_widen_proceeds_when_checkpoint_newer(self, tmp_path):
        """An emergency dump older than the checkpoint (already folded in
        by a resume) does not block widening."""
        from t48.exp.checkpoint import save_process_shards

        root = str(tmp_path)
        cfg_a = _cfg(env_batch=8)
        state, _ = trainer_lib.train(
            cfg_a, root_dir=root, job_name="staged", max_episodes=20,
            verbose=False,
        )
        job = os.path.join(root, "staged")
        save_process_shards(os.path.join(job, "binary", "emergency"), state)
        ckpt = os.path.join(job, "binary", "checkpoint.npz")
        future = os.path.getmtime(ckpt) + 60
        os.utime(ckpt, (future, future))
        cfg_b = _cfg(env_batch=24)
        widen_lib.widen_job_checkpoint(job, cfg_a, cfg_b)  # no raise
