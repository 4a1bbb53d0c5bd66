"""Training-loop semantics: cadences, episode accounting, replay flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t48.configs import get_preset
from t48.train import loop as loop_lib
from t48.train.schedules import epsilon_schedule


def tiny_config(**kw):
    base = dict(
        env_batch=8,
        batch_size=32,
        replay_buffer_length=512,
        no_episodes=100,
        no_episodes_to_reach_epsilon=50,
        no_episodes_before_training=3,
        no_episodes_before_updating_target=5,
        chunk_iters=32,
        episode_log_size=256,
        seed=0,
    )
    base.update(kw)
    return get_preset("dense", **base)


class TestSchedules:
    def test_linear_decay(self):
        # ε = max((E-ep)/E, min) (dqn_lib.py:184-185)
        eps = epsilon_schedule(jnp.int32(0), 1000, 0.01)
        assert float(eps) == pytest.approx(1.0)
        eps = epsilon_schedule(jnp.int32(500), 1000, 0.01)
        assert float(eps) == pytest.approx(0.5)
        eps = epsilon_schedule(jnp.int32(5000), 1000, 0.01)
        assert float(eps) == pytest.approx(0.01)

    def test_fill_up_forces_zero(self):
        # dqn_lib.py:187-188
        eps = epsilon_schedule(jnp.int32(5), 1000, 0.01, fill_up_episodes=10)
        assert float(eps) == 0.0
        eps = epsilon_schedule(jnp.int32(15), 1000, 0.01, fill_up_episodes=10)
        assert float(eps) == pytest.approx((1000 - 15) / 1000)


class TestTrainChunk:
    def test_chunk_progresses_and_trains(self):
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        n_chunks = 0
        # ε≈1 early play takes many illegal no-op steps, so episode
        # completion rates vary with the RNG stream — run until the train
        # gate has clearly been crossed.
        while int(state.episodes_done) <= cfg.no_episodes_before_training + 2:
            state, snap = chunk(state)
            n_chunks += 1
            assert n_chunks < 50
        state, snap = chunk(state)
        n_chunks += 1
        assert int(state.env_steps) == n_chunks * cfg.chunk_iters * cfg.env_batch
        assert int(state.episodes_done) > 0
        assert int(state.train_steps) > 0
        assert int(state.replay.fill) > 0
        assert float(state.last_loss) > 0

    def test_episode_log_schema_and_monotonic_numbers(self):
        """The log is drained once per chunk (chunk entry resets the
        per-env counts), episodes arrive in global completion order."""
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        episodes = []
        for _ in range(2):
            state, _ = chunk(state)
            got, dropped = loop_lib.drain_episode_log(state.log)
            assert dropped == 0
            episodes.extend(got)
        assert len(episodes) == int(state.episodes_done)
        keys = {
            "max_tile", "merge_score", "number", "reward",
            "q_value", "epsilon", "number_moves",
        }
        numbers = [e["number"] for e in episodes]
        assert sorted(numbers) == list(range(len(episodes)))
        for ep in episodes:
            assert set(ep) == keys
            assert ep["max_tile"] >= 4  # merged at least one pair or spawned 4
            assert ep["merge_score"] >= 0
            assert ep["number_moves"] > 0
            assert 0.0 <= ep["epsilon"] <= 1.0

    def test_log_ring_autosizes_against_overflow(self):
        """A deliberately tiny configured ring is raised to the provable
        per-chunk completion bound, so no episode is ever dropped —
        even with ε=0 greedy play completing episodes at max rate."""
        cfg = tiny_config(
            episode_log_size=1,  # absurdly small on purpose
            chunk_iters=128,
            env_batch=8,
            min_epsilon=0.0,
            no_episodes_to_reach_epsilon=1,
        )
        eff = loop_lib.effective_log_size(cfg)
        min_len = cfg.board_k * cfg.board_k - 2
        assert eff == 1 + (cfg.chunk_iters - 1) // min_len
        state = loop_lib.create_train_state(cfg)
        assert state.log.data.shape[1:] == (eff, cfg.env_batch)
        chunk = loop_lib.make_train_chunk(cfg)
        total = 0
        for _ in range(4):
            state, _ = chunk(state)
            episodes, dropped = loop_lib.drain_episode_log(state.log)
            assert dropped == 0
            total += len(episodes)
        assert total == int(state.episodes_done)
        # the bound is tight enough to be meaningful: every episode took
        # at least K*K-2 env steps
        assert total <= 4 * eff * cfg.env_batch

    def test_no_training_before_gate(self):
        cfg = tiny_config(no_episodes_before_training=10_000)
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        state, _ = chunk(state)
        assert int(state.train_steps) == 0

    def test_single_env_reference_cadence(self):
        """env_batch=1: learner fires exactly once per completed episode
        past the gate; target syncs on each N-multiple crossing."""
        cfg = tiny_config(
            env_batch=1,
            no_episodes_before_training=2,
            no_episodes_before_updating_target=3,
            chunk_iters=64,
        )
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        for _ in range(20):
            state, _ = chunk(state)
        done = int(state.episodes_done)
        trained = int(state.train_steps)
        # once per episode after the first `gate` episodes
        assert trained == max(0, done - cfg.no_episodes_before_training), (
            done, trained
        )

    def test_replay_contents_are_valid_transitions(self):
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        state, _ = chunk(state)
        fill = int(state.replay.fill)  # per-env fill (lockstep inserts)
        assert fill == min(cfg.chunk_iters, state.replay.per_env_capacity)
        s = np.asarray(state.replay.state[:, :fill]).reshape(-1, 16)
        a = np.asarray(state.replay.action[:, :fill]).reshape(-1)
        r = np.asarray(state.replay.reward[:, :fill]).reshape(-1)
        assert ((a >= 0) & (a < 4)).all()
        assert (s >= 0).all() and (s <= 16).all()
        assert (r >= 0).all()  # merge-score deltas are non-negative
        # a no-op/illegal step stores state == next_state
        ns = np.asarray(state.replay.next_state[:, :fill]).reshape(-1, 16)
        changed = (s != ns).any(axis=1)
        moved_rewards = r[changed]
        assert (moved_rewards >= 0).all()

    def test_snapshot_stream_shapes(self):
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        state, snap = chunk(state)
        assert snap.board.shape == (cfg.chunk_iters, 16)
        assert snap.action.shape == (cfg.chunk_iters,)
        assert snap.reward.shape == (cfg.chunk_iters,)
        assert snap.done.shape == (cfg.chunk_iters,)

    def test_reference_policy_compat_mode(self):
        """The literal dqn_lib.py:25-28 normalization runs end-to-end."""
        cfg = tiny_config(policy_compat="reference")
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        state, _ = chunk(state)
        assert int(state.env_steps) == cfg.chunk_iters * cfg.env_batch

    def test_compat_zero_update_mode(self):
        """Reference train-order-bug emulation: params never move."""
        cfg = tiny_config(compat_zero_update=True, no_episodes_before_training=0)
        state0 = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        state, _ = chunk(state0)
        n = 1
        while int(state.train_steps) == 0:  # needs ≥1 completed episode
            state, _ = chunk(state)
            n += 1
            assert n < 50
        for a, b in zip(
            jax.tree_util.tree_leaves(state0.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_rng_determinism(self):
        cfg = tiny_config()
        s1 = loop_lib.create_train_state(cfg)
        s2 = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        s1, _ = chunk(s1)
        s2, _ = chunk(s2)
        assert np.array_equal(np.asarray(s1.env.boards), np.asarray(s2.env.boards))
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))


class TestConfigValidation:
    def test_rebase_slack_exhaustion_rejected(self):
        """Schedule horizons at/above 2^30 would make rebase_amount
        return 0 forever and let the int32 episode counter wrap silently
        (r04 advisor finding) — such configs must fail loudly."""
        with pytest.raises(ValueError, match="rebase slack"):
            tiny_config(no_episodes_before_updating_target=1 << 30)
        with pytest.raises(ValueError, match="rebase slack"):
            tiny_config(no_episodes_to_reach_epsilon=1 << 30)
        # sane horizons still construct
        tiny_config(no_episodes_before_updating_target=100_000)

    def test_large_but_safe_horizons_keep_rebase_effective(self):
        """At the largest accepted horizons, the rebase still fires with
        positive amounts at the trainer's REBASE_AT trigger point."""
        cfg = tiny_config(
            no_episodes_to_reach_epsilon=(1 << 28),
            no_episodes_before_updating_target=(1 << 28),
        )
        done = 1 << 30
        amt = loop_lib.rebase_amount(cfg, done, done, done)
        assert amt > 0
        assert done - amt >= loop_lib.rebase_keep_min(cfg)


class TestEnvBackendResolution:
    """'auto' resolution (t48/train/loop.resolve_env_backend). The r04
    %1024 constraint silently demoted the exact-batch b2560 flagship to
    the XLA env (VERDICT r04 weak #3); the kernel now pads internally
    and auto requires only TPU + k=4 + per-shard >= 256."""

    def _on_tpu(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def test_cpu_resolves_xla(self):
        assert loop_lib.resolve_env_backend(tiny_config()) == "xla"

    def test_explicit_backend_wins(self, monkeypatch):
        self._on_tpu(monkeypatch)
        cfg = tiny_config(env_backend="xla", env_batch=4096)
        assert loop_lib.resolve_env_backend(cfg) == "xla"

    def test_tpu_odd_batches_resolve_pallas(self, monkeypatch):
        self._on_tpu(monkeypatch)
        for batch in (256, 640, 2560, 4096, 5000):
            cfg = tiny_config(env_batch=batch)
            assert loop_lib.resolve_env_backend(cfg) == "pallas", batch

    def test_tpu_tiny_batches_resolve_xla(self, monkeypatch):
        self._on_tpu(monkeypatch)
        for batch in (1, 8, 128):
            cfg = tiny_config(env_batch=batch)
            assert loop_lib.resolve_env_backend(cfg) == "xla", batch

    def test_mesh_per_shard_rule(self, monkeypatch):
        self._on_tpu(monkeypatch)

        class FakeMesh:
            shape = {"data": 8}

        cfg = tiny_config(env_batch=2560)  # 320/shard >= 256 → pallas
        assert loop_lib.resolve_env_backend(cfg, FakeMesh()) == "pallas"
        cfg = tiny_config(env_batch=1024)  # 128/shard < 256 → xla
        assert loop_lib.resolve_env_backend(cfg, FakeMesh()) == "xla"
        cfg = tiny_config(env_batch=2561)  # not divisible → xla
        assert loop_lib.resolve_env_backend(cfg, FakeMesh()) == "xla"


class TestLrSchedule:
    """r05 lr-schedule support (documented divergence; VERDICT r04 task 4)."""

    def test_constant_keeps_r04_opt_state_structure(self):
        import optax

        cfg = tiny_config()
        params = {"w": jnp.ones((4,))}
        s_new = loop_lib.build_optimizer(cfg).init(params)
        s_ref = optax.adam(cfg.learning_rate).init(params)
        assert jax.tree_util.tree_structure(s_new) == (
            jax.tree_util.tree_structure(s_ref)
        )

    def test_schedule_holds_then_decays(self):
        cfg = tiny_config(
            lr_schedule="cosine", lr_decay_start=5, lr_decay_steps=10,
            lr_final_scale=0.0,
        )
        opt = loop_lib.build_optimizer(cfg)
        params = {"w": jnp.ones((4,))}
        state = opt.init(params)
        g = {"w": jnp.ones((4,))}
        sizes = []
        for _ in range(20):
            up, state = opt.update(g, state, params)
            sizes.append(float(jnp.abs(up["w"]).max()))
        # constant region: steps 0..4 at the same scale (tiny Adam
        # bias-correction drift in f32 aside)
        assert abs(sizes[4] - sizes[0]) < 1e-4 * max(sizes[0], 1e-9)
        # decayed to ~0 by the end (alpha=0 cosine)
        assert sizes[-1] < sizes[0] * 0.05

    def test_schedule_enum_validated(self):
        with pytest.raises(ValueError, match="lr_schedule"):
            tiny_config(lr_schedule="typo")

    def test_scheduled_config_trains_and_widens(self, tmp_path):
        """Both phases of a staged run under the SAME schedule mode share
        opt_state structure; the widened resume carries the count."""
        import os

        from t48.train import trainer as trainer_lib
        from t48.train import widen as widen_lib

        kw = dict(
            arch="dense",
            chunk_iters=16,
            batch_size=8,
            replay_buffer_length=64,
            no_episodes_before_training=0,
            no_episodes_to_reach_epsilon=10,
            no_episodes_before_updating_target=10,
            env_backend="xla",
            lr_schedule="cosine",
            lr_decay_start=5,
            lr_decay_steps=50,
            seed=3,
        )
        root = str(tmp_path)
        from t48.configs import get_preset

        cfg_a = get_preset("dense", env_batch=8, **kw)
        trainer_lib.train(cfg_a, root_dir=root, job_name="sched",
                          max_episodes=20, verbose=False)
        cfg_b = get_preset("dense", env_batch=16, **kw)
        widen_lib.widen_job_checkpoint(
            os.path.join(root, "sched"), cfg_a, cfg_b
        )
        state, _ = trainer_lib.train(
            cfg_b, root_dir=root, job_name="sched", resume=True,
            max_episodes=60, verbose=False,
        )
        assert int(state.train_steps) > 0
