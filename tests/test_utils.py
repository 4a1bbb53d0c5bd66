"""Observability/debug utilities: meters, fingerprints, invariants."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t48.env import engine
from t48.utils import debug, tracing


class TestThroughputMeter:
    def test_rates(self):
        m = tracing.ThroughputMeter(smoothing=0.0)
        m.update(0, 0)
        time.sleep(0.05)
        m.update(1000, 10)
        s = m.summary()
        assert s["total_env_steps"] == 1000
        assert s["total_episodes"] == 10
        assert s["env_steps_per_s"] > 0
        assert s["episodes_per_s"] > 0


class TestFingerprint:
    def test_determinism_across_runs(self):
        """Fixed-key trajectory hash is the determinism sanitizer
        (SURVEY.md §5): same seed → same fingerprint."""
        def run():
            env = engine.init(jax.random.PRNGKey(0), 32)
            for i in range(20):
                key = jax.random.fold_in(jax.random.PRNGKey(1), i)
                actions = jax.random.randint(key, (32,), 0, 4)
                env, _, done = engine.step(env, actions, jax.random.fold_in(key, 1))
                env = engine.reset_where(env, done, jax.random.fold_in(key, 2))
            return env

        f1 = debug.trajectory_fingerprint(run())
        f2 = debug.trajectory_fingerprint(run())
        assert f1 == f2

    def test_differs_for_different_seeds(self):
        e1 = engine.init(jax.random.PRNGKey(0), 8)
        e2 = engine.init(jax.random.PRNGKey(1), 8)
        assert debug.trajectory_fingerprint(e1) != debug.trajectory_fingerprint(e2)


class TestInvariants:
    def test_healthy_state_passes(self):
        env = engine.init(jax.random.PRNGKey(0), 16)
        ok = debug.checked_env_invariants(env.boards, env.merge_scores)
        assert bool(np.asarray(ok).all())
        debug.assert_env_invariants(env.boards, env.merge_scores)

    def test_corrupt_state_caught(self):
        env = engine.init(jax.random.PRNGKey(0), 4)
        bad_boards = env.boards.at[0, 0, 0].set(25)  # exponent out of range
        with pytest.raises(AssertionError):
            debug.assert_env_invariants(bad_boards, env.merge_scores)
        bad_scores = env.merge_scores.at[1].set(-5)
        with pytest.raises(AssertionError):
            debug.assert_env_invariants(env.boards, bad_scores)

    def test_empty_board_caught(self):
        boards = jnp.zeros((2, 4, 4), jnp.int32)
        with pytest.raises(AssertionError):
            debug.assert_env_invariants(boards, jnp.zeros((2,), jnp.int32))
