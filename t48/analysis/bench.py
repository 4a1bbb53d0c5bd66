"""Throughput benchmarks: env-steps/s on the current JAX backend.

The headline metric from BASELINE.json: batched board-step throughput
(the reference sustains ~40 env-steps/s end-to-end on the host,
BASELINE.md). The benchmark rolls out B lockstep envs with a uniform
random-legal policy and auto-reset under one jitted ``lax.scan`` —
the same code path the trainer's actor uses.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from t48.env import engine


def make_rollout(env_batch: int, iters: int, k: int = 4):
    """Jitted ``rollout(state, key) -> (state, total_steps)``."""

    def random_legal(k_pol, boards, legal):
        scores = jax.random.uniform(k_pol, legal.shape)
        actions = jnp.argmax(jnp.where(legal, scores, -1.0), -1).astype(jnp.int32)
        return actions, None

    def body(carry, _):
        env, key = carry
        key, k_step, k_reset = jax.random.split(key, 3)
        env, _, _, done, _, _ = engine.env_step(env, random_legal, k_step)
        env = engine.reset_where(env, done, k_reset)
        return (env, key), None

    @jax.jit
    def rollout(env, key):
        (env, key), _ = jax.lax.scan(body, (env, key), None, length=iters)
        return env

    return rollout


def run_bench(
    env_batch: int = 32768, iters: int = 1024, warmup: int = 2, trials: int = 3
) -> dict:
    """Measure steady-state env-steps/s (best of ``trials`` timed runs —
    remote-attached backends add high first-run latency)."""
    key = jax.random.PRNGKey(0)
    env = engine.init(key, env_batch)
    rollout = make_rollout(env_batch, iters)

    def sync(e):
        # a scalar device_get is the only reliable fence on remote-attached
        # backends where block_until_ready can return early
        return float(jax.device_get(e.merge_scores.sum()))

    for _ in range(max(warmup, 1)):
        env = rollout(env, key)
        sync(env)
    elapsed = float("inf")
    for trial in range(max(trials, 1)):
        t0 = time.perf_counter()
        env = rollout(env, jax.random.fold_in(key, trial + 1))
        sync(env)
        elapsed = min(elapsed, time.perf_counter() - t0)
    steps = env_batch * iters
    steps_per_s = steps / elapsed
    return {
        "metric": "env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "env_batch": env_batch,
        "iters": iters,
        "elapsed_s": round(elapsed, 4),
        "device": str(jax.devices()[0]),
        # reference end-to-end env throughput ≈ 40 steps/s (BASELINE.md)
        "vs_baseline": round(steps_per_s / 40.0, 1),
    }
