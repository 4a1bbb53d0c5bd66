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
    env_batch: int = 32768, iters: int = 4096, warmup: int = 2, trials: int = 3
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


def run_bench_pallas(
    env_batch: int = 32768, iters: int = 65536, trials: int = 3, block: int = 1024
) -> dict:
    """Throughput of the fused Pallas rollout kernel (t48/ops/pallas_step):
    the whole multi-step rollout runs VMEM-resident in one kernel with the
    TPU-native PRNG.

    ``iters`` is large so the measurement is steady-state: the
    remote-attached backend adds ~30ms of fixed dispatch+sync latency per
    call, which at short rollouts swamps the kernel (the kernel itself
    retires ~2.1G env-steps in ~0.6s here)."""
    import jax.numpy as jnp

    from t48.env import engine
    from t48.ops import pallas_step as ps

    key = jax.random.PRNGKey(0)
    boards = engine.new_boards(key, env_batch)
    cm = jax.jit(ps.to_cell_major)(boards)

    def sync(out):
        return float(jax.device_get(jnp.sum(out[1])))

    out = ps.pallas_rollout(cm, jnp.int32(1), iters=iters, block=block)
    sync(out)
    elapsed = float("inf")
    for t in range(max(trials, 1)):
        t0 = time.perf_counter()
        out = ps.pallas_rollout(cm, jnp.int32(2 + t), iters=iters, block=block)
        sync(out)
        elapsed = min(elapsed, time.perf_counter() - t0)
    steps_per_s = env_batch * iters / elapsed
    return {
        "metric": "env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "env_batch": env_batch,
        "iters": iters,
        "elapsed_s": round(elapsed, 4),
        "kernel": "pallas",
        "device": str(jax.devices()[0]),
        "vs_baseline": round(steps_per_s / 40.0, 1),
    }


def run_headline_bench() -> dict:
    """The driver metric: best batched-board-step throughput across the
    XLA scan path and the fused Pallas kernel (Pallas may be unavailable
    off-TPU — fall back silently)."""
    results = [run_bench()]
    try:
        results.append(run_bench_pallas())
    except Exception:
        pass
    best = max(results, key=lambda r: r["value"])
    best["paths"] = {
        r.get("kernel", "xla"): r["value"] for r in results
    }
    return best
