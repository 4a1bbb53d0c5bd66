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
import numpy as np

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


# ---------------------------------------------------------------------------
# Training-path benchmark: env-steps/s + episodes/s of the REAL train chunk,
# with a phase breakdown (env / +policy forward / +replay / full) and an
# MFU / roofline statement.
# ---------------------------------------------------------------------------

# Peak numbers used for utilization statements, by jax device_kind prefix.
# TPU v5e (v5 lite): 197 TFLOP/s bf16 on the MXU; f32 matmuls pass the MXU
# at ~1/4 rate (~49 TFLOP/s). VPU vector ops: 8 sublanes × 128 lanes × 4
# ALUs × ~0.94 GHz ≈ 3.85e12 elementwise ops/s per chip.
_PEAKS = {
    "TPU v5": {"bf16": 197e12, "f32": 49.25e12, "vpu_ops": 3.85e12},
    "TPU v5 lite": {"bf16": 197e12, "f32": 49.25e12, "vpu_ops": 3.85e12},
}


def _device_peaks() -> dict:
    kind = jax.devices()[0].device_kind
    for prefix, peaks in _PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return {}


def _compiled_flops(lowered_compiled) -> float:
    """XLA-reported flops of a compiled program (0.0 if unavailable)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _train_config(preset: str, env_batch: int, chunk_iters: int):
    from t48.configs import get_preset

    base = get_preset(preset)
    return get_preset(
        preset,
        env_batch=env_batch,
        chunk_iters=chunk_iters,
        replay_buffer_length=max(base.replay_buffer_length, 4 * env_batch),
        no_episodes_before_training=0,  # learner hot from the first episode
        seed=0,
    )


def _time_chunk(chunk, state, trials: int, pipeline: int = 8):
    """(best elapsed s per chunk, final state) for a jitted chunk.

    Times ``pipeline`` back-to-back calls (each consuming the previous
    output's futures — async dispatch queues them on the device) with a
    SINGLE final sync, then divides. On a remote-attached backend one
    dispatch+sync round trip costs ~30ms regardless of the program
    (measured against a null program); per-call timing would report that
    latency, not device throughput. The pipelined figure matches what
    the (equally pipelined) trainer loop sustains.
    """

    def sync(s):
        return float(jax.device_get(s.env.merge_scores.sum()))

    state = chunk(state)[0]  # warmup / compile
    sync(state)
    best = float("inf")
    for _ in range(max(trials, 1)):
        t0 = time.perf_counter()
        for _ in range(max(pipeline, 1)):
            state = chunk(state)[0]
        sync(state)
        best = min(best, (time.perf_counter() - t0) / max(pipeline, 1))
    return best, state


def run_train_bench(
    preset: str = "conv",
    env_batches=(64, 1024, 4096, 16384),
    chunk_iters: int = 256,
    trials: int = 3,
) -> dict:
    """Throughput of the REAL training iteration (env step + ε-greedy
    policy forward + replay writes + Double-DQN learner update + episode
    accounting) across env-batch sizes, with learner/policy MFU computed
    from XLA's own flop counts. Reference yardstick: 0.277 episodes/s /
    ~40 env-steps/s end-to-end (BASELINE.md)."""
    from t48.train import loop as loop_lib

    peaks = _device_peaks()
    results = []
    for env_batch in env_batches:
        cfg = _train_config(preset, env_batch, chunk_iters)
        state = loop_lib.create_train_state(cfg)
        chunk = jax.jit(loop_lib.make_train_chunk(cfg))
        ep0, ts0 = int(state.episodes_done), int(state.train_steps)
        pipeline = 8
        elapsed, state = _time_chunk(chunk, state, trials, pipeline)
        steps = env_batch * chunk_iters
        n_chunks = 1 + trials * pipeline  # warmup + timed
        eps_per_chunk = (int(state.episodes_done) - ep0) / n_chunks
        updates_per_chunk = (int(state.train_steps) - ts0) / n_chunks

        # flop accounting from XLA cost analysis (same net / optimizer /
        # learner-step construction as the real training loop)
        net = loop_lib.build_net(cfg)
        encode = loop_lib.encoder_for(cfg.arch, cfg.board_k)
        x = jnp.zeros((env_batch, cfg.board_k * cfg.board_k), jnp.int8)
        params = net.init(jax.random.PRNGKey(0), encode(x))
        fwd_flops = _compiled_flops(
            jax.jit(net.apply).lower(params, encode(x)).compile()
        )
        from t48.replay import buffer as replay_lib

        raw_batch = env_batch * replay_lib.sample_rows(cfg.batch_size, env_batch)
        capped = cfg.learner_batch_cap and raw_batch > cfg.batch_size
        eff_batch = cfg.batch_size if capped else raw_batch
        tr = replay_lib.CMTransition(
            state=jnp.zeros((16, raw_batch), jnp.float32),
            action=jnp.zeros((raw_batch,), jnp.int32),
            reward=jnp.zeros((raw_batch,), jnp.float32),
            next_state=jnp.zeros((16, raw_batch), jnp.float32),
            done=jnp.zeros((raw_batch,), bool),
            weight=jnp.ones((raw_batch,), jnp.float32) if capped else None,
        )
        step_fn = loop_lib.build_train_step(cfg)
        opt_state = loop_lib.build_optimizer(cfg).init(params)
        learner_flops = _compiled_flops(
            jax.jit(step_fn).lower(params, params, opt_state, tr).compile()
        )
        chunk_flops = (
            fwd_flops * chunk_iters + learner_flops * updates_per_chunk
        )
        flops_per_s = chunk_flops / elapsed
        row = {
            "env_batch": env_batch,
            "env_steps_per_s": round(steps / elapsed, 1),
            "episodes_per_s": round(eps_per_chunk / elapsed, 2),
            "learner_updates_per_chunk": updates_per_chunk,
            "effective_learner_batch": eff_batch,
            "model_flops_per_s": round(flops_per_s, 1),
            "elapsed_s": round(elapsed, 4),
        }
        if peaks:
            row["mfu_vs_f32_peak"] = round(flops_per_s / peaks["f32"], 6)
            row["mfu_vs_bf16_peak"] = round(flops_per_s / peaks["bf16"], 6)
        results.append(row)
    return {
        "metric": "train_env_steps_per_s",
        "preset": preset,
        "chunk_iters": chunk_iters,
        "device": str(jax.devices()[0]),
        "device_kind": jax.devices()[0].device_kind,
        "rows": results,
        "vs_baseline_episodes_per_s": (
            round(max(r["episodes_per_s"] for r in results) / 0.277, 1)
        ),
    }


def run_phase_breakdown(
    preset: str = "conv",
    env_batch: int = 4096,
    chunk_iters: int = 256,
    trials: int = 3,
) -> dict:
    """Where the training iteration's time goes: cumulative timings of the
    ablated chunk (env-only → +policy forward → +replay writes → full
    incl. learner + episode ring). Deltas attribute time per stage."""
    from t48.train import loop as loop_lib

    cfg = _train_config(preset, env_batch, chunk_iters)
    stages = [
        ("env_only", dict(with_policy=False, with_replay=False,
                          with_learner=False, with_log=False)),
        ("env_policy", dict(with_replay=False, with_learner=False,
                            with_log=False)),
        ("env_policy_replay", dict(with_learner=False, with_log=False)),
        ("env_policy_replay_learner", dict(with_log=False)),
        ("full", {}),
    ]
    out = {"env_batch": env_batch, "chunk_iters": chunk_iters,
           "preset": preset, "stages": {}}
    prev = 0.0
    for name, flags in stages:
        state = loop_lib.create_train_state(cfg)
        chunk = jax.jit(loop_lib.make_train_chunk(cfg, **flags))
        elapsed, _ = _time_chunk(chunk, state, trials)
        out["stages"][name] = {
            "elapsed_s": round(elapsed, 4),
            "env_steps_per_s": round(env_batch * chunk_iters / elapsed, 1),
            "delta_vs_prev_s": round(elapsed - prev, 4),
        }
        prev = elapsed
    return out


def env_kernel_roofline(env_batch: int = 32768, iters: int = 65536,
                        block: int = 1024) -> dict:
    """VPU roofline statement for the fused Pallas rollout kernel: count
    the integer vector ops of ONE kernel step from its jaxpr (each op
    processes `block` lanes), multiply by measured steps/s, compare to
    VPU peak. The kernel is compute-bound by construction (boards stay in
    VMEM; no HBM traffic inside the loop), so ops/s vs VPU peak is the
    honest utilization measure — there are no MXU flops to count."""
    from t48.ops import pallas_step as ps

    # count vector eqns of one fori body at the kernel's working shape
    sub, lanes = 8, block // 8

    def one_step(boards, rand):
        cells = [boards[i] for i in range(16)]
        legal = ps._legal_all(cells)
        sel, delta = ps._apply_chosen(cells, jnp.zeros((sub, lanes), jnp.int32))
        spawned = ps._spawn(sel, jnp.ones((sub, lanes), jnp.int32),
                            rand[0], rand[1])
        return jnp.stack(spawned), delta, legal[0]

    jaxpr = jax.make_jaxpr(one_step)(
        jnp.zeros((16, sub, lanes), jnp.int32),
        jnp.zeros((2, sub, lanes), jnp.int32),
    )
    n_vec_ops = 0
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            shape = getattr(var.aval, "shape", ())
            if shape and int(np.prod(shape)) >= sub * lanes:
                n_vec_ops += int(np.prod(shape)) // (sub * lanes)
    # measured throughput of the real kernel
    perf = run_bench_pallas(env_batch=env_batch, iters=iters, block=block)
    ops_per_s = n_vec_ops * perf["value"]
    peaks = _device_peaks()
    out = {
        "kernel": "pallas_rollout",
        "vector_ops_per_env_step": n_vec_ops,
        "env_steps_per_s": perf["value"],
        "achieved_vpu_ops_per_s": round(ops_per_s, 1),
    }
    if peaks:
        out["vpu_utilization"] = round(ops_per_s / peaks["vpu_ops"], 4)
        out["vpu_peak_ops_per_s"] = peaks["vpu_ops"]
    return out


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
