#!/usr/bin/env python
"""Round-4 learner profiling: where do the in-loop update's microseconds go?

VERDICT r03 weak #1: the in-loop learner runs at 0.14-0.17 of bf16 peak
and is 66% of the training iteration; nobody profiled where inside the
update the other ~85% of the time goes. This script answers that with
two complementary measurements on the real TPU:

1. **In-loop marginal cost**: time the REAL train chunk at several
   ``max_updates_per_iteration`` values; the slope of chunk-time vs n_up
   is the true per-update cost inside the scan context (the only number
   that matters, per benchmarks/learner_flags_r03.md's lesson).

2. **Bisected synthetic scan**: a minimal lax.scan that mimics the
   in-loop learner (sample -> train_step -> select-merge keep) with
   pieces ablated one at a time, so the per-update cost decomposes into
   sample / forwards / backward / Adam / keep-merge / scan machinery.

All trials are interleaved round-robin (the shared pool drifts >2x over
minutes) and pipelined 4-8 calls per sync (one dispatch+sync round trip
through the tunnel costs ~30ms regardless of program).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import optax


def _cache():
    import os

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def interleaved_time(fns: dict, trials: int = 6):
    """{name: (call, sync)} -> {name: best elapsed s}; round-robin."""
    best = {k: float("inf") for k in fns}
    # warmup all (compile)
    for name, (call, sync) in fns.items():
        sync(call())
    for _ in range(trials):
        for name, (call, sync) in fns.items():
            t0 = time.perf_counter()
            out = call()
            sync(out)
            best[name] = min(best[name], time.perf_counter() - t0)
    return best


def in_loop_marginal(env_batch: int, chunk_iters: int, n_ups, pipeline: int, trials: int):
    """Chunk time at several max_updates values -> marginal cost/update."""
    from t48.configs import get_preset
    from t48.train import loop as loop_lib

    fns = {}
    states = {}
    for n_up in n_ups:
        cfg = get_preset(
            "sss_published",
            env_batch=env_batch,
            chunk_iters=chunk_iters,
            max_updates_per_iteration=max(n_up, 1),
            no_episodes_before_training=0,
            use_astar_seed=False,
            seed=0,
        )
        state = loop_lib.create_train_state(cfg)
        chunk = (
            loop_lib.make_train_chunk(cfg)
            if n_up > 0
            else loop_lib.make_train_chunk(cfg, with_learner=False)
        )

        def call(chunk=chunk, n_up=n_up):
            s = states[n_up]
            for _ in range(pipeline):
                s = chunk(s)[0]
            states[n_up] = s
            return s

        def sync(s):
            return float(jax.device_get(s.env.merge_scores.sum()))

        states[n_up] = state
        fns[n_up] = (call, sync)

    best = interleaved_time(fns, trials)
    out = {}
    for n_up, elapsed in best.items():
        per_chunk = elapsed / pipeline
        out[n_up] = {
            "s_per_chunk": per_chunk,
            "us_per_iter": per_chunk / chunk_iters * 1e6,
        }
    ks = sorted(out)
    for a, b in zip(ks, ks[1:]):
        du = out[b]["us_per_iter"] - out[a]["us_per_iter"]
        out[b]["marginal_us_per_update"] = du / (b - a)
    return out


def synthetic_scan_bisect(
    env_batch: int, batch_size: int, n_up: int, scan_len: int,
    pipeline: int, trials: int,
):
    """Minimal in-scan learner with pieces ablated. Per-update µs each."""
    from t48.agent import cm_forward, networks
    from t48.agent import learner as learner_lib
    from t48.configs import get_preset
    from t48.replay import buffer as replay_lib
    from t48.train import loop as loop_lib

    cfg = get_preset(
        "sss_published", env_batch=env_batch, max_updates_per_iteration=n_up
    )
    net = loop_lib.build_net(cfg)
    encode = loop_lib.encoder_for(cfg.arch, cfg.board_k)
    params = net.init(
        jax.random.PRNGKey(0), encode(jnp.zeros((1, 16), jnp.int8))
    )
    optimizer = loop_lib.build_optimizer(cfg)
    opt_state = optimizer.init(params)
    apply_cm = cm_forward.build_cm_forward(
        cfg.arch, networks.dtype_of(cfg.compute_dtype)
    )
    train_step = loop_lib.build_train_step(cfg)

    # a filled replay buffer
    replay = replay_lib.create(cfg.replay_buffer_length, 16, env_batch)
    key = jax.random.PRNGKey(1)
    tr = replay_lib.CMTransition(
        state=jax.random.randint(key, (16, env_batch), 0, 10).astype(jnp.int32),
        action=jnp.zeros((env_batch,), jnp.int32),
        reward=jnp.ones((env_batch,), jnp.float32),
        next_state=jax.random.randint(key, (16, env_batch), 0, 10).astype(jnp.int32),
        done=jnp.zeros((env_batch,), bool),
    )
    fill = jax.jit(
        lambda r: jax.lax.fori_loop(
            0, r.per_env_capacity, lambda i, rr: replay_lib.add_step(rr, tr), r
        )
    )
    replay = fill(replay)
    fixed_batch = replay_lib.sample(
        replay, jax.random.PRNGKey(2), batch_size, cap=cfg.learner_batch_cap
    )
    fixed_batch = jax.tree_util.tree_map(lambda x: jax.device_get(x), fixed_batch)
    fixed_batch = jax.tree_util.tree_map(jnp.asarray, fixed_batch)

    episodes_done = jnp.int32(10_000)

    def make_runner(body_kind: str):
        """scan over n_up*scan_len update bodies carrying (params, opt)."""

        def one(carry, k_s):
            params, opt_state, last_train = carry
            should = last_train < episodes_done
            if body_kind == "noop":
                # carry passthrough with a token touch: the scan/carry
                # machinery and call overhead, no learner work at all
                params = jax.tree_util.tree_map(
                    lambda p: p + 0e-30 * k_s[0].astype(p.dtype), params
                )
                return (params, opt_state, last_train + 1), None
            if body_kind == "sample_only":
                b = replay_lib.sample(
                    replay, k_s, batch_size, cap=cfg.learner_batch_cap
                )
                # consume the sample so it isn't DCE'd
                s = (
                    jnp.sum(b.state) + jnp.sum(b.reward)
                    + jnp.sum(b.action) + jnp.sum(b.next_state)
                )
                params = jax.tree_util.tree_map(
                    lambda p: p + 0e-30 * s.astype(p.dtype), params
                )
                return (params, opt_state, last_train + 1), None
            b = (
                replay_lib.sample(replay, k_s, batch_size, cap=cfg.learner_batch_cap)
                if body_kind not in ("fixed_batch",)
                else fixed_batch
            )
            if body_kind == "fwd_only":
                q = apply_cm(params, b.state)
                q2 = apply_cm(params, b.next_state)
                q3 = apply_cm(params, b.next_state)
                s = jnp.sum(q) + jnp.sum(q2) + jnp.sum(q3)
                params = jax.tree_util.tree_map(
                    lambda p: p + 0e-30 * s.astype(p.dtype), params
                )
                return (params, opt_state, last_train + 1), None
            if body_kind == "grad_only":
                loss, grads = jax.value_and_grad(
                    lambda p: learner_lib.td_loss(
                        apply_cm, p, params, lambda x: x, b,
                        cfg.discount_factor, cfg.use_double_dqn, False, True,
                    )
                )(params)
                # apply a tiny sgd so params stay live without optax
                params = jax.tree_util.tree_map(
                    lambda p, g: p - 0e-30 * g, params, grads
                )
                return (params, opt_state, last_train + 1), None
            out = train_step(params, params, opt_state, b)
            if body_kind == "no_keep":
                return (out.params, out.opt_state, last_train + 1), None
            # full: the loop's speculative select-merge
            keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
                lambda n, o: jnp.where(should, n, o), new, old
            )
            return (
                keep(out.params, params),
                keep(out.opt_state, opt_state),
                jnp.where(should, last_train + 1, last_train),
            ), None

        @jax.jit
        def runner(params, opt_state, key):
            keys = jax.random.split(key, n_up * scan_len)
            (p, o, lt), _ = jax.lax.scan(
                one, (params, opt_state, jnp.int32(0)), keys
            )
            return p, o, lt

        return runner

    kinds = [
        "noop", "full", "no_keep", "fixed_batch", "grad_only", "fwd_only",
        "sample_only",
    ]
    # precompute per-call keys ON DEVICE: any eager op (PRNGKey, fold_in)
    # in the timed path costs ~ms of serialized dispatch through the
    # tunnel and poisons absolute numbers (see sample_micro findings)
    call_keys = [
        jax.device_put(k)
        for k in jax.random.split(jax.random.PRNGKey(3), pipeline)
    ]
    fns = {}
    for kind in kinds:
        runner = make_runner(kind)

        def call(runner=runner):
            p, o = params, opt_state
            for k in call_keys:
                p, o, lt = runner(p, o, k)
            return p

        def sync(p):
            return float(
                jax.device_get(
                    jax.tree_util.tree_reduce(
                        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), p, 0.0
                    )
                )
            )

        fns[kind] = (call, sync)

    best = interleaved_time(fns, trials)
    n_updates = n_up * scan_len * pipeline
    return {k: {"us_per_update": v / n_updates * 1e6} for k, v in best.items()}


def sample_micro(env_batch: int, batch_size: int, iters: int, pipeline: int, trials: int):
    """Bisect INSIDE replay sampling: scan bodies carrying only a small
    f32 accumulator, so per-iteration cost isolates each piece."""
    from t48.configs import get_preset
    from t48.replay import buffer as replay_lib

    cfg = get_preset("sss_published", env_batch=env_batch)
    replay = replay_lib.create(cfg.replay_buffer_length, 16, env_batch)
    key = jax.random.PRNGKey(1)
    tr = replay_lib.CMTransition(
        state=jax.random.randint(key, (16, env_batch), 0, 10).astype(jnp.int32),
        action=jnp.zeros((env_batch,), jnp.int32),
        reward=jnp.ones((env_batch,), jnp.float32),
        next_state=jax.random.randint(key, (16, env_batch), 0, 10).astype(jnp.int32),
        done=jnp.zeros((env_batch,), bool),
    )
    replay = jax.jit(
        lambda r: jax.lax.fori_loop(
            0, r.per_env_capacity, lambda i, rr: replay_lib.add_step(rr, tr), r
        )
    )(replay)
    r, m, b = replay.rows.shape
    s = replay_lib.sample_rows(batch_size, b)
    fixed_idx = jax.random.randint(jax.random.PRNGKey(5), (s, b), 0, m)

    def body(kind):
        def f(carry, k_s):
            acc = carry
            if kind == "noop":
                return acc + 1.0, None
            if kind == "split_only":
                k_idx, k_off = jax.random.split(k_s)
                return acc + k_idx[0].astype(jnp.float32), None
            if kind == "randint":
                k_idx, k_off = jax.random.split(k_s)
                idx = jax.random.randint(
                    k_idx, (s, b), 0, jnp.maximum(replay.fill, 1)
                )
                return acc + jnp.sum(idx).astype(jnp.float32), None
            if kind == "einsum_fixed_idx":
                onehot = (
                    fixed_idx[:, None, :] == jnp.arange(m)[None, :, None]
                ).astype(jnp.bfloat16)
                flat = jnp.einsum(
                    "smb,rmb->rsb", onehot, replay.rows,
                    preferred_element_type=jnp.float32,
                )
                return acc + jnp.sum(flat[0]), None
            if kind == "take_fixed_idx":
                # gather formulation for contrast: rows[:, idx[s,b], b]
                flat = jnp.take_along_axis(
                    replay.rows[:, :, :], fixed_idx[None, :, :], axis=1
                ).astype(jnp.float32)
                return acc + jnp.sum(flat[0]), None
            if kind == "full_sample":
                out = replay_lib.sample(
                    replay, k_s, batch_size, cap=cfg.learner_batch_cap
                )
                return acc + jnp.sum(out.reward) + jnp.sum(out.state[0]), None
            raise ValueError(kind)

        return f

    kinds = [
        "noop", "split_only", "randint", "einsum_fixed_idx",
        "take_fixed_idx", "full_sample",
    ]
    fns = {}
    for kind in kinds:
        @functools.partial(jax.jit, static_argnames=())
        def runner(key, _body=body(kind)):
            keys = jax.random.split(key, iters)
            acc, _ = jax.lax.scan(_body, jnp.float32(0), keys)
            return acc

        def call(runner=runner):
            accs = []
            for i in range(pipeline):
                accs.append(runner(jax.random.fold_in(jax.random.PRNGKey(7), i)))
            return accs[-1]

        fns[kind] = (call, lambda a: float(jax.device_get(a)))

    best = interleaved_time(fns, trials)
    n = iters * pipeline
    return {k: {"us_per_iter": v / n * 1e6} for k, v in best.items()}


def candidate_configs(chunk_iters: int, pipeline: int, trials: int):
    """Full-cadence flagship candidates: in-chunk env-steps/s, interleaved."""
    from t48.configs import get_preset
    from t48.train import loop as loop_lib

    cases = [
        ("b4096_u0", 4096, 0),
        ("b4096_u29", 4096, 29),
        ("b5120_u0", 5120, 0),
        ("b5120_u36", 5120, 36),
        ("b5120_u40", 5120, 40),
    ]
    fns, states = {}, {}
    for name, env_batch, n_up in cases:
        cfg = get_preset(
            "sss_published",
            env_batch=env_batch,
            chunk_iters=chunk_iters,
            max_updates_per_iteration=max(n_up, 1),
            no_episodes_before_training=0,
            use_astar_seed=False,
            seed=0,
        )
        state = loop_lib.create_train_state(cfg)
        chunk = (
            loop_lib.make_train_chunk(cfg)
            if n_up > 0
            else loop_lib.make_train_chunk(cfg, with_learner=False)
        )

        def call(chunk=chunk, name=name):
            s = states[name]
            for _ in range(pipeline):
                s = chunk(s)[0]
            states[name] = s
            return s

        states[name] = state
        fns[name] = (
            call,
            lambda s: float(jax.device_get(s.env.merge_scores.sum())),
        )

    best = interleaved_time(fns, trials)
    out = {}
    for (name, env_batch, n_up), elapsed in zip(cases, best.values()):
        per_chunk = best[name] / pipeline
        out[name] = {
            "s_per_chunk": round(per_chunk, 5),
            "env_steps_per_s": round(env_batch * chunk_iters / per_chunk, 1),
            "realized_updates": int(states[name].train_steps),
            "episodes": int(states[name].episodes_done),
        }
    return out


def flag_variants(chunk_iters: int, pipeline: int, trials: int):
    """Full-cadence learner flag re-measurement in the CELL-MAJOR loop
    (the r03 verdicts on fused-apply/flat-adam predate the CM rework)."""
    from t48.configs import get_preset
    from t48.train import loop as loop_lib

    cases = [
        ("b4096_u40_scan", dict(env_batch=4096, max_updates_per_iteration=40,
                                learner_update_mode="scan")),
        ("b4096_u40_while", dict(env_batch=4096, max_updates_per_iteration=40,
                                 learner_update_mode="while")),
        ("b4096_u40_while_fused", dict(env_batch=4096,
                                       max_updates_per_iteration=40,
                                       learner_update_mode="while",
                                       learner_fused_apply=True)),
        ("b4096_u40_while_flat", dict(env_batch=4096,
                                      max_updates_per_iteration=40,
                                      learner_update_mode="while",
                                      learner_flat_adam=True)),
        ("b5120_u40_scan", dict(env_batch=5120, max_updates_per_iteration=40,
                                learner_update_mode="scan")),
        ("b5120_u40_while", dict(env_batch=5120, max_updates_per_iteration=40,
                                 learner_update_mode="while")),
    ]
    fns, states = {}, {}
    for name, overrides in cases:
        cfg = get_preset(
            "sss_published",
            chunk_iters=chunk_iters,
            no_episodes_before_training=0,
            use_astar_seed=False,
            seed=0,
            **overrides,
        )
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)

        def call(chunk=chunk, name=name):
            s = states[name]
            for _ in range(pipeline):
                s = chunk(s)[0]
            states[name] = s
            return s

        states[name] = state
        fns[name] = (
            call,
            lambda s: float(jax.device_get(s.env.merge_scores.sum())),
        )

    best = interleaved_time(fns, trials)
    out = {}
    for name, overrides in cases:
        per_chunk = best[name] / pipeline
        env_batch = overrides["env_batch"]
        out[name] = {
            "s_per_chunk": round(per_chunk, 5),
            "env_steps_per_s": round(env_batch * chunk_iters / per_chunk, 1),
            "updates_per_episode": round(
                int(states[name].train_steps)
                / max(int(states[name].episodes_done), 1), 3
            ),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", default="both",
        choices=["inloop", "bisect", "both", "micro", "configs", "flags", "convshape"],
    )
    ap.add_argument("--env-batch", type=int, default=4096)
    ap.add_argument("--chunk-iters", type=int, default=32)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()
    _cache()

    out = {"device": str(jax.devices()[0])}
    if args.mode in ("inloop", "both"):
        out["in_loop"] = in_loop_marginal(
            args.env_batch, args.chunk_iters, n_ups=[0, 1, 8, 28],
            pipeline=4, trials=args.trials,
        )
    if args.mode in ("bisect", "both"):
        out["bisect"] = synthetic_scan_bisect(
            args.env_batch, 5000, n_up=8, scan_len=8,
            pipeline=4, trials=args.trials,
        )
    if args.mode == "micro":
        out["micro"] = sample_micro(
            args.env_batch, 5000, iters=256, pipeline=4, trials=args.trials,
        )
    if args.mode == "configs":
        out["configs"] = candidate_configs(
            args.chunk_iters, pipeline=4, trials=args.trials,
        )
    if args.mode == "flags":
        out["flags"] = flag_variants(
            args.chunk_iters, pipeline=2, trials=args.trials,
        )
    if args.mode == "convshape":
        out["convshape"] = conv_shape_experiment(args.env_batch, args.trials)
    print(json.dumps(out, indent=1, default=str))




def conv_shape_experiment(env_batch: int, trials: int):
    """Grad+Adam cost of the current 4-batched conv2 vs an N-folded
    variant (one [64x256]x[256x4B] matmul + a static Dense_0 row
    permutation) — measured in a scan, interleaved, with a noop
    baseline. Production adoption only if it wins clearly."""
    import jax.numpy as jnp
    import optax

    from t48.agent import cm_forward, networks
    from t48.configs import get_preset
    from t48.train import loop as loop_lib

    cfg = get_preset("sss_published", env_batch=env_batch)
    net = loop_lib.build_net(cfg)
    encode = loop_lib.encoder_for(cfg.arch, cfg.board_k)
    params = net.init(jax.random.PRNGKey(0),
                      encode(jnp.zeros((1, 16), jnp.int8)))
    optimizer = loop_lib.build_optimizer(cfg)
    opt_state = optimizer.init(params)
    dtype = networks.dtype_of(cfg.compute_dtype)

    x = jax.random.randint(jax.random.PRNGKey(1), (16, 5000), 0, 10)
    actions = jax.random.randint(jax.random.PRNGKey(2), (5000,), 0, 4)
    targets = jax.random.uniform(jax.random.PRNGKey(3), (5000,)) * 100

    P = cm_forward._CONV2_POS
    T = cm_forward._TAPS
    C1 = cm_forward._CONV1_POS
    # feat-major -> pos-major index permutation for Dense_0 rows
    # v2 flat index j = feat*4 + pos must read flax row pos*64 + feat
    perm = jnp.asarray(
        [p * 64 + f for f in range(64) for p in range(4)], jnp.int32
    )

    def fwd_v2(p_, xc):
        pp = p_["params"]
        xx = xc.astype(dtype)
        bshape = xx.shape[1:]
        nb = len(bshape)
        bc = lambda v, lead: v.reshape((1, -1) + (1,) * lead)
        k1 = pp["Conv_0"]["kernel"].astype(dtype).reshape(4, -1)
        b1 = pp["Conv_0"]["bias"].astype(dtype)
        x1 = jnp.stack(
            [jnp.stack([xx[(r + dr) * 4 + (c + dc)] for dr, dc in T])
             for r, c in C1]
        )
        h1 = jnp.einsum("pt...,tf->pf...", x1, k1) + bc(b1, nb)
        h1 = jnp.maximum(h1, 0)  # [9, 64, *b]
        # N-folded conv2: x2 [256, 4, *b]; one matmul over (4, *b) batch
        k2 = pp["Conv_1"]["kernel"].astype(dtype).reshape(256, 64)
        b2 = pp["Conv_1"]["bias"].astype(dtype)
        x2 = jnp.stack(
            [jnp.concatenate([h1[(r + dr) * 3 + (c + dc)] for dr, dc in T],
                             axis=0) for r, c in P],
            axis=1,
        )  # [256, 4, *b]
        h2 = jnp.einsum("t...,tf->f...", x2, k2) + b2.reshape(
            (-1, 1) + (1,) * nb
        )
        h2 = jnp.maximum(h2, 0)  # [64, 4, *b]
        flat = h2.reshape((256,) + bshape)  # FEAT-major
        # Dense_0 with rows permuted to match feat-major flatten
        w0 = pp["Dense_0"]["kernel"].astype(dtype)[perm]
        b0 = pp["Dense_0"]["bias"].astype(dtype)
        h3 = jnp.maximum(
            jnp.einsum("io,i...->o...", w0, flat)
            + b0.reshape((-1,) + (1,) * nb), 0,
        )
        w1 = pp["Dense_1"]["kernel"].astype(dtype)
        b1_ = pp["Dense_1"]["bias"].astype(dtype)
        return jnp.einsum("io,i...->o...", w1, h3) + b1_.reshape(
            (-1,) + (1,) * nb
        )


    def fwd_v3(p_, xc):
        """Tap-wise conv2 + position-wise Dense_0: NO concat/stack
        materialization anywhere past h1 — conv2 output position p is a
        sum of four [64x64] tap matmuls on h1 slices read in place, and
        Dense_0 consumes the four position blocks as separate [64->64]
        matmuls summed. Identical flops and math to v1 (different
        accumulation order)."""
        pp = p_["params"]
        xx = xc.astype(dtype)
        bshape = xx.shape[1:]
        nb = len(bshape)
        k1 = pp["Conv_0"]["kernel"].astype(dtype).reshape(4, -1)
        b1 = pp["Conv_0"]["bias"].astype(dtype)
        x1 = jnp.stack(
            [jnp.stack([xx[(r + dr) * 4 + (c + dc)] for dr, dc in T])
             for r, c in C1]
        )
        h1 = jnp.einsum("pt...,tf->pf...", x1, k1) + b1.reshape(
            (1, -1) + (1,) * nb
        )
        h1 = jnp.maximum(h1, 0)  # [9, 64, *b]
        k2 = pp["Conv_1"]["kernel"].astype(dtype).reshape(4, 64, 64)
        b2 = pp["Conv_1"]["bias"].astype(dtype)
        w0 = pp["Dense_0"]["kernel"].astype(dtype).reshape(4, 64, 64)
        b0 = pp["Dense_0"]["bias"].astype(dtype)
        h3 = None
        for pi, (r, c) in enumerate(P):
            h2p = None
            for ti, (dr, dc) in enumerate(T):
                contrib = jnp.einsum(
                    "i...,io->o...", h1[(r + dr) * 3 + (c + dc)], k2[ti]
                )
                h2p = contrib if h2p is None else h2p + contrib
            h2p = jnp.maximum(h2p + b2.reshape((-1,) + (1,) * nb), 0)
            c0 = jnp.einsum("i...,io->o...", h2p, w0[pi])
            h3 = c0 if h3 is None else h3 + c0
        h3 = jnp.maximum(h3 + b0.reshape((-1,) + (1,) * nb), 0)
        w1 = pp["Dense_1"]["kernel"].astype(dtype)
        b1_ = pp["Dense_1"]["bias"].astype(dtype)
        return jnp.einsum("io,i...->o...", w1, h3) + b1_.reshape(
            (-1,) + (1,) * nb
        )

    fwd_v1 = cm_forward.build_cm_forward("conv", dtype)

    # numeric check: v2 == v1 to tolerance
    q1 = jax.jit(fwd_v1)(params, x)
    q2 = jax.jit(fwd_v2)(params, x)
    q3 = jax.jit(fwd_v3)(params, x)
    err = float(jnp.abs(q1 - q2).max())
    assert err < 2.0, f"v2 mismatch: {err}"
    err3 = float(jnp.abs(q1 - q3).max())
    assert err3 < 2.0, f"v3 mismatch: {err3}"

    def make_runner(fwd):
        def loss(p_):
            q = fwd(p_, x)  # [4, 5000]
            onehot = actions[None] == jnp.arange(4)[:, None]
            taken = jnp.sum(jnp.where(onehot, q, 0.0), 0).astype(jnp.float32)
            return jnp.sum(jnp.square(taken - targets))

        def body(carry, _):
            p_, o_ = carry
            l, g = jax.value_and_grad(loss)(p_)
            up, o2 = optimizer.update(g, o_, p_)
            return (optax.apply_updates(p_, up), o2), None

        @jax.jit
        def run(p_, o_):
            (p2, o2), _ = jax.lax.scan(body, (p_, o_), None, length=64)
            return p2

        return run

    def make_noop():
        @jax.jit
        def run(p_, o_):
            def body(carry, _):
                pp, oo = carry
                pp = jax.tree_util.tree_map(lambda v: v + 0e-30, pp)
                return (pp, oo), None
            (p2, _), _ = jax.lax.scan(body, (p_, o_), None, length=64)
            return p2
        return run

    fns = {}
    for name, runner in [("noop", make_noop()),
                         ("v1_batched", make_runner(fwd_v1)),
                         ("v2_nfolded", make_runner(fwd_v2)),
                         ("v3_tapwise", make_runner(fwd_v3))]:
        def call(runner=runner):
            out = None
            for _ in range(4):
                out = runner(params, opt_state)
            return out

        def sync(p_):
            return float(jax.device_get(
                jax.tree_util.tree_reduce(
                    lambda a, v: a + jnp.sum(v.astype(jnp.float32)), p_, 0.0
                )
            ))

        fns[name] = (call, sync)
    best = interleaved_time(fns, trials)
    n = 64 * 4
    out = {k: {"us_per_update": round(v / n * 1e6, 1)} for k, v in best.items()}
    base = out["noop"]["us_per_update"]
    for k in ("v1_batched", "v2_nfolded", "v3_tapwise"):
        out[k]["us_minus_noop"] = round(out[k]["us_per_update"] - base, 1)
    return out


if __name__ == "__main__":
    main()
