#!/usr/bin/env python
"""Round-5 MFU experiment: M-pad the conv net's M=64 matmuls to 128.

VERDICT r04 weak #1 / task 3: the learner profile showed conv2's
[64x256]x[256xB] im2col matmul carries 77% of the learner flops yet can
use at most half the MXU's 128 sublanes (M=64 output channels); the r04
convshape sweep tried only REFORMULATIONS (N-folded, tap-wise — both
lost, benchmarks/learner_profile_r04.md) but never the named lever:
zero-padding M to the MXU's native 128.

Two numerics-preserving padded variants of the cell-major conv forward
(t48/agent/cm_forward.py), measured in a grad+Adam scan against the
current batched im2col form with a noop baseline (interleaved
round-robin, pipelined — the pool-drift-proof methodology of
scripts/learner_profile_r04.py):

- mpad_slice:   conv2 kernel padded [256,64]->[256,128], h2 ReLU'd at
                128 channels then sliced back to 64 before the flatten;
                Dense_0 likewise padded to 128 outputs and sliced.
                (Risk: XLA's algebraic simplifier may push the slice
                back into the dot and undo the pad.)
- mpad_through: conv2 padded to 128 channels and NEVER sliced — the
                flatten carries [4*128] rows and Dense_0's weight gets
                matching zero INPUT rows, so the pad lanes flow through
                as exact zeros; Dense_0's 64 outputs are padded to 128
                the same way into Dense_1. Equivalent math, no
                slice for the simplifier to exploit.

Run (TPU): PYTHONPATH=/root/.axon_site:. python scripts/mpad_r05.py
Writes benchmarks/mpad_r05.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import optax


def _cache():
    d = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def interleaved_time(fns: dict, trials: int = 6):
    best = {k: float("inf") for k in fns}
    for name, (call, sync) in fns.items():  # warmup/compile
        sync(call())
    for _ in range(trials):
        for name, (call, sync) in fns.items():
            t0 = time.perf_counter()
            out = call()
            sync(out)
            best[name] = min(best[name], time.perf_counter() - t0)
    return best


def make_padded_forwards(dtype):
    from t48.agent import cm_forward

    T = cm_forward._TAPS
    C1 = cm_forward._CONV1_POS
    P = cm_forward._CONV2_POS

    def conv1(pp, xx, nb):
        k1 = pp["Conv_0"]["kernel"].astype(dtype).reshape(4, -1)
        b1 = pp["Conv_0"]["bias"].astype(dtype)
        x1 = jnp.stack(
            [jnp.stack([xx[(r + dr) * 4 + (c + dc)] for dr, dc in T])
             for r, c in C1]
        )
        h1 = jnp.einsum("pt...,tf->pf...", x1, k1) + b1.reshape(
            (1, -1) + (1,) * nb
        )
        return jnp.maximum(h1, 0)  # [9, 64, *b]

    def gather2(h1):
        return jnp.stack(
            [jnp.concatenate([h1[(r + dr) * 3 + (c + dc)] for dr, dc in T],
                             axis=0) for r, c in P]
        )  # [4, 256, *b]

    def fwd_mpad_slice(p_, xc):
        pp = p_["params"]
        xx = xc.astype(dtype)
        bshape = xx.shape[1:]
        nb = len(bshape)
        h1 = conv1(pp, xx, nb)
        k2 = jnp.pad(
            pp["Conv_1"]["kernel"].astype(dtype).reshape(256, 64),
            ((0, 0), (0, 64)),
        )
        b2 = jnp.pad(pp["Conv_1"]["bias"].astype(dtype), ((0, 64),))
        x2 = gather2(h1)
        h2 = jnp.einsum("pt...,tf->pf...", x2, k2) + b2.reshape(
            (1, -1) + (1,) * nb
        )
        h2 = jnp.maximum(h2, 0)[:, :64]  # slice pads back off
        flat = h2.reshape((256,) + bshape)
        w0 = jnp.pad(pp["Dense_0"]["kernel"].astype(dtype), ((0, 0), (0, 64)))
        b0 = jnp.pad(pp["Dense_0"]["bias"].astype(dtype), ((0, 64),))
        h3 = jnp.maximum(
            jnp.einsum("io,i...->o...", w0, flat)
            + b0.reshape((-1,) + (1,) * nb), 0,
        )[:64]
        w1 = pp["Dense_1"]["kernel"].astype(dtype)
        b1_ = pp["Dense_1"]["bias"].astype(dtype)
        return jnp.einsum("io,i...->o...", w1, h3) + b1_.reshape(
            (-1,) + (1,) * nb
        )

    def fwd_mpad_through(p_, xc):
        pp = p_["params"]
        xx = xc.astype(dtype)
        bshape = xx.shape[1:]
        nb = len(bshape)
        h1 = conv1(pp, xx, nb)
        k2 = jnp.pad(
            pp["Conv_1"]["kernel"].astype(dtype).reshape(256, 64),
            ((0, 0), (0, 64)),
        )
        b2 = jnp.pad(pp["Conv_1"]["bias"].astype(dtype), ((0, 64),))
        x2 = gather2(h1)
        h2 = jnp.maximum(
            jnp.einsum("pt...,tf->pf...", x2, k2)
            + b2.reshape((1, -1) + (1,) * nb), 0,
        )  # [4, 128, *b], channels 64.. exactly zero (ReLU(0+0))
        flat = h2.reshape((512,) + bshape)
        # Dense_0 weight with zero rows at the pad channels: rows are in
        # (pos, channel) flatten order, so insert 64 zero rows per pos.
        w0 = pp["Dense_0"]["kernel"].astype(dtype).reshape(4, 64, 64)
        w0 = jnp.pad(w0, ((0, 0), (0, 64), (0, 64))).reshape(512, 128)
        b0 = jnp.pad(pp["Dense_0"]["bias"].astype(dtype), ((0, 64),))
        h3 = jnp.maximum(
            jnp.einsum("io,i...->o...", w0, flat)
            + b0.reshape((-1,) + (1,) * nb), 0,
        )  # [128, *b], rows 64.. exactly zero
        w1 = jnp.pad(pp["Dense_1"]["kernel"].astype(dtype), ((0, 64), (0, 0)))
        b1_ = pp["Dense_1"]["bias"].astype(dtype)
        return jnp.einsum("io,i...->o...", w1, h3) + b1_.reshape(
            (-1,) + (1,) * nb
        )

    return fwd_mpad_slice, fwd_mpad_through


def run_experiment(batch_rows: int, trials: int, scan_len: int = 64,
                   pipeline: int = 4):
    from t48.agent import cm_forward, networks
    from t48.configs import get_preset
    from t48.train import loop as loop_lib

    cfg = get_preset("sss_published", env_batch=4096)
    net = loop_lib.build_net(cfg)
    encode = loop_lib.encoder_for(cfg.arch, cfg.board_k)
    params = net.init(jax.random.PRNGKey(0),
                      encode(jnp.zeros((1, 16), jnp.int8)))
    optimizer = loop_lib.build_optimizer(cfg)
    opt_state = optimizer.init(params)
    dtype = networks.dtype_of(cfg.compute_dtype)

    x = jax.random.randint(jax.random.PRNGKey(1), (16, batch_rows), 0, 10)
    actions = jax.random.randint(
        jax.random.PRNGKey(2), (batch_rows,), 0, 4
    )
    targets = jax.random.uniform(jax.random.PRNGKey(3), (batch_rows,)) * 100

    fwd_v1 = cm_forward.build_cm_forward("conv", dtype)
    fwd_slice, fwd_through = make_padded_forwards(dtype)

    # numerics: both padded forms match the current form exactly up to
    # accumulation order (bf16 compute → small tolerance)
    q1 = jax.jit(fwd_v1)(params, x)
    for name, f in [("slice", fwd_slice), ("through", fwd_through)]:
        q = jax.jit(f)(params, x)
        err = float(jnp.abs(q1 - q).max())
        assert err < 2.0, f"{name} mismatch: {err}"

    def make_runner(fwd):
        def loss(p_):
            q = fwd(p_, x)
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
            (p2, o2), _ = jax.lax.scan(body, (p_, o_), None, length=scan_len)
            return p2

        return run

    @jax.jit
    def run_noop(p_, o_):
        def body(carry, _):
            pp, oo = carry
            pp = jax.tree_util.tree_map(lambda v: v + 0e-30, pp)
            return (pp, oo), None

        (p2, _), _ = jax.lax.scan(body, (p_, o_), None, length=scan_len)
        return p2

    fns = {}
    for name, runner in [
        ("noop", run_noop),
        ("v1_current", make_runner(fwd_v1)),
        ("mpad_slice", make_runner(fwd_slice)),
        ("mpad_through", make_runner(fwd_through)),
    ]:
        def call(runner=runner):
            out = None
            for _ in range(pipeline):
                out = runner(params, opt_state)
            return out

        def sync(p_):
            return float(jax.device_get(jax.tree_util.tree_reduce(
                lambda a, v: a + jnp.sum(v.astype(jnp.float32)), p_, 0.0
            )))

        fns[name] = (call, sync)

    best = interleaved_time(fns, trials)
    n = scan_len * pipeline
    out = {k: {"us_per_update": round(v / n * 1e6, 1)} for k, v in best.items()}
    base = out["noop"]["us_per_update"]
    for k in ("v1_current", "mpad_slice", "mpad_through"):
        out[k]["us_minus_noop"] = round(out[k]["us_per_update"] - base, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--rows", type=int, nargs="*", default=[5000, 4096])
    ap.add_argument("--out", default="benchmarks/mpad_r05.json")
    args = ap.parse_args()
    _cache()
    result = {"device": str(jax.devices()[0])}
    for rows in args.rows:
        result[f"rows_{rows}"] = run_experiment(rows, args.trials)
        print(json.dumps({f"rows_{rows}": result[f"rows_{rows}"]}, indent=2),
              flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
