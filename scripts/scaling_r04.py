#!/usr/bin/env python
"""Multi-chip performance characterization (VERDICT r04 task 4).

No multi-chip hardware is available (one tunneled v5e chip), so the
scaling story is built from three measured artifacts on the virtual
8-device CPU mesh plus the single-chip TPU numbers:

1. **Relative DP overhead**: the SAME global-shape train chunk timed
   unmeshed vs on a 1-device mesh vs an 8-device 'data' mesh (CPU
   wall-clock; the RATIO isolates GSPMD partitioning + collective
   overhead from device speed).
2. **Collective inventory**: every collective op in the compiled SPMD
   chunk HLO, with byte sizes — the exact per-chunk communication
   volume a real slice would put on ICI.
3. **Projection**: v5e-8 env-steps/s from the measured single-chip
   full-cadence numbers + the measured collective volumes + published
   ICI bandwidth, under the three scaling regimes of
   benchmarks/scaling_r04.md.

Writes benchmarks/scaling_r04.json; the companion .md interprets it.
Run: python scripts/scaling_r04.py   (forces CPU + 8 virtual devices)
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from t48.configs import get_preset
from t48.distrib import distribute_train_state, make_mesh
from t48.train import loop as loop_lib

_DTYPE_BYTES = {"s8": 1, "u8": 1, "pred": 1, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "f32": 4, "s32": 4, "u32": 4,
                "f64": 8, "s64": 8, "u64": 8}


def _cfg(env_batch: int, chunk_iters: int = 16, max_updates: int = 8):
    return get_preset(
        "sss_published",
        batch_size=1024,
        env_batch=env_batch,
        chunk_iters=chunk_iters,
        max_updates_per_iteration=max_updates,
        no_episodes_before_training=0,
        use_astar_seed=False,
        env_backend="xla",  # CPU has no Pallas path
        seed=0,
    )


def collective_inventory(txt: str) -> dict:
    """Every collective in an HLO dump with shapes and byte sizes."""
    out = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        ops = []
        for line in txt.splitlines():
            if f" {kind}(" not in line:
                continue
            # result shapes sit between '=' and the op name; tuples for
            # multi-operand psums: (f32[64], f32[64,4], ...) all-reduce(
            m = re.search(rf"=\s*(.+?)\s+{kind}\(", line)
            if not m:
                continue
            shapes = re.findall(r"(\w+)\[([\d,]*)\]", m.group(1))
            total = 0
            for dt, dims in shapes:
                if dt not in _DTYPE_BYTES:
                    continue
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                total += n * _DTYPE_BYTES[dt]
            if total:
                ops.append(total)
        if ops:
            out[kind] = {
                "count": len(ops),
                "bytes_each": sorted(set(ops), reverse=True)[:8],
                "bytes_total": sum(ops),
            }
    return out


def time_chunk(chunk, state, pipeline: int = 2, trials: int = 3) -> float:
    def sync(s):
        return float(jax.device_get(s.env.merge_scores.sum()))

    state = chunk(state)[0]
    sync(state)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        s = state
        for _ in range(pipeline):
            s = chunk(s)[0]
        sync(s)
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return best


def main():
    env_batch, chunk_iters, n_up = 512, 8, 2
    cfg = _cfg(env_batch, chunk_iters, n_up)
    out = {
        "config": {
            "env_batch": env_batch, "chunk_iters": chunk_iters,
            "max_updates_per_iteration": n_up,
            "note": "sss_published shapes, XLA env (CPU mesh), same "
                    "GLOBAL shapes in every variant",
        },
        "devices": len(jax.devices()),
    }

    # ---- 1. relative DP overhead, same global work -----------------------
    timings = {}
    state0 = loop_lib.create_train_state(cfg)
    chunk0 = loop_lib.make_train_chunk(cfg)
    timings["unmeshed"] = time_chunk(chunk0, state0)
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n_data=n)
        state = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        chunk = loop_lib.make_train_chunk(cfg, mesh=mesh)
        timings[f"mesh_{n}"] = time_chunk(chunk, state)
    out["chunk_seconds_cpu"] = {k: round(v, 4) for k, v in timings.items()}
    out["dp_relative_overhead"] = {
        k: round(v / timings["unmeshed"], 3) for k, v in timings.items()
    }

    # ---- 2. collective inventory of the 8-way SPMD chunk ----------------
    mesh = make_mesh(n_data=8)
    state = distribute_train_state(loop_lib.create_train_state(cfg), mesh, cfg)
    chunk = loop_lib.make_train_chunk(cfg, mesh=mesh)
    txt = chunk.lower(state).compile().as_text()
    inv = collective_inventory(txt)
    out["collectives_per_chunk"] = inv

    # per-update gradient psum volume (params are ~33k f32 for conv)
    n_params = sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree_util.tree_leaves(state0.params)
    )
    out["gradient_psum_bytes_per_update"] = n_params * 4
    out["params"] = n_params

    with open("benchmarks/scaling_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
