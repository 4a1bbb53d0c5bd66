#!/usr/bin/env python
"""Round-5: exercise the mesh+Pallas training path on real TPU hardware.

VERDICT r04 missing #2: the ``jax.shard_map(pallas_env_step)`` branch
(t48/train/loop.py) — the program a real v5e-8 job would compile — was
dead code: CPU tests resolve to the XLA backend, and every committed TPU
run used ``mesh=None``. This script closes that with a committed run:

1. asserts the exact-batch flagship config (env_batch=2560) resolves to
   the Pallas kernel both unmeshed and under a 'data' mesh (the r04
   %1024 block constraint demoted it to XLA; the kernel now pads);
2. runs chunk-digest equivalence: the same config trained for several
   chunks under a 1-device 'data' mesh (compiling the full shard_map
   branch, including the axis-index seed mix — identity on shard 0)
   must bit-match the unmeshed program's integer state;
3. runs a REAL short training job through ``trainer.train`` with
   ``data_parallel=1`` — checkpoint, metrics, episode JSONL all produced
   by the meshed program — and records its sustained throughput.

Writes benchmarks/mesh_pallas_r05.json and experiments/<job>.

Run: PYTHONPATH=/root/.axon_site:. python scripts/mesh_pallas_r05.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np


def digest_equivalence(chunks: int = 3) -> dict:
    from t48.configs import get_preset
    from t48.distrib import make_mesh
    from t48.train import loop as loop_lib

    cfg = get_preset(
        "sss_published",
        env_batch=2560,
        max_updates_per_iteration=25,
        no_episodes_before_training=0,
        use_astar_seed=False,
        chunk_iters=128,
        compute_dtype="float32",  # exact integer-trajectory comparison
        seed=5,
    )
    mesh = make_mesh(n_data=1)
    backend_unmeshed = loop_lib.resolve_env_backend(cfg)
    backend_meshed = loop_lib.resolve_env_backend(cfg, mesh)
    assert backend_unmeshed == backend_meshed == "pallas", (
        backend_unmeshed, backend_meshed,
    )

    s0 = loop_lib.create_train_state(cfg)
    sm = loop_lib.create_train_state(cfg, mesh=mesh)
    chunk0 = loop_lib.make_train_chunk(cfg)
    chunkm = loop_lib.make_train_chunk(cfg, mesh=mesh)
    for _ in range(chunks):
        s0, _ = chunk0(s0)
        sm, _ = chunkm(sm)
    jax.block_until_ready((s0.params, sm.params))

    def digest(s):
        return {
            "episodes": int(s.episodes_done),
            "env_steps": int(s.env_steps),
            "updates": int(s.train_steps),
            "boards_sum": int(np.asarray(jax.device_get(s.env.boards))
                              .astype(np.int64).sum()),
            "merge_sum": int(np.asarray(jax.device_get(s.env.merge_scores))
                             .astype(np.int64).sum()),
            "replay_fill": int(s.replay.fill),
        }

    d0, dm = digest(s0), digest(sm)
    boards_equal = bool(np.array_equal(
        np.asarray(jax.device_get(s0.env.boards)),
        np.asarray(jax.device_get(sm.env.boards)),
    ))
    assert d0 == dm, (d0, dm)
    assert boards_equal
    return {
        "backend": backend_meshed,
        "chunks": chunks,
        "digest": d0,
        "boards_bit_equal": boards_equal,
        "ok": True,
    }


def real_dp_run(name: str, episodes: int) -> dict:
    from t48.configs import get_preset
    from t48.train import loop as loop_lib
    from t48.train.trainer import train

    cfg = get_preset(
        "sss_published",
        env_batch=2560,
        max_updates_per_iteration=25,
        seed=0,
        no_episodes=episodes,
    )
    state, exp = train(
        cfg, root_dir="experiments", job_name=name, verbose=True,
        data_parallel=1,
    )
    job = os.path.join("experiments", name)
    with open(os.path.join(job, "text", "hyperparams.json")) as f:
        hp = json.load(f)
    from t48.distrib import make_mesh

    return {
        "job": name,
        "episodes": hp["counter_totals"]["episodes"],
        "env_steps": hp["counter_totals"]["env_steps"],
        "train_steps": hp["counter_totals"]["train_steps"],
        "backend": loop_lib.resolve_env_backend(cfg, make_mesh(n_data=1)),
        "throughput": hp.get("throughput"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=12000)
    ap.add_argument("--name", default="sss_dp1_pallas_r05")
    ap.add_argument("--out", default="benchmarks/mesh_pallas_r05.json")
    args = ap.parse_args()
    out = {"device": str(jax.devices()[0])}
    out["digest_equivalence"] = digest_equivalence()
    print(json.dumps(out["digest_equivalence"], indent=2), flush=True)
    out["dp1_training_run"] = real_dp_run(args.name, args.episodes)
    print(json.dumps(out["dp1_training_run"], indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
