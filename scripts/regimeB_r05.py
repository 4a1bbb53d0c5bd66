#!/usr/bin/env python
"""Round-5: measure regime B's LEARNING FIDELITY (VERDICT r04 missing #1).

`benchmarks/scaling_r04.md` gets v5e-8 past the ≥10M env-steps/s BASELINE
target only via regime B: per-chip env batch held at 4096 (global 32,768)
with the learner-batch cap off, so each update's gradient is the sum-loss
over an effective 32,768-row batch — 8 chips × 4096 shard rows psum'd.
That regime's learning fidelity had never been run: no committed
experiment trains with a ~32k effective batch, so the ≥10M projection
rested on analogy.

One chip can run regime B's EXACT learning problem: with MSE-sum loss the
8-way gradient psum over 4096-row shard batches equals the single-chip
gradient over the same 32,768 rows, and the sharded replay's per-env
rings are identical at either geometry (capacity ceil(15000/32768)=1
slot/env either way). Env dynamics, policy, cadence (1 update/episode)
and the staged warmup are the committed flagships' (b640/u5 to 3000
episodes, then widen — the 32k fresh envs start under the already-trained
policy, exactly as a real regime-B job would).

lr handling: Adam is scale-invariant in the gradient, so the 8× sum-loss
magnitude cancels; what changes is gradient SNR. We run the published
lr=1e-4 unchanged as the primary configuration and record an
sqrt(8)-scaled variant for comparison (both documented divergences of
the same kind as the batch itself).

Success metric (BASELINE.md / experiment_analysis.ipynb cell-5): the
17,758-episode ≥128 max-tile share vs the five-seed committed band
[66.6, 74.2] (reference 72.22).

Run: PYTHONPATH=/root/.axon_site:. python scripts/regimeB_r05.py --seed 0
Appends to benchmarks/regimeB_r05.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from t48.analysis.report import format_reference_comparison, render_report
from t48.configs import get_preset
from t48.train.trainer import train
from t48.train.widen import widen_job_checkpoint


def run_regime_b(
    name: str,
    seed: int,
    lr_scale: float = 1.0,
    warmup_episodes: int = 3000,
    total_episodes: int = 30000,
    wide_batch: int = 32768,
    wide_updates: int = 320,
    batch_size: int = None,
    cap: bool = False,
    chunk_iters: int = 256,
    root: str = "experiments",
) -> dict:
    """Three decompositions of regime B (pass via the CLI modes):

    - literal:  wide_batch=32768, cap off → the exact v5e-8 regime-B
      program (32k envs AND 32k-row learner batches).
    - lbatch:   wide_batch=2560 (the committed flagships' env geometry)
      with batch_size=32768 capped → ONLY the learner batch changes to
      32,768 rows (13 draws/env, masked to exactly 32,768), isolating
      gradient-scale fidelity from the env-batch episode-indexing wave.
    - latewiden: widen AFTER the 17,758-episode checkpoint → the
      checkpoint window is pure b640 (in band by construction) and the
      run measures regime B's steady-state learning + cadence, the
      operationally honest staging for a v5e-8 regime-B job.
    """
    cfg_a = get_preset(
        "sss_published",
        env_batch=640,
        max_updates_per_iteration=5,
        no_episodes=total_episodes,
        chunk_iters=chunk_iters,
        seed=seed,
    )
    cfg_b = cfg_a.replace(
        env_batch=wide_batch,
        max_updates_per_iteration=wide_updates,
        learner_batch_cap=cap,
        learning_rate=cfg_a.learning_rate * lr_scale,
        **({"batch_size": batch_size} if batch_size else {}),
    )
    job_dir = os.path.join(root, name)

    t0 = time.time()
    train(cfg_a, root_dir=root, job_name=name,
          max_episodes=warmup_episodes, verbose=True)
    wall_warm = time.time() - t0
    warm = _totals(job_dir)

    widen_job_checkpoint(job_dir, cfg_a, cfg_b)

    t1 = time.time()
    state_b, exp_b = train(
        cfg_b, root_dir=root, job_name=name, resume=True, verbose=True
    )
    wall_wide = time.time() - t1

    totals = _totals(job_dir)
    report = render_report(exp_b.folder)
    phase2_updates = totals["train_steps"] - warm["train_steps"]
    phase2_episodes = totals["episodes"] - warm["episodes"]
    with open(os.path.join(job_dir, "text/hyperparams.json")) as f:
        hp = json.load(f)
    from t48.replay.buffer import sample_rows

    s = sample_rows(cfg_b.batch_size, wide_batch)
    eff_batch = (
        min(s * wide_batch, cfg_b.batch_size) if cap else s * wide_batch
    )
    windows = {}
    ep_path = os.path.join(job_dir, "binary/episodes.jsonl")
    if os.path.isfile(ep_path):
        rows = [json.loads(l) for l in open(ep_path)]
        for lo, hi in [(0, 17758), (17758, 40000), (40000, 150000)]:
            sel = [r for r in rows if lo <= r["number"] < hi]
            if sel:
                windows[f"{lo}-{hi}"] = {
                    "n": len(sel),
                    "frac_ge_128": round(
                        sum(1 for r in sel if r["max_tile"] >= 128)
                        / len(sel), 4,
                    ),
                }
    summary = {
        "job": name,
        "seed": seed,
        "regime": f"B (env_batch={wide_batch}, learner batch = "
                  f"{eff_batch} rows, cap={'on' if cap else 'off'})",
        "effective_learner_batch": eff_batch,
        "warmup_episodes_target": warmup_episodes,
        "lr": cfg_b.learning_rate,
        "lr_scale": lr_scale,
        "frac_ge_128_by_window": windows,
        "warmup": {"episodes": warm["episodes"], "wall_s": round(wall_warm, 1)},
        "wide": {
            "env_batch": wide_batch,
            "episodes": phase2_episodes,
            "env_steps": totals["env_steps"] - warm["env_steps"],
            "wall_s": round(wall_wide, 1),
        },
        "episodes": totals["episodes"],
        "env_steps": totals["env_steps"],
        "train_steps": totals["train_steps"],
        "phase2_updates_per_episode": round(
            phase2_updates / max(phase2_episodes, 1), 3
        ),
        "best_max_tile": report["learning_curve"]["best_max_tile"],
        "frac_ge_128_at_ref_checkpoint": report["vs_reference"][
            "ours_frac_ge_128"
        ],
        "phase2_throughput": hp.get("throughput"),
    }
    print(json.dumps(summary, indent=2), flush=True)
    print(format_reference_comparison(report["vs_reference"]), flush=True)
    return summary


def _totals(job_dir: str) -> dict:
    with open(os.path.join(job_dir, "text/hyperparams.json")) as f:
        return json.load(f)["counter_totals"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr-scale", type=float, default=1.0)
    ap.add_argument("--mode", default="literal",
                    choices=["literal", "lbatch", "latewiden"])
    ap.add_argument("--name", default=None)
    ap.add_argument("--episodes", type=int, default=30000)
    ap.add_argument("--out", default="benchmarks/regimeB_r05.json")
    args = ap.parse_args()
    tag = "" if args.lr_scale == 1.0 else f"_lr{args.lr_scale:g}"
    name = args.name or f"sss_regimeB_{args.mode}_s{args.seed}{tag}"
    kw = dict(seed=args.seed, lr_scale=args.lr_scale,
              total_episodes=args.episodes)
    if args.mode == "literal":
        kw.update(wide_batch=32768, wide_updates=320, cap=False)
    elif args.mode == "lbatch":
        # committed-flagship env geometry, 32,768-row learner batch only
        kw.update(wide_batch=2560, wide_updates=25, batch_size=32768,
                  cap=True)
    else:  # latewiden: checkpoint window is pure b640 by construction
        kw.update(wide_batch=32768, wide_updates=320, cap=False,
                  warmup_episodes=20000, chunk_iters=64)
    summary = run_regime_b(name, **kw)
    existing = []
    if os.path.isfile(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    with open(args.out, "w") as f:
        json.dump(existing + [summary], f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
