"""Round-4 flagship: ONE run that is simultaneously reference-curve-
faithful AND fast (VERDICT r03 tasks 1 + 5).

Staged schedule over a single job/curve:

- phase 1 (warmup): env_batch=640, max_updates=5 — the r03 flagship
  config whose five seeds bracket the reference's 17,758-episode
  max-tile distribution. Runs the first ~3000 episodes so the early
  curve (the part a large batch plays with an untrained policy — the
  'startup wave') is produced at reference-like batch instead.
- widen: replay-preserving TrainState surgery to env_batch=4096
  (t48/train/widen.py), same checkpoint, same experiment folder.
- phase 2: max_updates=40 with the while-mode learner — measured 1.39M
  env-steps/s in-chunk at exactly 1.0 updates/episode
  (scripts/learner_profile_r04.py) — to 30,000 episodes.

Success = phase-2 sustained ≥1M env-steps/s AND the 17,758-episode
max-tile distribution lands in the r03 five-seed band (≥128 share
66.6–74.2%, reference 72.2%) AND phase-2 cadence ≈ 1 update/episode.

Usage: python scripts/run_flagship_r04.py [--seed N] [--name JOB]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from t48.analysis.report import format_reference_comparison, render_report
from t48.configs import get_preset
from t48.train.trainer import train
from t48.train.widen import widen_job_checkpoint


def run_staged(
    name: str,
    seed: int = 0,
    warmup_episodes: int = 3000,
    total_episodes: int = 30000,
    warm_batch: int = 640,
    warm_updates: int = 5,
    wide_batch: int = 4096,
    wide_updates: int = 40,
    root: str = "experiments",
) -> dict:
    cfg_a = get_preset(
        "sss_published",
        env_batch=warm_batch,
        max_updates_per_iteration=warm_updates,
        no_episodes=total_episodes,
        seed=seed,
    )
    cfg_b = cfg_a.replace(
        env_batch=wide_batch, max_updates_per_iteration=wide_updates
    )
    job_dir = os.path.join(root, name)

    t0 = time.time()
    state_a, exp_a = train(
        cfg_a, root_dir=root, job_name=name, max_episodes=warmup_episodes,
        verbose=True,
    )
    wall_warm = time.time() - t0
    warm = _totals(job_dir)
    warm_episodes = warm["episodes"]
    warm_steps = warm["env_steps"]
    warm_updates_done = warm.get("train_steps", int(state_a.train_steps))

    widen_job_checkpoint(job_dir, cfg_a, cfg_b)

    t1 = time.time()
    state_b, exp_b = train(
        cfg_b, root_dir=root, job_name=name, resume=True, verbose=True
    )
    wall_wide = time.time() - t1

    totals = _totals(job_dir)
    with open(os.path.join(job_dir, "text/hyperparams.json")) as f:
        hp = json.load(f)
    report = render_report(exp_b.folder)
    phase2_updates = totals.get(
        "train_steps", int(state_b.train_steps)
    ) - warm_updates_done
    phase2_episodes = totals["episodes"] - warm_episodes
    summary = {
        "job": name,
        "seed": seed,
        "staged": {
            "warmup": {
                "env_batch": warm_batch,
                "max_updates": warm_updates,
                "episodes": warm_episodes,
                "env_steps": warm_steps,
                "wall_s": round(wall_warm, 1),
            },
            "wide": {
                "env_batch": wide_batch,
                "max_updates": wide_updates,
                "episodes": phase2_episodes,
                "env_steps": totals["env_steps"] - warm_steps,
                "wall_s": round(wall_wide, 1),
            },
        },
        "episodes": totals["episodes"],
        "env_steps": totals["env_steps"],
        "train_steps": totals.get("train_steps", int(state_b.train_steps)),
        "phase2_updates_per_episode": round(
            phase2_updates / max(phase2_episodes, 1), 3
        ),
        "best_max_tile": report["learning_curve"]["best_max_tile"],
        "frac_ge_128_at_ref_checkpoint": report["vs_reference"][
            "ours_frac_ge_128"
        ],
        # the resumed run's own meter = phase-2 sustained throughput
        # (compile excluded by the meter's first-chunk baseline reset)
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
    ap.add_argument("--name", default=None)
    ap.add_argument("--warmup", type=int, default=3000)
    ap.add_argument("--episodes", type=int, default=30000)
    ap.add_argument("--wide-batch", type=int, default=4096)
    ap.add_argument("--wide-updates", type=int, default=40)
    ap.add_argument("--out", default="benchmarks/flagship_runs_r04.json")
    args = ap.parse_args()
    name = args.name or f"sss_staged_r04_s{args.seed}"
    summary = run_staged(
        name, seed=args.seed, warmup_episodes=args.warmup,
        total_episodes=args.episodes, wide_batch=args.wide_batch,
        wide_updates=args.wide_updates,
    )
    existing = []
    if os.path.isfile(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    with open(args.out, "w") as f:
        json.dump(existing + [summary], f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
