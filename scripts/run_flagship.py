"""Flagship training runs: the BASELINE.json end-to-end claim.

Runs the published-hyperparameter SSS config (t48/configs/presets.py
``sss_published`` — γ=0.95, lr=1e-4, replay 15k, batch 5000, the values
of the reference's committed `SSS_replay` curve) at a LARGE env batch,
with the deficit-driven learner cadence recovering the reference's
one-update-per-episode, and writes the full artifact tree + analysis +
vs-reference comparison. Also sweeps reduced update cadences to chart
the fidelity/throughput tradeoff (see benchmarks/cadence_roofline.md for
why 1 update/episode at batch 5000 caps single-chip env throughput).

Usage: python - < scripts/run_flagship.py   (or python scripts/run_flagship.py
from the repo root), optionally T48_FLAGSHIP_JOBS=jobspec[,jobspec...]
with jobspec = name:env_batch:max_updates[:episodes[:seed]].
"""

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

DEFAULT_JOBS = [
    # one-update-per-episode fidelity config (28 ≈ 4096/144)
    "sss_b4096_u28:4096:28:30000:0",
    # reduced cadences: fidelity/throughput tradeoff
    "sss_b4096_u8:4096:8:30000:0",
    "sss_b4096_u2:4096:2:30000:0",
]


def run_job(spec: str, root: str = "experiments") -> dict:
    parts = spec.split(":")
    name, env_batch, max_updates = parts[0], int(parts[1]), int(parts[2])
    episodes = int(parts[3]) if len(parts) > 3 else 30000
    seed = int(parts[4]) if len(parts) > 4 else 0
    cfg = get_preset(
        "sss_published",
        env_batch=env_batch,
        max_updates_per_iteration=max_updates,
        no_episodes=episodes,
        seed=seed,
    )
    t0 = time.time()
    state, exp = train(cfg, root_dir=root, job_name=name, verbose=True)
    wall = time.time() - t0
    report = render_report(exp.folder)
    summary = {
        "job": name,
        "env_batch": env_batch,
        "max_updates_per_iteration": max_updates,
        "episodes": int(state.episodes_done),
        "train_steps": int(state.train_steps),
        "updates_per_episode": round(
            int(state.train_steps) / max(int(state.episodes_done), 1), 3
        ),
        "env_steps": int(state.env_steps),
        "wall_s": round(wall, 1),
        "best_max_tile": report["learning_curve"]["best_max_tile"],
        "frac_ge_128_at_ref_checkpoint": report["vs_reference"][
            "ours_frac_ge_128"
        ],
    }
    # throughput from the experiment's own meter (excludes seeding/compile)
    hp_path = os.path.join(exp.folder, "text/hyperparams.json")
    with open(hp_path) as f:
        hp = json.load(f)
    if "throughput" in hp:
        summary["throughput"] = hp["throughput"]
    print(json.dumps(summary, indent=2), flush=True)
    print(format_reference_comparison(report["vs_reference"]), flush=True)
    return summary


def main():
    jobs = os.environ.get("T48_FLAGSHIP_JOBS")
    specs = jobs.split(",") if jobs else DEFAULT_JOBS
    results = [run_job(s) for s in specs]
    out = os.path.join("benchmarks", "flagship_runs_r03.json")
    os.makedirs("benchmarks", exist_ok=True)
    existing = []
    if os.path.isfile(out):
        with open(out) as f:
            existing = json.load(f)
    with open(out, "w") as f:
        json.dump(existing + results, f, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
