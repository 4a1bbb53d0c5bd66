#!/usr/bin/env python
"""Round-5 flagship: ONE run that is fastest, faithful AND best-evaluating
(VERDICT r04 task 4 / weak #2).

The r04 exact-batch staged flagships held throughput + checkpoint parity
but evaluated at 1945-2044 mean merge over 1000 greedy games — below the
r03 pure-b640 flagship's 2216 — because constant lr=1e-4 plateaus the
policy long before 150k episodes. This run extends the exact-batch
staged schedule with a cosine lr decay that begins only AFTER the
17,758-episode reference checkpoint (a documented divergence that leaves
the curve-fidelity window untouched):

- phase 1 (warmup): env_batch=640, max_updates=5 to 3,000 episodes;
- widen to env_batch=2560, max_updates=25 — the literal 5000-row learner
  batch (2 draws/env, capped to exactly 5000);
- lr: constant 1e-4 for the first 20,000 updates (~20,000 episodes at
  the 1.003 updates/episode cadence), then cosine → 5e-6 by 150,000;
- 150,000 episodes total, then a 1000-game greedy evaluation
  (player.py:101-106 protocol) and the vs-reference analysis bundle.

Success = 17,758-episode ≥128 share inside the five-seed band
[66.6, 74.2] AND sustained ≥1M env-steps/s AND eval mean merge > 2216.

Run: PYTHONPATH=/root/.axon_site:. python scripts/flagship_r05.py --seed 0
Appends to benchmarks/flagship_runs_r05.json.
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


def evaluate_job(job_dir: str, games: int = 1000, seed: int = 123,
                 lookahead: bool = False) -> dict:
    """1000-game greedy evaluation of a job's checkpoint (the reference's
    player protocol, player.py:101-106); writes eval_summary into the
    job's hyperparams."""
    import jax.numpy as jnp

    from t48.agent.networks import build_network, dtype_of
    from t48.baselines.players import Player
    from t48.configs import T48Config
    from t48.exp.checkpoint import restore_subtree
    from t48.exp.experiment import Experiment
    from t48.train.loop import encoder_for

    root, name = os.path.split(job_dir.rstrip("/"))
    experiment = Experiment(root_dir=root, folder_name=name, resumed=True)
    with open(os.path.join(job_dir, "text/config.json")) as f:
        config = T48Config.from_json(f.read())
    dtype = dtype_of(config.compute_dtype)
    net = build_network(config.arch, dtype)
    encode = encoder_for(config.arch, config.board_k)
    cells = config.board_k * config.board_k
    template = net.init(
        jax.random.PRNGKey(0), encode(jnp.zeros((1, cells), jnp.int8))
    )
    params = restore_subtree(
        experiment.checkpoint_path, template, ".params"
    )
    player = Player(
        experiment=experiment, apply_fn=net.apply, params=params,
        encode=encode, lookahead=lookahead, gamma=config.discount_factor,
    )
    stats = player.play_n_games(
        games, seed=seed, record_history=False,
        device_batch=1000 if lookahead else 0,
    )
    experiment.close()
    return stats


def run_flagship(
    name: str,
    seed: int = 0,
    warmup_episodes: int = 3000,
    total_episodes: int = 150000,
    wide_batch: int = 2560,
    wide_updates: int = 25,
    lr_schedule: str = "cosine",
    lr_decay_start: int = 20000,
    lr_decay_steps: int = 130000,
    lr_final_scale: float = 0.05,
    polish_start: int = 0,
    polish_batch: int = 32768,
    polish_updates: int = 3,
    eval_games: int = 1000,
    root: str = "experiments",
) -> dict:
    """``polish_start > 0`` adds a third phase from that episode count: a
    big-batch reduced-cadence polish (batch_size=polish_batch rows per
    update, max_updates=polish_updates → ~0.17 updates/episode at u3) —
    ~the same learner rows per episode as the literal 5000-row full
    cadence, delivered as fewer, larger (higher-SNR) updates, which the
    regime-B fidelity runs showed produce stronger late-stage policies
    (benchmarks/regimeB_r05.json: 2231 eval mean merge in 30k episodes).
    Runs at ≥1M env-steps/s because the per-iteration update count drops
    with the cadence. Same env_batch, so no widening — just a resumed
    phase under the changed learner config (documented divergence; the
    pre-checkpoint window is untouched)."""
    sched = dict(
        lr_schedule=lr_schedule,
        lr_decay_start=lr_decay_start,
        lr_decay_steps=lr_decay_steps,
        lr_final_scale=lr_final_scale,
    )
    cfg_a = get_preset(
        "sss_published",
        env_batch=640,
        max_updates_per_iteration=5,
        no_episodes=total_episodes,
        seed=seed,
        **sched,
    )
    cfg_b = cfg_a.replace(
        env_batch=wide_batch, max_updates_per_iteration=wide_updates
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
        cfg_b, root_dir=root, job_name=name, resume=True, verbose=True,
        max_episodes=polish_start if polish_start else None,
    )
    wall_wide = time.time() - t1

    polish = None
    if polish_start:
        cfg_c = cfg_b.replace(
            batch_size=polish_batch,
            max_updates_per_iteration=polish_updates,
        )
        mid = _totals(job_dir)
        t2 = time.time()
        state_b, exp_b = train(
            cfg_c, root_dir=root, job_name=name, resume=True, verbose=True
        )
        wall_polish = time.time() - t2
        after = _totals(job_dir)
        polish = {
            "batch_size": polish_batch,
            "max_updates": polish_updates,
            "episodes": after["episodes"] - mid["episodes"],
            "updates": after["train_steps"] - mid["train_steps"],
            "updates_per_episode": round(
                (after["train_steps"] - mid["train_steps"])
                / max(after["episodes"] - mid["episodes"], 1), 3,
            ),
            "wall_s": round(wall_polish, 1),
        }

    totals = _totals(job_dir)
    report = render_report(exp_b.folder)
    eval_stats = evaluate_job(job_dir, games=eval_games)
    with open(os.path.join(job_dir, "text/hyperparams.json")) as f:
        hp = json.load(f)
    phase2_updates = totals["train_steps"] - warm["train_steps"]
    phase2_episodes = totals["episodes"] - warm["episodes"]
    summary = {
        "job": name,
        "seed": seed,
        "schedule": {
            "warmup": {"env_batch": 640, "max_updates": 5,
                       "episodes": warm["episodes"],
                       "wall_s": round(wall_warm, 1)},
            "wide": {"env_batch": wide_batch, "max_updates": wide_updates,
                     "episodes": phase2_episodes,
                     "wall_s": round(wall_wide, 1)},
            "polish": polish,
            "lr": {k: v for k, v in sched.items()},
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
        "eval_summary": eval_stats,
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
    ap.add_argument("--episodes", type=int, default=150000)
    ap.add_argument("--lr-schedule", default="cosine",
                    choices=["constant", "cosine", "linear"])
    ap.add_argument("--lr-decay-start", type=int, default=20000)
    ap.add_argument("--lr-decay-steps", type=int, default=130000)
    ap.add_argument("--lr-final-scale", type=float, default=0.05)
    ap.add_argument("--polish-start", type=int, default=0)
    ap.add_argument("--polish-batch", type=int, default=32768)
    ap.add_argument("--polish-updates", type=int, default=3)
    ap.add_argument("--eval-games", type=int, default=1000)
    ap.add_argument("--out", default="benchmarks/flagship_runs_r05.json")
    args = ap.parse_args()
    name = args.name or f"sss_lrsched_s{args.seed}"
    summary = run_flagship(
        name, seed=args.seed, total_episodes=args.episodes,
        lr_schedule=args.lr_schedule, lr_decay_start=args.lr_decay_start,
        lr_decay_steps=args.lr_decay_steps,
        lr_final_scale=args.lr_final_scale, eval_games=args.eval_games,
        polish_start=args.polish_start, polish_batch=args.polish_batch,
        polish_updates=args.polish_updates,
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
