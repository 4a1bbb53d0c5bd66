#!/usr/bin/env python
"""Round-5: chase a 2048 tile — a capability demo beyond reference parity.

VERDICT r04 task 5: the reference's all-time best tile is 1024
(/root/reference/README.md:5); every committed t48 flagship matches it,
none exceeds it. This script trains TUNED agents (documented divergences
from the reference configuration: big-batch learner, lr schedule, larger
replay, optional wider nets / γ) and evaluates with enough games to
populate the max-tile histogram tail.

Evidence from this round informs the tuning: the 32,768-row learner
batch produces distinctly stronger policies per episode
(benchmarks/regimeB_r05.json: 2231 eval mean merge in ~30k episodes vs
the 2150 of a 150k-episode literal-batch run), so the hunt trains at
full cadence with the 32k batch.

Run: PYTHONPATH=/root/.axon_site:. python scripts/hunt2048_r05.py \
        --arch conv --gamma 0.95 --episodes 60000 --eval-games 5000
Appends to benchmarks/hunt2048_r05.json.
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

from flagship_r05 import evaluate_job  # noqa: E402
from t48.configs import get_preset  # noqa: E402
from t48.train.trainer import train  # noqa: E402
from t48.train.widen import widen_job_checkpoint  # noqa: E402


def run_hunt(
    name: str,
    seed: int = 0,
    arch: str = "conv",
    gamma: float = 0.95,
    episodes: int = 60000,
    replay: int = 100000,
    batch: int = 32768,
    env_batch: int = 2560,
    max_updates: int = 25,
    lr: float = 1e-4,
    decay_start: int = 20000,
    eval_games: int = 5000,
    root: str = "experiments",
) -> dict:
    common = dict(
        arch=arch,
        discount_factor=gamma,
        replay_buffer_length=replay,
        batch_size=batch,
        learning_rate=lr,
        no_episodes=episodes,
        seed=seed,
        lr_schedule="cosine",
        lr_decay_start=decay_start,
        lr_decay_steps=max(episodes - decay_start, 1),
        lr_final_scale=0.05,
    )
    cfg_a = get_preset(
        "sss_published", env_batch=640, max_updates_per_iteration=5,
        **common,
    )
    cfg_b = cfg_a.replace(
        env_batch=env_batch, max_updates_per_iteration=max_updates
    )
    job_dir = os.path.join(root, name)
    t0 = time.time()
    train(cfg_a, root_dir=root, job_name=name, max_episodes=3000,
          verbose=True)
    widen_job_checkpoint(job_dir, cfg_a, cfg_b)
    state, exp = train(cfg_b, root_dir=root, job_name=name, resume=True,
                       verbose=True)
    wall = time.time() - t0
    stats = evaluate_job(job_dir, games=eval_games)
    with open(os.path.join(job_dir, "text/hyperparams.json")) as f:
        hp = json.load(f)
    summary = {
        "job": name,
        "seed": seed,
        "arch": arch,
        "gamma": gamma,
        "episodes": hp["counter_totals"]["episodes"],
        "train_steps": hp["counter_totals"]["train_steps"],
        "learner_batch": batch,
        "replay": replay,
        "wall_s": round(wall, 1),
        "eval_games": eval_games,
        "eval": stats,
    }
    print(json.dumps(summary, indent=2), flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", default="conv",
                    choices=["conv", "conv_wide", "dense", "dense_wide"])
    ap.add_argument("--gamma", type=float, default=0.95)
    ap.add_argument("--episodes", type=int, default=60000)
    ap.add_argument("--replay", type=int, default=100000)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--decay-start", type=int, default=20000)
    ap.add_argument("--eval-games", type=int, default=5000)
    ap.add_argument("--name", default=None)
    ap.add_argument("--out", default="benchmarks/hunt2048_r05.json")
    args = ap.parse_args()
    name = args.name or (
        f"hunt_{args.arch}_g{args.gamma:g}_s{args.seed}"
    )
    summary = run_hunt(
        name, seed=args.seed, arch=args.arch, gamma=args.gamma,
        episodes=args.episodes, replay=args.replay, batch=args.batch,
        lr=args.lr, decay_start=args.decay_start,
        eval_games=args.eval_games,
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
