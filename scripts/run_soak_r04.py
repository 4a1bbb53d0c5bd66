#!/usr/bin/env python
"""Round-4 soak: >=30 minutes of continuous full-cadence training at
sustained throughput (VERDICT r04 task 7).

Exercises everything the short runs can't: the int32 env-step counter
crossing 2^31 in production (the r03 overflow bug's trigger), autosave
under load, episode drains at ~10k episodes/s for half an hour, and
throughput stability (no degradation). Periodic meter samples are
recorded via the trainer's on_chunk hook and written to
benchmarks/sustained_r04.json together with pass/fail checks.

The job runs with episode_retention='stream' (O(1) memory; the JSONL
still records every episode — ~2GB under the scratch root, not
committed).

Usage: python scripts/run_soak_r04.py [--seconds 1860] [--root /tmp/soak]
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

from t48.configs import get_preset
from t48.train.trainer import train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=1860)
    ap.add_argument("--sample-every", type=float, default=10.0)
    ap.add_argument("--root", default="/tmp/soak_r04")
    ap.add_argument("--out", default="benchmarks/sustained_r04.json")
    args = ap.parse_args()

    cfg = get_preset(
        "sss_published",
        env_batch=4096,
        max_updates_per_iteration=40,
        use_astar_seed=False,
        episode_retention="stream",
        no_episodes=2_000_000_000,  # wall-clock bounded below
        snapshot_game_every_n_episodes=1_000_000,
        seed=7,
    )

    samples = []
    state = {"last_sample": 0.0, "t_start": None}

    def on_chunk(counters, meter):
        now = time.monotonic()
        if state["t_start"] is None:
            state["t_start"] = now  # clock starts at the first chunk
        t_start = state["t_start"]
        if now - state["last_sample"] >= args.sample_every:
            state["last_sample"] = now
            samples.append({
                "t_s": round(now - t_start, 1),
                "env_steps": counters.env_steps,
                "episodes": counters.episodes,
                "env_steps_per_s": meter.summary()["env_steps_per_s"],
                "episodes_per_s": meter.summary()["episodes_per_s"],
            })
        if now - t_start >= args.seconds:
            # trainer's KeyboardInterrupt path: clean save + return
            raise KeyboardInterrupt(f"soak complete after {args.seconds}s")
        del counters

    t0 = time.time()
    final_state, exp = train(
        cfg, root_dir=args.root, job_name="soak_r04", verbose=False,
        on_chunk=on_chunk,
    )
    wall = time.time() - t0

    with open(os.path.join(exp.folder, "text/hyperparams.json")) as f:
        hp = json.load(f)
    totals = hp["counter_totals"]

    rates = [s["env_steps_per_s"] for s in samples if s["t_s"] > 60]
    q = max(1, len(rates) // 4)
    first_q, last_q = rates[:q], rates[-q:]
    mean = lambda xs: sum(xs) / max(len(xs), 1)  # noqa: E731
    checks = {
        "ran_seconds": round(wall, 1),
        "crossed_2pow31_env_steps": totals["env_steps"] > 2**31,
        "device_counter_wrapped_consistently": (
            totals["env_steps"] % 2**32 == int(final_state.env_steps) % 2**32
        ),
        "updates_per_episode": round(
            totals.get("train_steps", int(final_state.train_steps))
            / max(totals["episodes"], 1), 4
        ),
        "rate_last_quartile_over_first": round(
            mean(last_q) / max(mean(first_q), 1e-9), 3
        ),
        "no_degradation": mean(last_q) >= 0.7 * mean(first_q),
        "episode_numbers_absolute_and_monotonic": None,  # filled below
    }

    # spot-check the (2GB) JSONL tail: numbers absolute + monotonic
    jsonl = os.path.join(exp.folder, "binary/episodes.jsonl")
    with open(jsonl, "rb") as f:
        f.seek(max(0, os.path.getsize(jsonl) - (1 << 16)), 0)
        tail = f.read().decode(errors="ignore").strip().split("\n")[1:]
    nums = [json.loads(ln)["number"] for ln in tail if ln.startswith("{")]
    checks["episode_numbers_absolute_and_monotonic"] = (
        nums == sorted(nums) and nums[-1] >= totals["episodes"] - 4096 * 4
    )

    out = {
        "config": "sss_published, env_batch=4096, max_updates=40 "
                  "(full cadence, while-mode learner), retention=stream",
        "totals": totals,
        "train_steps": totals.get("train_steps", int(final_state.train_steps)),
        "throughput_final": hp.get("throughput"),
        "checks": checks,
        "samples": samples,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "samples"},
                     indent=1))
    print(f"samples: {len(samples)}; wrote {args.out}")


if __name__ == "__main__":
    main()
