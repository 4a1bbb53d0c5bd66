#!/usr/bin/env python
"""Round-5: uniform per-seed evidence for the staged flagship bands.

VERDICT r04 weak #4: seeds 3-4 of the b4096 staged band and seeds 1,3,4
of the exact-batch b2560 band existed only as summary rows in
`flagship_runs_r04.json` — their analysis was not reconstructible from
committed files. This script re-runs a missing seed on the r05 code and
commits COMPACT evidence: `analysis.json` (+png), `eval_summary` (1000
greedy games), gzipped episode JSONL (readable by `t48 analyze`), the
checkpoint, and the text/ provenance — dropping the bulky board
histories and pickle duplicates.

Note: re-runs execute on the r05 code, whose 'auto' env backend now
resolves the Pallas kernel for the b640 warmup and both wide batches
(different PRNG streams than the r04 originals — new seeds from the
same distribution, labeled `code_rev: r05` in the summary).

Run: PYTHONPATH=/root/.axon_site:. python scripts/rerun_seeds_r05.py \
        --wide-batch 2560 --wide-updates 25 --seed 1
Appends to benchmarks/flagship_seeds_r05.json.
"""

import argparse
import gzip
import json
import os
import shutil
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

from run_flagship_r04 import run_staged  # noqa: E402
from flagship_r05 import evaluate_job  # noqa: E402


def prune_to_evidence(job_dir: str) -> None:
    """Keep the compact reproducible evidence; drop bulk duplicates."""
    b = os.path.join(job_dir, "binary")
    shutil.rmtree(os.path.join(b, "board_histories"), ignore_errors=True)
    for f in ("episodes.p", "games_played.p"):
        p = os.path.join(b, f)
        if os.path.isfile(p):
            os.remove(p)
    jsonl = os.path.join(b, "episodes.jsonl")
    if os.path.isfile(jsonl):
        with open(jsonl, "rb") as fin, gzip.open(jsonl + ".gz", "wb") as fout:
            shutil.copyfileobj(fin, fout)
        os.remove(jsonl)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--wide-batch", type=int, default=2560)
    ap.add_argument("--wide-updates", type=int, default=25)
    ap.add_argument("--episodes", type=int, default=150000)
    ap.add_argument("--name", default=None)
    ap.add_argument("--out", default="benchmarks/flagship_seeds_r05.json")
    args = ap.parse_args()
    family = "b2560" if args.wide_batch == 2560 else "r04"
    name = args.name or f"sss_staged_{family}_s{args.seed}"
    summary = run_staged(
        name, seed=args.seed, total_episodes=args.episodes,
        wide_batch=args.wide_batch, wide_updates=args.wide_updates,
    )
    summary["code_rev"] = "r05"
    job_dir = os.path.join("experiments", name)
    summary["eval_summary"] = evaluate_job(job_dir, games=1000)
    prune_to_evidence(job_dir)
    existing = []
    if os.path.isfile(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    with open(args.out, "w") as f:
        json.dump(existing + [summary], f, indent=2)
    print(json.dumps(summary["eval_summary"], indent=2), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
