#!/usr/bin/env python
"""Reconcile the up-left baseline (VERDICT r04 task 6).

The committed 1000-game up-left baseline (experiments/README.md: mean
merge 1383) was produced by the PRIORITY form (`upleft_policy`: highest-
priority legal move each step). The reference's literal heuristic
alternates up, left, up, left and only falls back to down/right when the
simple score stalls (player.py:66-84, board.py:244-261). This script
runs 1000 games of each and quantifies the difference, so the committed
number can be labeled (or replaced) with the faithful method.

Literal loop: host-side over the golden board (reference-exact
dynamics + RNG calls, seeded once — matching the reference's unseeded
consecutive-game stream, made deterministic).
Priority form: the batched device evaluation the committed number used.
"""

from __future__ import annotations

import json
import random

import numpy as np


def literal_games(n: int, seed: int = 0) -> dict:
    from t48.baselines.players import basic_upleft_algorithm

    random.seed(seed)
    np.random.seed(seed)
    scores, tiles, moves = [], [], []
    for _ in range(n):
        board, history = basic_upleft_algorithm()
        scores.append(board.merge_score())
        tiles.append(int(board.state.max()))
        moves.append(len(history))
    return _summary("literal_alternating_loop(golden)", scores, tiles, moves)


def priority_games(n: int, seed: int = 0) -> dict:
    import jax

    from t48.baselines.players import play_games, upleft_policy

    results = play_games(upleft_policy, n, jax.random.PRNGKey(seed))
    merge_scores = np.asarray(jax.device_get(results.merge_score))
    tiles = np.asarray(jax.device_get(results.max_tile))
    moves = np.asarray(jax.device_get(results.number_moves))
    return _summary(
        "priority_form(device)", merge_scores.tolist(), tiles.tolist(),
        moves.tolist(),
    )


def _summary(method: str, scores, tiles, moves) -> dict:
    scores = np.asarray(scores, np.float64)
    tiles = np.asarray(tiles)
    hist = {
        int(t): int((tiles == t).sum()) for t in sorted(set(tiles.tolist()))
    }
    return {
        "method": method,
        "games": len(scores),
        "mean_merge_score": round(float(scores.mean()), 1),
        "median_merge_score": float(np.median(scores)),
        "std_merge_score": round(float(scores.std(ddof=1)), 1),
        "sem": round(float(scores.std(ddof=1) / np.sqrt(len(scores))), 1),
        "mean_moves": round(float(np.mean(moves)), 1),
        "max_tile_hist": hist,
        "_scores": scores,
    }


def main():
    n = 1000
    lit = literal_games(n)
    pri = priority_games(n)
    a, b = lit.pop("_scores"), pri.pop("_scores")
    # Welch two-sample t for the mean-merge difference
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(va + vb)
    out = {
        "literal": lit,
        "priority": pri,
        "welch_t_mean_merge": round(float(t), 2),
        "note": (
            "|t| < 2 -> the two formulations are statistically "
            "indistinguishable on mean merge score at n=1000; otherwise "
            "the literal number replaces the committed baseline"
        ),
    }
    print(json.dumps(out, indent=1))
    with open("benchmarks/upleft_literal_r04.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
