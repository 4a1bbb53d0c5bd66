"""Experiment analysis: the notebooks, as a library.

Replaces the reference's offline analysis notebooks
(/root/reference/experiments/experiment_analysis.ipynb,
strategy_analysis.ipynb, notebook_utils.py:9-25) with importable
functions over the persisted episode metrics:

- max-tile frequency histograms with percentages (the cell-5 output that
  BASELINE.md quotes for the SSS_replay run);
- learning-curve summaries (merge score / max tile / #moves / ε / mean-Q
  over episodes, with the training-start and ε-floor markers the
  notebook draws as vlines);
- an optional matplotlib render when matplotlib is importable.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import List, Optional

import numpy as np


def load_episodes(job_folder: str) -> List[dict]:
    """Load episode metric dicts from a job folder (JSONL preferred,
    pickle fallback — both are written by t48.exp.Experiment; a
    gzip-compressed ``episodes.jsonl.gz`` is also accepted so long runs
    can be committed as compact evidence, r05)."""
    jsonl = os.path.join(job_folder, "binary/episodes.jsonl")
    jsonl_gz = jsonl + ".gz"
    pick = os.path.join(job_folder, "binary/episodes.p")

    def _read(f):
        episodes = []
        for line in f:
            line = line.strip()
            if line:
                episodes.append(json.loads(line))
        return episodes

    if os.path.isfile(jsonl):
        with open(jsonl) as f:
            episodes = _read(f)
        if episodes:
            return episodes
    if os.path.isfile(jsonl_gz):
        import gzip

        with gzip.open(jsonl_gz, "rt") as f:
            episodes = _read(f)
        if episodes:
            return episodes
    with open(pick, "rb") as f:
        return pickle.load(f)


def max_tile_frequency(episodes: List[dict]) -> dict:
    """Tile → (count, percent) table (notebook_utils.py:14-16 +
    the percentage printout of experiment_analysis.ipynb cell-5)."""
    tiles = np.array([ep["max_tile"] for ep in episodes])
    values, counts = np.unique(tiles, return_counts=True)
    total = len(tiles)
    return {
        int(v): {"count": int(c), "percent": round(100.0 * c / total, 2)}
        for v, c in zip(values, counts)
    }


def learning_curve_summary(
    episodes: List[dict], window: int = 500
) -> dict:
    """Windowed means of the per-episode metrics over training."""
    if not episodes:
        return {"windows": []}
    windows = []
    for start in range(0, len(episodes), window):
        blk = episodes[start : start + window]
        windows.append(
            {
                "episodes": [blk[0]["number"], blk[-1]["number"]],
                "mean_merge_score": round(
                    float(np.mean([e["merge_score"] for e in blk])), 2
                ),
                "mean_max_tile": round(
                    float(np.mean([e["max_tile"] for e in blk])), 2
                ),
                "mean_moves": round(
                    float(np.mean([e["number_moves"] for e in blk])), 2
                ),
                "mean_q": round(float(np.mean([e["q_value"] for e in blk])), 4),
                "epsilon": round(float(blk[-1]["epsilon"]), 4),
            }
        )
    return {
        "total_episodes": len(episodes),
        "best_max_tile": int(max(e["max_tile"] for e in episodes)),
        "windows": windows,
    }


# The reference's published SSS_replay max-tile distribution at 17,758
# episodes (experiment_analysis.ipynb cell-5 output, quoted in BASELINE.md)
REFERENCE_SSS_EPISODES = 17_758
REFERENCE_SSS_MAX_TILE = {
    8: 7, 16: 84, 32: 742, 64: 4100, 128: 7344,
    256: 4799, 512: 680, 1024: 2,
}
REFERENCE_SSS_EPISODES_PER_S = 0.277  # 17,758 episodes / 17:48:41


def compare_to_reference(episodes: List[dict]) -> dict:
    """Side-by-side max-tile distribution vs the reference's published
    SSS_replay run, evaluated at the same episode checkpoint (the first
    17,758 completed episodes — or fewer, flagged, if the run is
    shorter). BASELINE.md / experiment_analysis.ipynb cell-5."""
    n = min(len(episodes), REFERENCE_SSS_EPISODES)
    ours = max_tile_frequency(episodes[:n])
    ref_total = sum(REFERENCE_SSS_MAX_TILE.values())
    tiles = sorted(set(ours) | set(REFERENCE_SSS_MAX_TILE))
    rows = []
    for t in tiles:
        o = ours.get(t, {"count": 0, "percent": 0.0})
        rc = REFERENCE_SSS_MAX_TILE.get(t, 0)
        rows.append(
            {
                "tile": t,
                "ours_count": o["count"],
                "ours_percent": o["percent"],
                "reference_count": rc,
                "reference_percent": round(100.0 * rc / ref_total, 2),
            }
        )
    ours_ge128 = sum(
        o["count"] for t, o in ours.items() if t >= 128
    ) / max(n, 1)
    ref_ge128 = sum(
        c for t, c in REFERENCE_SSS_MAX_TILE.items() if t >= 128
    ) / ref_total
    return {
        "checkpoint_episodes": n,
        "truncated": n < REFERENCE_SSS_EPISODES,
        "rows": rows,
        "ours_frac_ge_128": round(ours_ge128, 4),
        "reference_frac_ge_128": round(ref_ge128, 4),
        "reference_source": (
            "experiment_analysis.ipynb cell-5 (SSS_replay, 17,758 episodes)"
        ),
    }


def format_reference_comparison(cmp: dict) -> str:
    """Printable side-by-side table for ``t48 analyze --vs-reference``."""
    lines = [
        f"max-tile distribution at {cmp['checkpoint_episodes']} episodes "
        f"(reference: SSS_replay, {REFERENCE_SSS_EPISODES})",
        f"{'tile':>6} {'ours':>8} {'ours%':>7} {'ref':>8} {'ref%':>7}",
    ]
    for r in cmp["rows"]:
        lines.append(
            f"{r['tile']:>6} {r['ours_count']:>8} {r['ours_percent']:>6.2f}% "
            f"{r['reference_count']:>8} {r['reference_percent']:>6.2f}%"
        )
    lines.append(
        f"frac >=128: ours {cmp['ours_frac_ge_128']:.2%} "
        f"vs reference {cmp['reference_frac_ge_128']:.2%}"
    )
    if cmp["truncated"]:
        lines.append(
            "(run shorter than the reference checkpoint — partial compare)"
        )
    return "\n".join(lines)


def _load_hyperparams(job_folder: str) -> dict:
    path = os.path.join(job_folder, "text/hyperparams.json")
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return {}


def render_report(job_folder: str, out_path: Optional[str] = None) -> dict:
    """Produce the analysis bundle for a job; optionally plot curves.

    Returns the report dict; writes ``analysis.json`` (and
    ``analysis.png`` when matplotlib is available) into the job folder.
    The plots draw the training-start and ε-floor episode markers the
    reference notebook overlays (experiment_analysis.ipynb), read from
    the job's saved hyperparams.
    """
    episodes = load_episodes(job_folder)
    hp = _load_hyperparams(job_folder)
    report = {
        "job": os.path.basename(job_folder.rstrip("/")),
        "max_tile_frequency": max_tile_frequency(episodes),
        "learning_curve": learning_curve_summary(episodes),
        "vs_reference": compare_to_reference(episodes),
    }
    out_path = out_path or os.path.join(job_folder, "analysis.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        # vline positions (the notebook's overlays): training starts after
        # `no_episodes_before_training`; ε hits its floor when the linear
        # decay max((E−ep)/E, ε_min) reaches ε_min, at ep = E·(1−ε_min)
        train_start = hp.get("no_episodes_before_training")
        eps_total = hp.get("no_episodes_to_reach_epsilon")
        min_eps = hp.get("min_epsilon", 0.0)
        eps_floor = (
            eps_total * (1.0 - float(min_eps))
            if eps_total is not None
            else None
        )

        def draw_vlines(ax):
            if train_start is not None:
                ax.axvline(train_start, color="green", ls="--", lw=1,
                           alpha=0.8, label="training starts")
            if eps_floor is not None:
                ax.axvline(eps_floor, color="red", ls=":", lw=1,
                           alpha=0.8, label="ε floor")

        fig, axes = plt.subplots(2, 2, figsize=(13, 8))
        nums = [e["number"] for e in episodes]
        for ax, key, title in (
            (axes[0][0], "merge_score", "merge score"),
            (axes[0][1], "max_tile", "max tile"),
            (axes[1][0], "number_moves", "#moves"),
        ):
            ax.scatter(nums, [e[key] for e in episodes], s=2, alpha=0.3)
            draw_vlines(ax)
            ax.set_title(f"{title} / episode")
        axes[0][0].legend(loc="upper left", fontsize=8)
        ax = axes[1][1]
        ax.plot(nums, [e["epsilon"] for e in episodes], label="epsilon")
        draw_vlines(ax)
        ax2 = ax.twinx()
        ax2.plot(nums, [e["q_value"] for e in episodes], color="C1", alpha=0.5,
                 label="mean Q")
        ax.set_title("epsilon & mean Q / episode")
        fig.tight_layout()
        fig.savefig(os.path.join(job_folder, "analysis.png"), dpi=110)
        plt.close(fig)
    except Exception:
        pass
    return report
