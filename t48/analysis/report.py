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
    pickle fallback — both are written by t48.exp.Experiment)."""
    jsonl = os.path.join(job_folder, "binary/episodes.jsonl")
    pick = os.path.join(job_folder, "binary/episodes.p")
    if os.path.isfile(jsonl):
        episodes = []
        with open(jsonl) as f:
            for line in f:
                line = line.strip()
                if line:
                    episodes.append(json.loads(line))
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


def render_report(job_folder: str, out_path: Optional[str] = None) -> dict:
    """Produce the analysis bundle for a job; optionally plot curves.

    Returns the report dict; writes ``analysis.json`` (and
    ``analysis.png`` when matplotlib is available) into the job folder.
    """
    episodes = load_episodes(job_folder)
    report = {
        "job": os.path.basename(job_folder.rstrip("/")),
        "max_tile_frequency": max_tile_frequency(episodes),
        "learning_curve": learning_curve_summary(episodes),
    }
    out_path = out_path or os.path.join(job_folder, "analysis.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(13, 8))
        nums = [e["number"] for e in episodes]
        for ax, key, title in (
            (axes[0][0], "merge_score", "merge score"),
            (axes[0][1], "max_tile", "max tile"),
            (axes[1][0], "number_moves", "#moves"),
        ):
            ax.scatter(nums, [e[key] for e in episodes], s=2, alpha=0.3)
            ax.set_title(f"{title} / episode")
        ax = axes[1][1]
        ax.plot(nums, [e["epsilon"] for e in episodes], label="epsilon")
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
