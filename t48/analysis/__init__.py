"""Offline analysis: learning curves, max-tile reports, benchmarks."""

from t48.analysis.report import (
    load_episodes,
    max_tile_frequency,
    learning_curve_summary,
    render_report,
)

__all__ = [
    "load_episodes",
    "max_tile_frequency",
    "learning_curve_summary",
    "render_report",
]
