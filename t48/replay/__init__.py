"""HBM-resident per-env-ring replay buffer."""

from t48.replay.buffer import (
    ReplayState,
    Transition,
    add_many,
    add_step,
    create,
    per_env_capacity,
    sample,
    sample_rows,
)

__all__ = [
    "ReplayState",
    "Transition",
    "add_many",
    "add_step",
    "create",
    "per_env_capacity",
    "sample",
    "sample_rows",
]
