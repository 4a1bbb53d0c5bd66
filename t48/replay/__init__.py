"""HBM-resident per-env-ring replay buffer."""

from t48.replay.buffer import (
    CMTransition,
    ReplayState,
    Transition,
    to_cm,
    add_many,
    add_step,
    create,
    per_env_capacity,
    sample,
    sample_rows,
)

__all__ = [
    "CMTransition",
    "ReplayState",
    "Transition",
    "to_cm",
    "add_many",
    "add_step",
    "create",
    "per_env_capacity",
    "sample",
    "sample_rows",
]
