"""On-device actor-learner training loop."""

from t48.train.schedules import epsilon_schedule
from t48.train.loop import (
    TrainState,
    EpisodeLog,
    create_train_state,
    make_train_iteration,
    make_train_chunk,
    drain_episode_log,
)

__all__ = [
    "epsilon_schedule",
    "TrainState",
    "EpisodeLog",
    "create_train_state",
    "make_train_iteration",
    "make_train_chunk",
    "drain_episode_log",
]
