"""HBM-resident circular replay buffer."""

from t48.replay.buffer import ReplayState, create, add_batch, sample, Transition

__all__ = ["ReplayState", "create", "add_batch", "sample", "Transition"]
