"""Experiment persistence, checkpointing and metrics."""

from t48.exp.experiment import Experiment
from t48.exp.checkpoint import save_checkpoint, restore_checkpoint

__all__ = ["Experiment", "save_checkpoint", "restore_checkpoint"]
