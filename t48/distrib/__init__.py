"""Device mesh / sharding runtime for multi-chip scaling."""

from t48.distrib.mesh import (
    distribute_train_state,
    fully_replicated,
    init_distributed,
    make_mesh,
    train_state_shardings,
)

__all__ = [
    "distribute_train_state",
    "fully_replicated",
    "init_distributed",
    "make_mesh",
    "train_state_shardings",
]
