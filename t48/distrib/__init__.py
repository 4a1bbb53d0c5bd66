"""Device mesh / sharding runtime for multi-chip scaling."""

from t48.distrib.mesh import (
    make_mesh,
    train_state_shardings,
    distribute_train_state,
    init_distributed,
)

__all__ = [
    "make_mesh",
    "train_state_shardings",
    "distribute_train_state",
    "init_distributed",
]
