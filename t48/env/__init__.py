"""Batched 2048 environment: pure-JAX engine + CPU golden model."""

from t48.env.engine import (
    ACTIONS,
    EnvState,
    init,
    new_boards,
    peek_all,
    step,
    reset_where,
    encode_flat,
    encode_2d,
    max_tile,
)
from t48.env.golden import GoldenBoard

__all__ = [
    "ACTIONS",
    "EnvState",
    "init",
    "new_boards",
    "peek_all",
    "step",
    "reset_where",
    "encode_flat",
    "encode_2d",
    "max_tile",
    "GoldenBoard",
]
