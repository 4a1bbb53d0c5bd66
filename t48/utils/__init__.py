"""Observability and debugging utilities."""

from t48.utils.tracing import ThroughputMeter, profile_session, step_annotation
from t48.utils.debug import (
    enable_nan_debug,
    trajectory_fingerprint,
    checked_env_invariants,
)

__all__ = [
    "ThroughputMeter",
    "profile_session",
    "step_annotation",
    "enable_nan_debug",
    "trajectory_fingerprint",
    "checked_env_invariants",
]
