"""Numerical/state sanitizers — the TPU equivalent of runtime checkers.

SURVEY.md §5: the reference has no sanitizers (single-threaded, nothing to
race); the rebuild's sanitizer story is (a) NaN trapping in the learner,
(b) ``checkify``-style invariant checks on the env kernel, and
(c) determinism itself — fixed-key trajectory fingerprints that must be
bit-stable across runs, shardings and code refactors.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_debug() -> None:
    """Trap NaNs produced by any jitted computation (test/debug mode —
    recompiles with checks, do not use in production runs)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_debug() -> None:
    jax.config.update("jax_debug_nans", False)


def trajectory_fingerprint(state) -> str:
    """Deterministic hex digest of an ``EnvState`` (or any pytree of
    arrays): the fixed-key trajectory hash used by determinism tests —
    equal seeds and step counts must yield equal fingerprints on any
    backend, device count or sharding."""
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(state):
        arr = np.asarray(jax.device_get(leaf))
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def checked_env_invariants(boards: jax.Array, merge_scores: jax.Array):
    """Jittable env-state invariant checks. Returns bool[B] ``ok`` masks
    (all-true on a healthy state):

    - exponents in [0, 17] (tile ≤ 2^17, the 4x4 theoretical max);
    - merge scores non-negative;
    - at least one non-empty cell (a live board always has tiles).
    """
    b = boards.shape[0]
    flat = boards.reshape(b, -1)
    exps_ok = ((flat >= 0) & (flat <= 17)).all(axis=1)
    score_ok = merge_scores >= 0
    occupied_ok = (flat != 0).any(axis=1)
    return exps_ok & score_ok & occupied_ok


def assert_env_invariants(boards, merge_scores) -> None:
    """Host-side hard assertion over ``checked_env_invariants``."""
    ok = np.asarray(jax.device_get(checked_env_invariants(boards, merge_scores)))
    if not ok.all():
        bad = np.nonzero(~ok)[0][:8]
        raise AssertionError(f"env invariant violation in envs {bad.tolist()}")
