"""HBM-resident circular replay buffer, functional and shard-friendly.

The reference keeps a host-side ``collections.deque`` of *Board objects*
and tensorizes every sampled experience on every train step — two
host→device transfers per sampled item (dqn_lib.py:106, 33-64). This
module inverts that: transitions are encoded **once at insert** into
fixed-size device arrays that live in HBM for the whole run. Sampling is a
uniform gather, exactly matching the reference's
``np.random.randint(len(buffer), size=batch)`` with-replacement scheme
(dqn_lib.py:67-68).

Storage layout (N = capacity, S = K*K board cells):

  state, next_state : int8[N, S]  — log2 exponents (native engine layout)
  action            : int8[N]
  reward            : f32[N]     — merge-score delta
  done              : bool[N]
  ptr, fill         : int32      — circular write head / live count

int8 board storage keeps a 1M-transition buffer at ~35 MB of HBM. The
leading N axis shards over the 'data' mesh axis; per-shard fill counts are
implicit (inserts are balanced because every device writes B/D transitions
per step).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


class Transition(NamedTuple):
    """A batch of transitions, encoded (exponent boards flattened)."""

    state: jax.Array  # int8[B, S]
    action: jax.Array  # int8/int32[B]
    reward: jax.Array  # f32[B]
    next_state: jax.Array  # int8[B, S]
    done: jax.Array  # bool[B]


@struct.dataclass
class ReplayState:
    state: jax.Array
    action: jax.Array
    reward: jax.Array
    next_state: jax.Array
    done: jax.Array
    ptr: jax.Array  # int32 scalar
    fill: jax.Array  # int32 scalar

    @property
    def capacity(self) -> int:
        return self.state.shape[0]


def create(capacity: int, cells: int = 16) -> ReplayState:
    """Allocate an empty buffer of ``capacity`` transitions."""
    return ReplayState(
        state=jnp.zeros((capacity, cells), jnp.int8),
        action=jnp.zeros((capacity,), jnp.int8),
        reward=jnp.zeros((capacity,), jnp.float32),
        next_state=jnp.zeros((capacity, cells), jnp.int8),
        done=jnp.zeros((capacity,), jnp.bool_),
        ptr=jnp.zeros((), jnp.int32),
        fill=jnp.zeros((), jnp.int32),
    )


def add_batch(rs: ReplayState, batch: Transition) -> ReplayState:
    """Append B transitions at the circular write head.

    Equivalent of B ``replay_buffer.append`` calls (dqn_lib.py:106) — the
    deque's evict-oldest-at-capacity behavior falls out of the modular
    write head.
    """
    n = rs.state.shape[0]
    b = batch.action.shape[0]
    idx = (rs.ptr + jnp.arange(b, dtype=jnp.int32)) % n
    return rs.replace(
        state=rs.state.at[idx].set(batch.state.astype(rs.state.dtype)),
        action=rs.action.at[idx].set(batch.action.astype(rs.action.dtype)),
        reward=rs.reward.at[idx].set(batch.reward.astype(rs.reward.dtype)),
        next_state=rs.next_state.at[idx].set(
            batch.next_state.astype(rs.next_state.dtype)
        ),
        done=rs.done.at[idx].set(batch.done),
        ptr=(rs.ptr + b) % n,
        fill=jnp.minimum(rs.fill + b, n),
    )


def sample(rs: ReplayState, key: jax.Array, batch_size: int) -> Transition:
    """Uniform sampling with replacement over the live region.

    Matches ``sample_experiences`` (dqn_lib.py:67-70). The caller must
    ensure the buffer is non-empty (the training loop gates the learner on
    a fill threshold); ``max(fill, 1)`` guards the degenerate empty case.
    """
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(rs.fill, 1))
    return Transition(
        state=rs.state[idx],
        action=rs.action[idx].astype(jnp.int32),
        reward=rs.reward[idx],
        next_state=rs.next_state[idx],
        done=rs.done[idx],
    )
