"""Exploration schedule, expressed against completed-episode counts.

Reference semantics (/root/reference/src/dqn_lib.py:184-188): linear decay
``ε = max((E − ep)/E, ε_min)`` over the first ``E`` episodes, with ε forced
to 0 during the first ``fill_up`` episodes when warm-starting a resumed
model's replay buffer. In the batched world ``ep`` is the global
completed-episode count (identical to the reference's episode index when
env_batch == 1, SURVEY.md §7 'lockstep batching').
"""

from __future__ import annotations

import jax.numpy as jnp


def epsilon_schedule(
    episodes_done,
    no_episodes_to_reach_epsilon: int,
    min_epsilon: float,
    fill_up_episodes: int = 0,
):
    """ε for the episode currently being played (dqn_lib.py:184-188)."""
    ep = episodes_done.astype(jnp.float32)
    horizon = jnp.float32(no_episodes_to_reach_epsilon)
    eps = jnp.maximum((horizon - ep) / horizon, jnp.float32(min_epsilon))
    return jnp.where(episodes_done < fill_up_episodes, 0.0, eps)
