"""ε-greedy action selection with legality masking, batched.

Reference: ``epsilon_greedy_policy`` (/root/reference/src/dqn_lib.py:16-30):

- with probability ε: a uniform-random action in 0..3 — possibly *illegal*
  (dqn_lib.py:20-21); an illegal action is a no-op step in the env;
- otherwise: normalize Q, zero out illegal moves, argmax.

The reference's normalization ``Q − min(Q)·max(Q) − min(Q)``
(dqn_lib.py:25-26) is an odd shift that can still pick an illegal
(zero-scored) move when all legal normalized Qs are ≤ 0. Per SURVEY.md
§7.3 the default here is the principled −inf legality mask; the literal
reference formula is available as ``compat='reference'`` for
curve-matching studies.

The greedy branch's reported Q is ``max(Q)`` and the random branch reports
0 (dqn_lib.py:21,30) — reproduced for metric parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def greedy_masked_action(q_values: jax.Array, legal: jax.Array, compat: str = "masked"):
    """Greedy action over legal moves.

    Args:
      q_values: f32[B, 4].
      legal:    bool[B, 4].
      compat:   'masked' (default, −inf mask) or 'reference' (the literal
                dqn_lib.py:25-28 normalize-then-multiply formula).
    """
    if compat == "reference":
        qmin = q_values.min(-1, keepdims=True)
        qmax = q_values.max(-1, keepdims=True)
        q_normal = q_values - qmin * qmax - qmin
        available_q = jnp.where(legal, q_normal, 0.0)
        return jnp.argmax(available_q, axis=-1)
    if compat == "masked":
        masked = jnp.where(legal, q_values, NEG_INF)
        return jnp.argmax(masked, axis=-1)
    raise ValueError(f"unknown policy compat mode: {compat!r}")


def epsilon_greedy(
    key: jax.Array,
    q_values: jax.Array,
    legal: jax.Array,
    epsilon: jax.Array,
    compat: str = "masked",
):
    """Batched ε-greedy.

    Returns (actions int32[B], max_q f32[B]) where max_q is 0 on the
    random branch (dqn_lib.py:21) and ``max(Q)`` on the greedy branch
    (dqn_lib.py:30).
    """
    k_explore, k_action = jax.random.split(key)
    batch = q_values.shape[0]
    explore = jax.random.uniform(k_explore, (batch,)) < epsilon
    random_actions = jax.random.randint(k_action, (batch,), 0, q_values.shape[-1])
    greedy_actions = greedy_masked_action(q_values, legal, compat)
    actions = jnp.where(explore, random_actions, greedy_actions).astype(jnp.int32)
    max_q = jnp.where(explore, 0.0, q_values.max(-1))
    return actions, max_q


def greedy_masked_action_cm(q_cm: jax.Array, legal_cm: jax.Array,
                            compat: str = "masked"):
    """Cell-major ``greedy_masked_action``: q [4, B], legal bool [4, B],
    action axis in sublanes, batch in lanes — every op is lane-parallel
    (the hot loop's orientation, t48/train/loop.py)."""
    if compat == "reference":
        qmin = q_cm.min(0, keepdims=True)
        qmax = q_cm.max(0, keepdims=True)
        q_normal = q_cm - qmin * qmax - qmin
        return jnp.argmax(jnp.where(legal_cm, q_normal, 0.0), axis=0)
    if compat == "masked":
        return jnp.argmax(jnp.where(legal_cm, q_cm, NEG_INF), axis=0)
    raise ValueError(f"unknown policy compat mode: {compat!r}")


def epsilon_greedy_cm(
    key: jax.Array,
    q_cm: jax.Array,
    legal_cm: jax.Array,
    epsilon: jax.Array,
    compat: str = "masked",
):
    """Cell-major ``epsilon_greedy``: q [4, B], legal bool [4, B] →
    (actions int32[B], max_q f32[B]). Same semantics as the batch-major
    form (pinned in tests/test_agent.py)."""
    k_explore, k_action = jax.random.split(key)
    batch = q_cm.shape[1]
    explore = jax.random.uniform(k_explore, (batch,)) < epsilon
    random_actions = jax.random.randint(k_action, (batch,), 0, q_cm.shape[0])
    greedy_actions = greedy_masked_action_cm(q_cm, legal_cm, compat)
    actions = jnp.where(explore, random_actions, greedy_actions).astype(jnp.int32)
    max_q = jnp.where(explore, 0.0, q_cm.max(0))
    return actions, max_q
