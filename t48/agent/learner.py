"""Double-DQN learner: targets, loss, optimizer step, target sync.

Reference: ``train_step`` (/root/reference/src/dqn_lib.py:119-164).

- Double-DQN target (dqn_lib.py:125-132):
    a* = argmax_a Q_online(s', a)
    y  = r + (1 − done) · γ · Q_target(s', a*)
- Vanilla target (dqn_lib.py:133-144): y = r + (1−done)·γ·max_a Q_target(s',a)
- Loss: MSE with **sum** reduction over the batch
  (``nn.MSELoss(reduction='sum')``, configs/double_dqn_conv.py:38) on the
  Q-values of the taken actions (one-hot mask, dqn_lib.py:146-155).
- Optimizer: Adam (configs/double_dqn_conv.py:39).
- Hard target sync: params copied wholesale (dqn_lib.py:227-228).

Known reference bug, NOT reproduced by default: the published code calls
``loss.backward(); optimizer.zero_grad(); optimizer.step()``
(dqn_lib.py:161-163), zeroing gradients before applying them — the
published training effectively applies zero-gradient Adam updates. We
implement the canonical order; ``compat_zero_update=True`` emulates the
literal reference behavior (optimizer state advances, params get the Adam
update of a zero gradient) for curve-matching the published artifact.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from t48.replay.buffer import Transition


def _select_action(q: jax.Array, actions: jax.Array) -> jax.Array:
    """``q[i, actions[i]]`` as a one-hot masked sum.

    ``take_along_axis`` lowers to a row-serial gather on TPU (~40µs per
    call at B=4096 on v5e — it dominated the learner update); the one-hot
    multiply-reduce over the 4-wide action axis is a single VPU fusion
    and bit-exact (exactly one product is non-zero per row). This is also
    literally the reference's formulation: a one-hot mask times Q, summed
    (dqn_lib.py:146-155).
    """
    onehot = actions[:, None] == jnp.arange(q.shape[-1])[None, :]
    return jnp.sum(jnp.where(onehot, q, 0.0), axis=-1)


def _select_action_cm(q_cm: jax.Array, actions: jax.Array) -> jax.Array:
    """Cell-major ``_select_action``: q [4, *batch], batch in lanes
    (any number of trailing batch dims — the sampler's [s, B] factored
    batch stays unflattened)."""
    arange = jnp.arange(q_cm.shape[0]).reshape((-1,) + (1,) * actions.ndim)
    onehot = actions[None] == arange
    return jnp.sum(jnp.where(onehot, q_cm, 0.0), axis=0)


def double_dqn_targets(apply_fn, params, target_params, encode, batch, discount):
    """y = r + (1−done)·γ·Q_target(s', argmax_a Q_online(s', a))."""
    next_enc = encode(batch.next_state)
    next_q_online = apply_fn(params, next_enc)
    best_next = jnp.argmax(next_q_online, axis=-1)
    next_q_target = apply_fn(target_params, next_enc)
    next_best_q = _select_action(next_q_target, best_next)
    not_done = 1.0 - batch.done.astype(jnp.float32)
    return batch.reward + not_done * discount * next_best_q


def vanilla_dqn_targets(apply_fn, params, target_params, encode, batch, discount):
    """y = r + (1−done)·γ·max_a Q_target(s', a) (dqn_lib.py:133-144)."""
    del params
    next_q_target = apply_fn(target_params, encode(batch.next_state))
    not_done = 1.0 - batch.done.astype(jnp.float32)
    return batch.reward + not_done * discount * next_q_target.max(-1)


def td_loss(
    apply_fn: Callable,
    params,
    target_params,
    encode: Callable,
    batch: Transition,
    discount: float,
    use_double_dqn: bool = True,
    fused_apply: bool = False,
    cm: bool = False,
):
    """Sum-reduced MSE TD loss of the taken actions' Q-values.

    All TD arithmetic runs in f32 even when ``apply_fn`` computes in bf16
    (the sum over a 5000-row batch would lose bf16 mantissa bits).

    ``cm``: cell-major orientation — states are [S, N] (batch minor,
    the hot loop's layout, t48/agent/cm_forward.py) and ``apply_fn``
    returns q [4, N]; actions/reductions run over axis 0. Batch-major
    (``cm=False``) expects states [N, S] and q [N, 4].

    ``fused_apply``: compute Q(s) and Q_online(s') in ONE forward on the
    doubled batch — same params, pure fusion. Measured a net LOSS in the
    training loop on v5e (the relayout costs more than the fusion saves
    at these model sizes, benchmarks/learner_flags_r03.md) — off by
    default, kept for larger models.

    ``batch.weight`` (optional f32[N]) scales each row's squared error —
    the learner-batch cap masks surplus rows with weight 0 so the
    effective batch matches ``config.batch_size`` at any env_batch.
    """
    select = _select_action_cm if cm else _select_action
    act_axis = 0 if cm else -1
    batch_axis = 1 if cm else 0
    enc = encode(batch.state)
    next_enc = encode(batch.next_state)
    if fused_apply and use_double_dqn:
        # Batch-major: interleave (s, s') per row instead of concatenating
        # the halves — a [B,2,...]→[2B,...] reshape keeps every row on its
        # own 'data' shard under GSPMD, whereas concat along the sharded
        # axis forces an all-to-all redistribution (asserted in
        # tests/test_sharding.py). Cell-major: same trick on the trailing
        # batch axis.
        if cm:
            # extra leading batch dim — the CM forwards treat every
            # trailing dim as batch, so no flatten/reshape is needed
            joint = jnp.stack([enc, next_enc], axis=1)
            both = apply_fn(params, joint)
            q_all, next_q_online = both[:, 0], both[:, 1]
        else:
            joint = jnp.stack([enc, next_enc], axis=1)
            joint = joint.reshape((-1,) + enc.shape[1:])
            both = apply_fn(params, joint).reshape(enc.shape[0], 2, -1)
            q_all, next_q_online = both[:, 0, :], both[:, 1, :]
        best_next = jnp.argmax(next_q_online, axis=act_axis)
        next_q_target = apply_fn(target_params, next_enc)
        next_best_q = select(next_q_target, best_next)
    else:
        q_all = apply_fn(params, enc)
        if use_double_dqn:
            next_q_online = apply_fn(params, next_enc)
            best_next = jnp.argmax(next_q_online, axis=act_axis)
            next_q_target = apply_fn(target_params, next_enc)
            next_best_q = select(next_q_target, best_next)
        else:
            next_best_q = apply_fn(target_params, next_enc).max(act_axis)
    not_done = 1.0 - batch.done.astype(jnp.float32)
    targets = jax.lax.stop_gradient(
        batch.reward
        + not_done * discount * next_best_q.astype(jnp.float32)
    )
    q_taken = select(q_all, batch.action).astype(jnp.float32)
    err2 = jnp.square(q_taken - targets)
    weight = getattr(batch, "weight", None)
    if weight is not None:
        err2 = err2 * weight
    del batch_axis
    return jnp.sum(err2)


class LearnerOutput(NamedTuple):
    params: object
    opt_state: object
    loss: jax.Array


def make_train_step(
    apply_fn: Callable,
    encode: Callable,
    optimizer: optax.GradientTransformation,
    discount: float,
    use_double_dqn: bool = True,
    compat_zero_update: bool = False,
    fused_apply: bool = False,
    cm: bool = False,
):
    """Build the jittable learner update.

    Returns ``train_step(params, target_params, opt_state, batch) ->
    LearnerOutput``. With ``compat_zero_update`` the gradient is replaced
    by zeros *after* loss computation, emulating the reference's
    backward→zero_grad→step ordering bug (dqn_lib.py:161-163).
    ``fused_apply`` computes Q(s) and Q_online(s') in one doubled-batch
    forward; ``cm`` selects the cell-major orientation (see ``td_loss``).
    """

    def train_step(params, target_params, opt_state, batch: Transition):
        loss, grads = jax.value_and_grad(
            lambda p: td_loss(
                apply_fn, p, target_params, encode, batch, discount,
                use_double_dqn, fused_apply, cm,
            )
        )(params)
        if compat_zero_update:
            grads = jax.tree_util.tree_map(jnp.zeros_like, grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return LearnerOutput(new_params, new_opt_state, loss)

    return train_step
