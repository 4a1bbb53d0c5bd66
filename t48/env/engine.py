"""Pure-JAX batched 2048 engine.

TPU-first redesign of the reference game engine (``Board2048`` in
/root/reference/src/board.py:8-241). Key design decisions:

- **Native log2 representation.** Boards are ``int32[B, K, K]`` arrays of
  *exponents* (0 = empty cell, ``e`` = tile ``2**e``). The reference stores
  raw tile values and converts to log2 for the network on every encode
  (board.py:224-231); here log2 is the native layout, so the network encode
  is a dtype cast.

- **Branch-free merge kernel.** The reference merges a row with a
  data-dependent pointer walk (``_apply_action_to_vector``,
  board.py:92-126), which cannot be traced by XLA. We use a fixed
  compress→merge→compress network of elementwise selects (a stable
  bubble-compaction of non-zeros followed by K-1 ordered pair merges),
  which reproduces the reference's single-merge-per-pair,
  move-direction-priority semantics exactly (validated exhaustively against
  the golden model in tests/test_engine.py).

- **All four directions via flips/transposes** of the same leftward kernel,
  mirroring the reference's up/down/left/right construction
  (board.py:147-183), but batched: one call computes all four candidate
  boards, per-direction merge-score deltas and the legality mask
  ("move is legal iff it changes the board", board.py:128-135). The policy
  and the step both consume this single ``peek_all`` result.

- **Stochastic spawns with ``jax.random``**: uniform choice over empty
  cells, value 2 or 4 with *uniform* probability — the reference's
  ``np.random.choice([2, 4])`` at board.py:12,49 is uniform, NOT the
  canonical 90/10 split; we keep a ``p_four`` knob (default 0.5) for parity.
  No spawn happens on an illegal (no-op) move (board.py:151-153).

Everything is shape-static and ``jit``/``vmap``/``shard_map`` friendly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

# Action encoding follows the reference order: ['up','down','left','right']
# (board.py:129, dqn_lib.py:191 uses ['u','d','l','r']).
ACTIONS: Tuple[str, ...] = ("up", "down", "left", "right")
UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3


@struct.dataclass
class EnvState:
    """Batched environment state (a pytree; shard leading axis over 'data').

    Attributes:
      boards:       int32[B, K, K] log2-encoded boards (0 = empty).
      merge_scores: int32[B] cumulative merge score per board (the
                    reference's ``_mergescore``, board.py:13,207-208).
      step_counts:  int32[B] actions taken this episode (the reference's
                    ``len(_action_history)``, board.py:14; every step —
                    including illegal no-ops — appends one action,
                    board.py:149).
    """

    boards: jax.Array
    merge_scores: jax.Array
    step_counts: jax.Array


# ---------------------------------------------------------------------------
# Row merge kernel
# ---------------------------------------------------------------------------


def _compress(v):
    """Stable compaction: move non-zeros to the front of the lane list.

    ``v`` is a list of K arrays (one per lane). Implemented as a bubble
    network of adjacent conditional shifts — stable, branch-free, and
    fully vectorized over the leading (batch × row) dims.
    """
    k = len(v)
    v = list(v)
    for p in range(k - 1):
        for i in range(k - 1 - p):
            a, b = v[i], v[i + 1]
            a_zero = a == 0
            v[i] = jnp.where(a_zero, b, a)
            v[i + 1] = jnp.where(a_zero, jnp.zeros_like(b), b)
    return v


def merge_rows_left(rows: jax.Array):
    """Merge each length-K row toward index 0 (the 'left' move).

    Reproduces reference semantics (board.py:92-126, golden-tested against
    the merge table at /root/reference/tests/test_game_board.py:8-23):
    single merge per tile pair, pairs resolved in move direction.

    Args:
      rows: int[..., K] exponent-encoded rows.

    Returns:
      (merged_rows int[..., K], score_delta int32[...], changed bool[...])
      where score_delta is the sum of merged tile *values* (2**new_exp),
      matching ``_mergescore`` accumulation at board.py:113-114.
    """
    k = rows.shape[-1]
    v = [rows[..., i] for i in range(k)]
    v = _compress(v)
    score = jnp.zeros(rows.shape[:-1], jnp.int32)
    one = jnp.int32(1)
    for i in range(k - 1):
        m = (v[i] != 0) & (v[i] == v[i + 1])
        v[i] = jnp.where(m, v[i] + 1, v[i])
        v[i + 1] = jnp.where(m, 0, v[i + 1])
        score = score + jnp.where(
            m, jnp.left_shift(one, v[i].astype(jnp.int32)), 0
        )
    v = _compress(v)
    merged = jnp.stack(v, axis=-1)
    changed = jnp.any(merged != rows, axis=-1)
    return merged, score, changed


def _apply_rows(boards: jax.Array):
    """Leftward merge over the last axis of [..., K, K] boards."""
    merged, score, changed = merge_rows_left(boards)
    return merged, score.sum(-1), changed.any(-1)


def peek_all(boards: jax.Array):
    """Candidate boards, score deltas and legality for all four moves.

    The reference computes this with 4 full ``peek_action`` clones per step
    (board.py:128-135). Here one fused call produces:

    Returns:
      moved:  int32[..., 4, K, K] — board after each move (pre-spawn).
      deltas: int32[..., 4]       — merge-score delta of each move.
      legal:  bool[..., 4]        — move changes the board
                                    (board.py:132-134 semantics).
    Action order: up, down, left, right.
    """
    # left: rows as-is
    l_m, l_s, l_c = _apply_rows(boards)
    # right: reverse each row (board.py:175-183)
    r_m, r_s, r_c = _apply_rows(jnp.flip(boards, axis=-1))
    r_m = jnp.flip(r_m, axis=-1)
    # up: merge columns toward the top = transpose → left → transpose
    # (board.py:147-154 applies the row kernel to state.T)
    t = jnp.swapaxes(boards, -1, -2)
    u_m, u_s, u_c = _apply_rows(t)
    u_m = jnp.swapaxes(u_m, -1, -2)
    # down: transpose → reverse → left → reverse → transpose
    # (board.py:156-164)
    d_m, d_s, d_c = _apply_rows(jnp.flip(t, axis=-1))
    d_m = jnp.swapaxes(jnp.flip(d_m, axis=-1), -1, -2)

    moved = jnp.stack([u_m, d_m, l_m, r_m], axis=-3)
    deltas = jnp.stack([u_s, d_s, l_s, r_s], axis=-1)
    legal = jnp.stack([u_c, d_c, l_c, r_c], axis=-1)
    return moved, deltas, legal


# ---------------------------------------------------------------------------
# Spawning / reset
# ---------------------------------------------------------------------------


def _spawn(board: jax.Array, key: jax.Array, p_four: float = 0.5):
    """Place a 2 or 4 in a uniformly random empty cell of one [K, K] board.

    Mirrors ``_populate_empty_cell`` (board.py:41-51): uniform cell choice
    over row-major empties; tile value 4 with probability ``p_four``
    (reference: uniform 0.5 via ``np.random.choice([2,4])``, board.py:49).
    If the board has no empty cell the board is returned unchanged (the
    reference never calls spawn on a full board because no-op moves skip
    the spawn).
    """
    k = board.shape[-1]
    flat = board.reshape(-1)
    empty = flat == 0
    n_empty = empty.sum()
    k_cell, k_val = jax.random.split(key)
    u = jax.random.randint(k_cell, (), 0, jnp.maximum(n_empty, 1))
    rank = jnp.cumsum(empty) - 1
    target = empty & (rank == u)
    exp4 = jax.random.bernoulli(k_val, p_four)
    val = jnp.where(exp4, 2, 1).astype(flat.dtype)
    return jnp.where(target, val, flat).reshape(k, k)


def _new_board(key: jax.Array, k: int, p_four: float = 0.5):
    """Fresh board with two random spawns (board.py:18-20)."""
    k1, k2 = jax.random.split(key)
    b = jnp.zeros((k, k), jnp.int32)
    b = _spawn(b, k1, p_four)
    return _spawn(b, k2, p_four)


def new_boards(key: jax.Array, batch: int, k: int = 4, p_four: float = 0.5):
    """int32[batch, k, k] of freshly initialized boards."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda kk: _new_board(kk, k, p_four))(keys)


def init(key: jax.Array, batch: int, k: int = 4, p_four: float = 0.5) -> EnvState:
    """Initialize a batch of environments."""
    return EnvState(
        boards=new_boards(key, batch, k, p_four),
        merge_scores=jnp.zeros((batch,), jnp.int32),
        step_counts=jnp.zeros((batch,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Stepping
# ---------------------------------------------------------------------------


def step_from_peek(
    state: EnvState,
    actions: jax.Array,
    key: jax.Array,
    moved: jax.Array,
    deltas: jax.Array,
    legal: jax.Array,
    p_four: float = 0.5,
):
    """Advance all envs one step, reusing a previous ``peek_all`` result.

    Semantics match one reference ``peek_action`` call per env
    (board.py:147-183 + dqn_lib.py:102): if the chosen move changes the
    board, apply it, add the merge delta, and spawn one tile; otherwise the
    board is unchanged and no spawn happens. The step counter always
    increments (the reference appends to ``_action_history``
    unconditionally, board.py:149).

    Returns (new_state, reward int32[B]) where reward is the merge-score
    delta (``reward_func_merge_score``, dqn_lib.py:87-88).
    """
    batch = actions.shape[0]
    bidx = jnp.arange(batch)
    sel_board = moved[bidx, actions]
    sel_delta = deltas[bidx, actions]
    did_move = legal[bidx, actions]

    keys = jax.random.split(key, batch)
    spawned = jax.vmap(lambda b, kk: _spawn(b, kk, p_four))(sel_board, keys)
    boards = jnp.where(did_move[:, None, None], spawned, state.boards)
    reward = jnp.where(did_move, sel_delta, 0)
    return (
        EnvState(
            boards=boards,
            merge_scores=state.merge_scores + reward,
            step_counts=state.step_counts + 1,
        ),
        reward,
    )


def step(state: EnvState, actions: jax.Array, key: jax.Array, p_four: float = 0.5):
    """``peek_all`` + ``step_from_peek`` in one call.

    Returns (new_state, reward int32[B], done bool[B]) — ``done`` is
    computed on the *pre-action* board, matching the reference's
    availability check before acting (dqn_lib.py:17-18).
    """
    moved, deltas, legal = peek_all(state.boards)
    done = ~legal.any(-1)
    new_state, reward = step_from_peek(
        state, actions, key, moved, deltas, legal, p_four
    )
    return new_state, reward, done


def reset_where(state: EnvState, done: jax.Array, key: jax.Array, p_four: float = 0.5):
    """Re-initialize the environments flagged in ``done``."""
    batch = done.shape[0]
    k = state.boards.shape[-1]
    fresh = new_boards(key, batch, k, p_four)
    keep = ~done
    return EnvState(
        boards=jnp.where(done[:, None, None], fresh, state.boards),
        merge_scores=jnp.where(keep, state.merge_scores, 0),
        step_counts=jnp.where(keep, state.step_counts, 0),
    )


# ---------------------------------------------------------------------------
# Encoders / stats
# ---------------------------------------------------------------------------


def encode_flat(boards: jax.Array, dtype=jnp.float32):
    """[B, K, K] exponents → [B, K*K] float network input.

    The reference's dense encoder is log2 then flatten
    (``board_as_flattened_tensor``, dqn_lib.py:12-13 → board.py:224-234);
    our native representation is already log2, so this is a reshape+cast.
    """
    b = boards.shape[0]
    return boards.reshape(b, -1).astype(dtype)


def encode_2d(boards: jax.Array, dtype=jnp.float32):
    """[B, K, K] exponents → [B, K, K, 1] float NHWC conv input.

    Reference conv encoder: log2 then (1,1,K,K) NCHW tensor
    (``board_as_4d_tensor``, dqn_lib.py:8-9 → board.py:236-237). NHWC is
    the TPU-native conv layout.
    """
    return boards[..., None].astype(dtype)


def max_tile(boards: jax.Array):
    """int32[B] maximum tile *value* per board (0 for an empty board)."""
    exps = boards.reshape(boards.shape[0], -1).max(-1)
    return jnp.where(exps > 0, jnp.left_shift(jnp.int32(1), exps), 0)
