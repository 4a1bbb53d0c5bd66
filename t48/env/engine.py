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


def _merge_lanes(v):
    """Compress→merge→compress on a list of K same-shaped lane arrays.

    The core merge network: reproduces reference row semantics
    (board.py:92-126) — single merge per tile pair, pairs resolved in
    move direction. Returns (merged lane list, score, changed) where
    every array has the lanes' common shape.
    """
    k = len(v)
    orig = v
    v = _compress(v)
    score = jnp.zeros(v[0].shape, jnp.int32)
    one = jnp.int32(1)
    for i in range(k - 1):
        m = (v[i] != 0) & (v[i] == v[i + 1])
        v[i] = jnp.where(m, v[i] + 1, v[i])
        v[i + 1] = jnp.where(m, 0, v[i + 1])
        score = score + jnp.where(
            m, jnp.left_shift(one, v[i].astype(jnp.int32)), 0
        )
    v = _compress(v)
    changed = jnp.zeros(v[0].shape, bool)
    for a, b in zip(v, orig):
        changed = changed | (a != b)
    return v, score, changed


def merge_rows_left(rows: jax.Array):
    """Merge each length-K row toward index 0 (the 'left' move).

    Golden-tested against the merge table at
    /root/reference/tests/test_game_board.py:8-23.

    Args:
      rows: int[..., K] exponent-encoded rows.

    Returns:
      (merged_rows int[..., K], score_delta int32[...], changed bool[...])
      where score_delta is the sum of merged tile *values* (2**new_exp),
      matching ``_mergescore`` accumulation at board.py:113-114.
    """
    k = rows.shape[-1]
    v, score, changed = _merge_lanes([rows[..., i] for i in range(k)])
    return jnp.stack(v, axis=-1), score, changed


def _direction_rows(action: int, k: int):
    """Cell-index rows (merge order first) for one move direction.

    The reference builds up/down/left/right from flips and transposes of
    the leftward row kernel (board.py:147-183); in the cell-major layout
    those transforms are free index permutations.
    """
    def idx(r, c):
        return r * k + c

    if action == LEFT:
        return [[idx(r, c) for c in range(k)] for r in range(k)]
    if action == RIGHT:
        return [[idx(r, c) for c in reversed(range(k))] for r in range(k)]
    if action == UP:
        return [[idx(r, c) for r in range(k)] for c in range(k)]
    if action == DOWN:
        return [[idx(r, c) for r in reversed(range(k))] for c in range(k)]
    raise ValueError(action)


# ---------------------------------------------------------------------------
# Cell-major (structure-of-arrays) core
#
# TPU layout rule: the minor-most dimension maps to the 128-wide vector
# lanes. A [B, K, K] kernel puts K=4 in the lanes and wastes 97% of every
# vector op; slicing single lanes out of [B, 16] is a per-cell lane
# shuffle. So the hot path transposes once to cell-major [K*K, B] — each
# cell is a lane-contiguous [B] vector, row slices along the major dim are
# free, and flips/transposes are index permutations of the cell list.
# ---------------------------------------------------------------------------


def split_cells(boards: jax.Array):
    """[B, K, K] → list of K² lane-contiguous [B] cell vectors."""
    b = boards.shape[0]
    k = boards.shape[-1]
    cm = boards.reshape(b, k * k).T  # one relayout to cell-major
    return [cm[i] for i in range(k * k)]


def assemble_cells(cells, k: int):
    """list of K² [B] cell vectors → [B, K, K]."""
    return jnp.stack(cells, axis=0).T.reshape(-1, k, k)


def peek_cells(cells, k: int):
    """All-four-direction merge results in cell-major form.

    Returns (dir_cells, deltas, changed): dir_cells[a] is the K²-list of
    merged [B] cell vectors for action a; deltas[a]/changed[a] are [B]
    score-delta / board-changed vectors. Action order: up, down, left,
    right (board.py:129).
    """
    dir_cells, deltas, changed = [], [], []
    for action in range(4):
        new_cells = [None] * (k * k)
        score = jnp.zeros(cells[0].shape, jnp.int32)
        ch = jnp.zeros(cells[0].shape, bool)
        for row in _direction_rows(action, k):
            merged, s, c = _merge_lanes([cells[i] for i in row])
            for i, out in zip(row, merged):
                new_cells[i] = out
            score = score + s
            ch = ch | c
        dir_cells.append(new_cells)
        deltas.append(score)
        changed.append(ch)
    return dir_cells, deltas, changed


def _legal_line(line):
    """(movable_front, movable_back) bool masks for one k-cell line.

    A move toward the line's front is legal iff the line has an adjacent
    equal non-zero pair, or a zero somewhere in front of a non-zero (a
    tile can slide); symmetrically for the back. Exactly "applying the
    move changes the line" (board.py:128-135 semantics) without running
    the merge network — pinned against the merge kernel exhaustively in
    tests/test_engine.py.

    Why the equivalence holds for ALL exponent values, not just the
    tested range: (⇐) a zero in front of a non-zero means compression
    moves that tile, changing the line; with no such hole the non-zeros
    form a dense front prefix, where an adjacent equal pair merges and
    changes its cell. (⇒) with neither condition the line is a dense
    prefix of pairwise-unequal values — compress and merge are both
    identity. Both this scan and the merge kernel's changed-ness depend
    only on the line's zero pattern and adjacent-equality pattern, never
    on tile magnitudes; every such pattern on k cells is realized with
    exponents {0..k}, so the capped exhaustive enumeration in the tests
    covers every equivalence class of lines.
    """
    k = len(line)
    nz = [c != 0 for c in line]
    pair = jnp.zeros_like(nz[0])
    for i in range(k - 1):
        pair = pair | (nz[i] & (line[i] == line[i + 1]))
    # suffix[i] = any non-zero at j > i;  prefix[i] = any non-zero at j < i
    front = pair
    suffix = jnp.zeros_like(nz[0])
    for i in reversed(range(k - 1)):
        suffix = suffix | nz[i + 1]
        front = front | (~nz[i] & suffix)
    back = pair
    prefix = jnp.zeros_like(nz[0])
    for i in range(1, k):
        prefix = prefix | nz[i - 1]
        back = back | (~nz[i] & prefix)
    return front, back


def legal_cells(cells, k: int):
    """Legality bool [B] masks for all four directions, straight from the
    board — no merge networks (~4× less work than ``peek_cells`` when
    only legality is needed). Order: up, down, left, right."""
    legal = [None] * 4
    for j in range(k):  # columns → up/down
        up, down = _legal_line([cells[r * k + j] for r in range(k)])
        legal[UP] = up if legal[UP] is None else (legal[UP] | up)
        legal[DOWN] = down if legal[DOWN] is None else (legal[DOWN] | down)
    for r in range(k):  # rows → left/right
        left, right = _legal_line([cells[r * k + j] for j in range(k)])
        legal[LEFT] = left if legal[LEFT] is None else (legal[LEFT] | left)
        legal[RIGHT] = (
            right if legal[RIGHT] is None else (legal[RIGHT] | right)
        )
    return legal


def _merge_lanes_fast(v):
    """Merge toward the front with the short post-merge compress: after a
    full compress, a merge pass can only open single-width, non-adjacent
    gaps (a merge at i zeroes i+1 and two merges cannot be adjacent), and
    for k=4 one left-to-right conditional-shift pass over i=1,2 closes
    every such gap. k=4 only (callers fall back to ``_merge_lanes``
    otherwise); exhaustively pinned against ``_merge_lanes`` in
    tests/test_engine.py. Returns (merged, score) — no changed mask.
    """
    k = len(v)
    assert k == 4, "fast compress proof is k=4-specific"
    v = _compress(list(v))
    score = jnp.zeros(v[0].shape, jnp.int32)
    one = jnp.int32(1)
    for i in range(k - 1):
        m = (v[i] != 0) & (v[i] == v[i + 1])
        v[i] = jnp.where(m, v[i] + 1, v[i])
        v[i + 1] = jnp.where(m, 0, v[i + 1])
        score = score + jnp.where(
            m, jnp.left_shift(one, v[i].astype(jnp.int32)), 0
        )
    for i in range(1, k - 1):
        z = v[i] == 0
        v[i] = jnp.where(z, v[i + 1], v[i])
        v[i + 1] = jnp.where(z, jnp.zeros_like(v[i + 1]), v[i + 1])
    return v, score


def apply_chosen_cells(cells, actions: jax.Array, k: int):
    """Merge only each board's CHOSEN direction (vs ``peek_cells``, which
    merges all four and discards three): gather every board's lines into
    canonical toward-the-front order with per-lane selects, run the merge
    network once, scatter back. Returns (new_cells, delta). The legality
    the policy needs comes from ``legal_cells``."""
    a_up = actions == UP
    a_left = actions == LEFT
    a_vert = actions <= DOWN
    merge = _merge_lanes_fast if k == 4 else (
        lambda line: _merge_lanes(line)[:2]
    )

    def pick(up_i, down_i, left_i, right_i):
        vert = jnp.where(a_up, cells[up_i], cells[down_i])
        horz = jnp.where(a_left, cells[left_i], cells[right_i])
        return jnp.where(a_vert, vert, horz)

    merged = [None] * k
    delta = None
    for j in range(k):
        line = [
            pick(
                i * k + j,            # up: column j top→bottom
                (k - 1 - i) * k + j,  # down: column j bottom→top
                j * k + i,            # left: row j left→right
                j * k + (k - 1 - i),  # right: row j right→left
            )
            for i in range(k)
        ]
        m, s = merge(line)
        merged[j] = m
        delta = s if delta is None else delta + s

    out = []
    for r in range(k):
        for c in range(k):
            vert = jnp.where(a_up, merged[c][r], merged[c][k - 1 - r])
            horz = jnp.where(a_left, merged[r][c], merged[r][k - 1 - c])
            out.append(jnp.where(a_vert, vert, horz))
    return out, delta


def select_cells(dir_cells, actions: jax.Array):
    """Per-env action select over the four merged boards, cell by cell —
    three selects per cell instead of materializing [B, 4, K, K] and
    gathering."""
    n = len(dir_cells[0])
    a = actions
    out = []
    for i in range(n):
        up_or_down = jnp.where(a == UP, dir_cells[UP][i], dir_cells[DOWN][i])
        left_or_right = jnp.where(a == LEFT, dir_cells[LEFT][i], dir_cells[RIGHT][i])
        out.append(jnp.where(a <= DOWN, up_or_down, left_or_right))
    return out


def _select_lane(vals, actions: jax.Array):
    """4-way select of [B] vectors by action."""
    up_or_down = jnp.where(actions == UP, vals[UP], vals[DOWN])
    left_or_right = jnp.where(actions == LEFT, vals[LEFT], vals[RIGHT])
    return jnp.where(actions <= DOWN, up_or_down, left_or_right)


def _spawn_cells(cells, did_move, key, p_four: float = 0.5):
    """Spawn one 2-or-4 tile per board where ``did_move`` — in cell-major
    form (see ``_spawn_batch`` for semantics)."""
    empties = [c == 0 for c in cells]
    n_empty = jnp.zeros(cells[0].shape, jnp.int32)
    for e in empties:
        n_empty = n_empty + e
    k_cell, k_val = jax.random.split(key)
    u = jax.random.randint(k_cell, cells[0].shape, 0, jnp.maximum(n_empty, 1))
    val = jnp.where(
        jax.random.bernoulli(k_val, p_four, cells[0].shape), 2, 1
    ).astype(cells[0].dtype)
    running = jnp.zeros(cells[0].shape, jnp.int32)
    out = []
    for c, e in zip(cells, empties):
        target = did_move & e & (running == u)
        out.append(jnp.where(target, val, c))
        running = running + e
    return out


def peek_all(boards: jax.Array):
    """Candidate boards, score deltas and legality for all four moves.

    The reference computes this with 4 full ``peek_action`` clones per step
    (board.py:128-135). Here one fused call produces:

    Returns:
      moved:  int32[B, 4, K, K] — board after each move (pre-spawn).
      deltas: int32[B, 4]       — merge-score delta of each move.
      legal:  bool[B, 4]        — move changes the board
                                  (board.py:132-134 semantics).
    Action order: up, down, left, right.

    This array-materializing form serves tests and ad-hoc callers; the
    hot paths (``env_step``, the train loop) stay in cell-major form.
    """
    k = boards.shape[-1]
    cells = split_cells(boards)
    dir_cells, deltas, changed = peek_cells(cells, k)
    moved = jnp.stack([assemble_cells(dc, k) for dc in dir_cells], axis=1)
    return moved, jnp.stack(deltas, axis=-1), jnp.stack(changed, axis=-1)


def env_step(
    state: EnvState,
    policy_fn,
    key: jax.Array,
    p_four: float = 0.5,
):
    """One fused lockstep env step for all B envs.

    ``policy_fn(key, boards, legal) -> (actions, aux)`` is evaluated
    between the legality computation and the move apply. Two VPU-economy
    moves ported back from the Pallas kernel (t48/ops/pallas_step.py):
    legality comes from direct hole/pair line scans (``legal_cells``, no
    merge networks), and only the *chosen* direction is merged
    (``apply_chosen_cells``) — vs the previous all-four-merges + select.

    Returns (new_state, actions, reward int32[B], done_pre bool[B],
    legal bool[B, 4], aux) — ``done_pre`` is the reference's pre-action
    availability check (dqn_lib.py:17-18); ``aux`` is whatever the policy
    returned (Q-values etc.).
    """
    k = state.boards.shape[-1]
    k_policy, k_spawn = jax.random.split(key)
    cells = split_cells(state.boards)
    legal_list = legal_cells(cells, k)
    legal = jnp.stack(legal_list, axis=-1)
    done_pre = ~legal.any(-1)

    actions, aux = policy_fn(k_policy, state.boards, legal)

    sel_cells, sel_delta = apply_chosen_cells(cells, actions, k)
    did_move = _select_lane(legal_list, actions)
    spawned = _spawn_cells(sel_cells, did_move, k_spawn, p_four)
    new_cells = [
        jnp.where(did_move, s, o) for s, o in zip(spawned, cells)
    ]
    reward = jnp.where(did_move, sel_delta, 0)
    new_state = EnvState(
        boards=assemble_cells(new_cells, k),
        merge_scores=state.merge_scores + reward,
        step_counts=state.step_counts + 1,
    )
    return new_state, actions, reward, done_pre, legal, aux


def env_step_cm(
    boards_cm: jax.Array,
    legal_cm: jax.Array,
    actions: jax.Array,
    key: jax.Array,
    p_four: float = 0.5,
):
    """Cell-major lockstep env step with carried legality and external
    actions — the XLA twin of the Pallas training kernel
    (t48/ops/pallas_step.pallas_env_step), sharing its exact contract:

    Args:
      boards_cm: int32[K², B] cell-major boards.
      legal_cm:  int32[4, B] 0/1 legality of the CURRENT boards.
      actions:   int32[B].
      key:       jax PRNG key (spawn + reset randomness — threefry, a
                 different stream than the kernel's TPU-native PRNG).

    Returns (new_cm, pre_cm, new_legal_cm, reward): the post-reset carry,
    the post-action pre-reset boards, the new boards' legality and the
    merge-score reward (0 on illegal/terminal no-ops). Terminal boards
    (no legal move) auto-reset to fresh two-tile boards.
    """
    n = boards_cm.shape[0]
    k = int(round(n ** 0.5))
    cells = [boards_cm[i] for i in range(n)]
    legal_list = [legal_cm[a] != 0 for a in range(4)]
    done = ~(
        (legal_list[0] | legal_list[1]) | (legal_list[2] | legal_list[3])
    )
    k_spawn, k_r1, k_r2 = jax.random.split(key, 3)
    sel, delta = apply_chosen_cells(cells, actions, k)
    did = _select_lane(legal_list, actions)
    spawned = _spawn_cells(sel, did, k_spawn, p_four)
    pre = [jnp.where(did, s, c) for s, c in zip(spawned, cells)]
    reward = jnp.where(did, delta, 0)
    # auto-reset terminal envs: zero the board, two fresh spawns
    zeroed = [jnp.where(done, 0, c) for c in pre]
    fresh = _spawn_cells(zeroed, done, k_r1, p_four)
    fresh = _spawn_cells(fresh, done, k_r2, p_four)
    new_legal = legal_cells(fresh, k)
    return (
        jnp.stack(fresh),
        jnp.stack(pre),
        jnp.stack([l.astype(jnp.int32) for l in new_legal]),
        reward,
    )


# ---------------------------------------------------------------------------
# Spawning / reset
# ---------------------------------------------------------------------------


def _spawn_batch(boards: jax.Array, key: jax.Array, p_four: float = 0.5):
    """Place a 2 or 4 in a uniformly random empty cell of every board.

    Mirrors ``_populate_empty_cell`` (board.py:41-51): uniform cell choice
    over row-major empties; tile value 4 with probability ``p_four``
    (reference: uniform 0.5 via ``np.random.choice([2,4])``, board.py:49).
    Boards with no empty cell are returned unchanged (the reference never
    spawns on a full board because no-op moves skip the spawn).

    Implemented on the cell-major core (``_spawn_cells``).
    """
    k = boards.shape[-1]
    cells = split_cells(boards)
    everywhere = jnp.ones(cells[0].shape, bool)
    return assemble_cells(_spawn_cells(cells, everywhere, key, p_four), k)


def _spawn(board: jax.Array, key: jax.Array, p_four: float = 0.5):
    """Single-board spawn (convenience/test wrapper over the batch form)."""
    return _spawn_batch(board[None], key, p_four)[0]


@functools.partial(jax.jit, static_argnames=("batch", "k", "p_four"))
def new_boards(key: jax.Array, batch: int, k: int = 4, p_four: float = 0.5):
    """int32[batch, k, k] of freshly initialized boards — two spawns each
    (board.py:18-20). Jitted: eager per-op dispatch is pathologically slow
    on remote-attached accelerators."""
    k1, k2 = jax.random.split(key)
    b = jnp.zeros((batch, k, k), jnp.int32)
    b = _spawn_batch(b, k1, p_four)
    return _spawn_batch(b, k2, p_four)


def init(key: jax.Array, batch: int, k: int = 4, p_four: float = 0.5) -> EnvState:
    """Initialize a batch of environments."""
    return EnvState(
        boards=new_boards(key, batch, k=k, p_four=p_four),
        merge_scores=jnp.zeros((batch,), jnp.int32),
        step_counts=jnp.zeros((batch,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Stepping
# ---------------------------------------------------------------------------


def step(state: EnvState, actions: jax.Array, key: jax.Array, p_four: float = 0.5):
    """Step with externally chosen actions (fused cell-major path).

    Returns (new_state, reward int32[B], done bool[B]) — ``done`` is
    computed on the *pre-action* board, matching the reference's
    availability check before acting (dqn_lib.py:17-18).
    """
    new_state, _, reward, done, _, _ = env_step(
        state, lambda kk, b, legal: (actions, None), key, p_four
    )
    return new_state, reward, done


def reset_where(state: EnvState, done: jax.Array, key: jax.Array, p_four: float = 0.5):
    """Re-initialize the environments flagged in ``done``."""
    batch = done.shape[0]
    k = state.boards.shape[-1]
    k1, k2 = jax.random.split(key)
    zeros = jnp.zeros((batch, k, k), jnp.int32)
    cells = split_cells(zeros)
    cells = _spawn_cells(cells, done, k1, p_four)
    cells = _spawn_cells(cells, done, k2, p_four)
    fresh = assemble_cells(cells, k)
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
