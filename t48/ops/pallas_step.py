"""Pallas TPU kernel: fully fused multi-step 2048 rollout.

The XLA path (t48/env/engine.py) runs one env step per ``lax.scan``
iteration: boards round-trip through HBM every step and the three
``jax.random`` calls per step burn VPU time in threefry. This kernel runs
the WHOLE rollout inside one ``pallas_call``:

- boards live in VMEM in cell-major layout ``int32[16, BLOCK_B]`` (cells
  in sublanes, batch in lanes — every vector op is full);
- a ``fori_loop`` steps ``iters`` times per grid program: legality for
  all four directions, uniform-random-legal action, merge, spawn and
  auto-reset, with zero HBM traffic between steps;
- randomness comes from the TPU-native PRNG (``pltpu.prng_seed`` /
  ``prng_random_bits``), one 32-bit draw per purpose per step;
- three VPU-economy moves, each exhaustively pinned against the XLA
  engine in tests/test_pallas.py: legality comes from direct
  hole/pair line scans instead of four full merge networks
  (``_legal_all``); only the *chosen* direction is merged, via a
  canonicalize → merge-once → scatter select network
  (``_apply_chosen``); the post-merge compaction is 2 conditional
  shifts instead of a full 6-step bubble (see ``_merge_lanes``).
  Together ~3.5B env-steps/s steady-state on one v5e chip.

The merge/spawn semantics are the engine's (single merge per pair, no
spawn on no-op, uniform 2/4) — cross-validated against the XLA engine in
tests/test_pallas.py. Reference dynamics: board.py:41-51, 92-183.

This powers the random-policy rollout surfaces (throughput benchmark,
baseline evaluation at scale); the training loop keeps the XLA path
because the policy network forward sits in the middle of its step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCELLS = 16
K = 4

# rows of cell indices for each direction, merge-order first
# (engine._direction_rows; reference board.py:147-183)
_DIR_ROWS = {
    0: [[r * K + c for r in range(K)] for c in range(K)],          # up
    1: [[r * K + c for r in reversed(range(K))] for c in range(K)],  # down
    2: [[r * K + c for c in range(K)] for r in range(K)],          # left
    3: [[r * K + c for c in reversed(range(K))] for r in range(K)],  # right
}


def _merge_lanes(v, with_changed: bool = True):
    """compress→merge→short-compress on 4 lane vectors (engine._merge_lanes).

    Masks are int32 0/1 throughout — Mosaic cannot select on i1 vector
    operands, so booleans only ever appear as ``where`` conditions.

    The trailing compress is 2 conditional shifts, not the full 6-step
    bubble: after a full compress the zeros a merge pass can introduce sit
    only at positions {1}, {2}, {3} or {1,3} of the non-zero prefix
    (a merge at i zeroes i+1, and two merges cannot be adjacent), and a
    single left-to-right pass over i=1,2 closes every such gap.
    Exhaustively verified against the engine in tests/test_pallas.py.
    """
    k = len(v)
    orig = v
    v = list(v)

    def compress(v):
        for p in range(k - 1):
            for i in range(k - 1 - p):
                a, b = v[i], v[i + 1]
                az = a == 0
                v[i] = jnp.where(az, b, a)
                v[i + 1] = jnp.where(az, jnp.zeros_like(b), b)
        return v

    v = compress(v)
    score = jnp.zeros_like(v[0])
    for i in range(k - 1):
        m = (v[i] != 0) & (v[i] == v[i + 1])
        v[i] = jnp.where(m, v[i] + 1, v[i])
        v[i + 1] = jnp.where(m, 0, v[i + 1])
        score = score + jnp.where(m, jnp.left_shift(jnp.int32(1), v[i]), 0)
    for i in range(1, k - 1):  # close the (single-width) gaps merges opened
        az = v[i] == 0
        v[i] = jnp.where(az, v[i + 1], v[i])
        v[i + 1] = jnp.where(az, jnp.zeros_like(v[i + 1]), v[i + 1])
    if not with_changed:
        return v, score, None
    changed = jnp.zeros_like(v[0])
    for a, b in zip(v, orig):
        changed = jnp.where(a != b, 1, changed)
    return v, score, changed


def _legal_line(line):
    """(movable_front, movable_back) bool masks for one 4-cell line.

    A move toward the line's front is legal iff the line has an adjacent
    equal non-zero pair, or a zero in front of a non-zero (a tile can
    slide); symmetrically for the back. This is exactly "applying the
    move changes the line" (board.py:128-135 semantics) without running
    the merge network — verified against ``_peek`` in tests/test_pallas.py.

    The equivalence is structural, valid for all exponent values: a hole
    in front of a tile makes compression move it; with no hole the
    non-zeros are a dense prefix where an adjacent equal pair merges;
    with neither, compress and merge are identity. Both sides depend only
    on the zero/adjacent-equality pattern (never magnitudes), and every
    such pattern on 4 cells is realized within the tested exponent range,
    so the capped enumeration covers every equivalence class
    (t48/env/engine._legal_line has the full argument).
    """
    nz = [c != 0 for c in line]
    z = [jnp.logical_not(n) for n in nz]
    pair = jnp.logical_or(
        jnp.logical_or(
            nz[0] & (line[0] == line[1]), nz[1] & (line[1] == line[2])
        ),
        nz[2] & (line[2] == line[3]),
    )
    s2 = nz[2] | nz[3]  # suffix "any non-zero"
    s1 = nz[1] | s2
    front = (z[0] & s1) | (z[1] & s2) | (z[2] & nz[3])
    p1 = nz[0] | nz[1]  # prefix "any non-zero"
    p2 = p1 | nz[2]
    back = (nz[0] & z[1]) | (p1 & z[2]) | (p2 & z[3])
    return pair | front, pair | back


def _legal_all(cells):
    """Legality bool masks for all four directions, directly from the
    board (no merges). Order matches ACTIONS: up, down, left, right."""
    legal = [None] * 4
    for j in range(K):  # columns → up/down
        col = [cells[r * K + j] for r in range(K)]
        up, down = _legal_line(col)
        legal[0] = up if legal[0] is None else (legal[0] | up)
        legal[1] = down if legal[1] is None else (legal[1] | down)
    for r in range(K):  # rows → left/right
        row = [cells[r * K + j] for j in range(K)]
        left, right = _legal_line(row)
        legal[2] = left if legal[2] is None else (legal[2] | left)
        legal[3] = right if legal[3] is None else (legal[3] | right)
    return legal


def _apply_chosen(cells, action):
    """Merge only the chosen direction: gather each board's lines into
    canonical toward-the-front order with per-lane selects, run the merge
    network once, and scatter back. Returns (new_cells, delta).

    Replaces computing all four direction merges and discarding three —
    the legality the policy needs comes from ``_legal_all``.
    """
    a_up = action == 0
    a_left = action == 2
    a_vert = action <= 1

    def pick(up_i, down_i, left_i, right_i):
        vert = jnp.where(a_up, cells[up_i], cells[down_i])
        horz = jnp.where(a_left, cells[left_i], cells[right_i])
        return jnp.where(a_vert, vert, horz)

    merged = [[None] * K for _ in range(K)]
    delta = None
    for j in range(K):
        line = [
            pick(
                i * K + j,            # up: column j top→bottom
                (K - 1 - i) * K + j,  # down: column j bottom→top
                j * K + i,            # left: row j left→right
                j * K + (K - 1 - i),  # right: row j right→left
            )
            for i in range(K)
        ]
        m, s, _ = _merge_lanes(line, with_changed=False)
        merged[j] = m
        delta = s if delta is None else delta + s

    out = []
    for r in range(K):
        for c in range(K):
            vert = jnp.where(a_up, merged[c][r], merged[c][K - 1 - r])
            horz = jnp.where(a_left, merged[r][c], merged[r][K - 1 - c])
            out.append(jnp.where(a_vert, vert, horz))
    return out, delta


def _reset_spawn2(cells, done, rand1, rand2, rand_val):
    """Where ``done``, replace the board with a fresh one: zero it and
    spawn two tiles in two distinct uniform cells (the reference's
    ``Board2048.__init__`` double ``_populate_empty_cell``,
    board.py:18-20). On an empty board the empty-cell scan is just the
    cell index, and the second draw maps uniform [0,15) around the first
    via ``u2 = u2' + (u2' >= u1)``."""
    u1 = _uniform_index(rand1, jnp.full(rand1.shape, NCELLS, jnp.int32))
    u2p = _uniform_index(rand2, jnp.full(rand2.shape, NCELLS - 1, jnp.int32))
    u2 = u2p + jnp.where(u2p >= u1, 1, 0)
    val1 = jnp.where((rand_val & 1) == 1, 2, 1)
    val2 = jnp.where((rand_val & 2) == 2, 2, 1)
    out = []
    for i, c in enumerate(cells):
        fresh = jnp.where(u1 == i, val1, jnp.where(u2 == i, val2, 0))
        out.append(jnp.where(done, fresh.astype(c.dtype), c))
    return out


def _peek(cells):
    """All-direction merges on the 16 cell vectors. ``changed`` entries
    are int32 0/1 masks."""
    dir_cells, deltas, changed = [], [], []
    for action in range(4):
        new_cells = [None] * NCELLS
        score = jnp.zeros_like(cells[0])
        ch = jnp.zeros_like(cells[0])
        for row in _DIR_ROWS[action]:
            merged, s, c = _merge_lanes([cells[i] for i in row])
            for i, out in zip(row, merged):
                new_cells[i] = out
            score = score + s
            ch = jnp.where(c != 0, 1, ch)
        dir_cells.append(new_cells)
        deltas.append(score)
        changed.append(ch)
    return dir_cells, deltas, changed


def _rand_lanes(shape):
    """Uniform random bits as non-negative int32 lanes (bit 31 cleared).

    Stays in int32 end-to-end — Mosaic's unsigned paths are narrower."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return bits & jnp.int32(0x7FFFFFFF)


def _uniform_index(rand_i31, n):
    """Map 31 random bits to [0, n) (fixed-point multiply, no modulo
    bias; n must be >= 1)."""
    r = rand_i31.astype(jnp.float32) * (1.0 / 2147483648.0)
    idx = jnp.floor(r * n.astype(jnp.float32)).astype(jnp.int32)
    return jnp.clip(idx, 0, n - 1)


def _spawn(cells, did, rand_cell, rand_val):
    """Spawn a 2/4 uniformly in an empty cell where ``did != 0`` (engine
    ``_spawn_cells`` semantics, board.py:41-51). ``did`` is an int32 0/1
    mask."""
    empties = [jnp.where(c == 0, 1, 0) for c in cells]
    n_empty = jnp.zeros_like(cells[0])
    for e in empties:
        n_empty = n_empty + e
    u = _uniform_index(rand_cell, jnp.maximum(n_empty, 1))
    val = jnp.where((rand_val & 1) == 1, 2, 1).astype(cells[0].dtype)
    running = jnp.zeros_like(cells[0])
    out = []
    for c, e in zip(cells, empties):
        target = (did != 0) & (e != 0) & (running == u)
        out.append(jnp.where(target, val, c))
        running = running + e
    return out


def _rollout_kernel(seed_ref, boards_ref, out_boards_ref, score_ref,
                    episodes_ref, steps_ref, *, iters: int):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    block = boards_ref.shape[1]
    # Work in (8, block//8) tiles: a (1, block) vector occupies a single
    # sublane of the 8×128 VPU; folding the batch into the sublane dim
    # fills all eight.
    sub = 8
    lanes = block // sub

    init = (
        boards_ref[:, :].reshape(NCELLS, sub, lanes),
        jnp.zeros((sub, lanes), jnp.int32),  # cumulative reward in block
        jnp.zeros((sub, lanes), jnp.int32),  # episodes completed
    )

    def body(_, carry):
        boards, score_acc, episodes = carry
        cells = [boards[i] for i in range(NCELLS)]
        legal = _legal_all(cells)  # 4 bool masks, no merges
        done = jnp.logical_not(
            (legal[0] | legal[1]) | (legal[2] | legal[3])
        )

        # uniform over legal actions: random scores, −1 on illegal, argmax
        rand = _rand_lanes((4 * sub, lanes))
        best_score = jnp.full((sub, lanes), -1, jnp.int32)
        action = jnp.zeros((sub, lanes), jnp.int32)
        for a in range(4):
            s = jnp.where(legal[a], rand[a * sub : (a + 1) * sub, :], -1)
            take = s > best_score
            best_score = jnp.where(take, s, best_score)
            action = jnp.where(take, a, action)

        # merge the chosen direction only
        sel, delta = _apply_chosen(cells, action)
        did = (
            ((action == 0) & legal[0])
            | ((action == 1) & legal[1])
            | ((action == 2) & legal[2])
            | ((action == 3) & legal[3])
        )

        spawn_bits = _rand_lanes((2 * sub, lanes))
        sel = _spawn(
            sel, jnp.where(did, 1, 0), spawn_bits[0:sub, :], spawn_bits[sub:, :]
        )
        new_cells = [jnp.where(did, s, c) for s, c in zip(sel, cells)]
        score_acc = score_acc + jnp.where(did, delta, 0)

        # auto-reset finished envs: fresh board with two uniform spawns
        reset_bits = _rand_lanes((3 * sub, lanes))
        new_cells = _reset_spawn2(
            new_cells,
            done,
            reset_bits[0:sub, :],
            reset_bits[sub : 2 * sub, :],
            reset_bits[2 * sub :, :],
        )
        episodes = episodes + jnp.where(done, 1, 0)

        boards = jnp.stack(new_cells, axis=0)
        return boards, score_acc, episodes

    boards, score_acc, episodes = jax.lax.fori_loop(0, iters, body, init)
    out_boards_ref[:, :] = boards.reshape(NCELLS, block)
    score_ref[:, :] = score_acc.reshape(1, block)
    episodes_ref[:, :] = episodes.reshape(1, block)
    steps_ref[0, 0] = iters * block


@functools.partial(jax.jit, static_argnames=("iters", "block", "interpret"))
def pallas_rollout(boards_cm: jax.Array, seed: jax.Array, iters: int,
                   block: int = 1024, interpret: bool = False):
    """Run ``iters`` random-legal-policy steps with auto-reset.

    Args:
      boards_cm: int32[16, B] cell-major boards (B multiple of ``block``).
      seed:      int32 scalar PRNG seed.
      iters:     steps per env.
      interpret: run in the Pallas interpreter (CPU testing).

    Returns (boards_cm, reward_sums int32[1, B], episodes int32[1, B]).
    """
    n = boards_cm.shape[1]
    grid = n // block
    assert grid * block == n, (n, block)
    out = pl.pallas_call(
        functools.partial(_rollout_kernel, iters=iters),
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NCELLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NCELLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NCELLS, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
    )(jnp.asarray(seed, jnp.int32).reshape(1), boards_cm)
    boards, scores, episodes, _ = out
    return boards, scores, episodes


# ---------------------------------------------------------------------------
# Single-step env kernel for the TRAINING loop.
#
# The rollout kernel above fuses whole rollouts but cannot host a policy
# network forward (the MXU matmul lives in XLA-land). The training loop
# needs: legality → policy forward (XLA) → apply + spawn + reset. This
# kernel is the second half of that sandwich, one env step per call:
#
#   inputs : boards (cell-major), this step's legality (carried from the
#            previous call), the policy's actions, a per-iteration seed
#   outputs: post-action PRE-reset boards (the replay transition's
#            next_state and the episode log's terminal board), the
#            post-reset boards (the carry), the NEXT legality (consumed
#            by the next iteration's policy — computing it here saves
#            recomputing it in XLA), and the merge-score reward.
#
# Replacing the XLA env step (engine.env_step + reset_where: ~350 tiny
# [B]-shaped VPU ops per iteration, each using 1 of 8 sublanes, plus 3
# threefry draws) with one fused kernel in (8, B/8) tiling took the env
# stage of the training iteration from ~171µs to ~5µs at env_batch=4096
# (benchmarks/breakdown_r03.json vs _r02).
#
# RNG: TPU-native PRNG seeded per call with a deterministic function of
# the training step counter — a DIFFERENT stream than the XLA path's
# threefry (documented divergence; dynamics semantics are identical and
# pinned against the engine in tests/test_pallas.py).
# ---------------------------------------------------------------------------


def _env_step_core(cells, legal, action, spawn_bits, reset_bits):
    """Pure single-step core (no PRNG): apply the chosen move where legal,
    spawn where moved, auto-reset where terminal. Testable on CPU with
    injected random bits (tests/test_pallas.py); the kernel feeds it TPU
    PRNG draws.

    Args:
      cells:      16 lane arrays (the board).
      legal:      4 int 0/1 lane arrays (current legality).
      action:     int lane array (0..3).
      spawn_bits: int31 lane array [2, ...] (cell pick, value pick).
      reset_bits: int31 lane array [3, ...] (two cells, values).

    Returns (fin, pre, new_legal 0/1, reward, done 0/1) — fin is the
    post-reset carry, pre the post-action pre-reset boards.
    """
    done = jnp.where(
        ((legal[0] | legal[1]) | (legal[2] | legal[3])) != 0, 0, 1
    )
    # merge the chosen direction only; a move "happens" iff it is legal
    sel, delta = _apply_chosen(cells, action)
    did = (
        ((action == 0) & (legal[0] != 0))
        | ((action == 1) & (legal[1] != 0))
        | ((action == 2) & (legal[2] != 0))
        | ((action == 3) & (legal[3] != 0))
    )
    sel = _spawn(sel, jnp.where(did, 1, 0), spawn_bits[0], spawn_bits[1])
    pre = [jnp.where(did, s, c) for s, c in zip(sel, cells)]
    reward = jnp.where(did, delta, 0)

    # auto-reset terminal envs (the loop's reset_where, engine.py:503-518)
    fin = _reset_spawn2(
        pre, done != 0, reset_bits[0], reset_bits[1], reset_bits[2]
    )
    new_legal = [jnp.where(l, 1, 0) for l in _legal_all(fin)]
    return fin, pre, new_legal, reward, done


def _env_step_kernel(seed_ref, boards_ref, legal_ref, actions_ref,
                     out_boards_ref, out_pre_ref, out_legal_ref, reward_ref):
    # Two seed words: the full 64 bits of the per-iteration threefry key.
    # A single 32-bit word collides by birthday statistics after ~77k
    # iterations (flagship runs millions), replaying one iteration's
    # spawn stream (r04 advisor finding); seeding with both words makes
    # collisions a 64-bit event.
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    block = boards_ref.shape[1]
    sub = 8
    lanes = block // sub

    boards = boards_ref[:, :].reshape(NCELLS, sub, lanes)
    legal_in = legal_ref[:, :].reshape(4, sub, lanes)
    action = actions_ref[:, :].reshape(sub, lanes)

    cells = [boards[i] for i in range(NCELLS)]
    legal = [legal_in[a] for a in range(4)]
    spawn_bits = _rand_lanes((2 * sub, lanes)).reshape(2, sub, lanes)
    reset_bits = _rand_lanes((3 * sub, lanes)).reshape(3, sub, lanes)
    fin, pre, new_legal, reward, _ = _env_step_core(
        cells, legal, action, spawn_bits, reset_bits
    )

    out_pre_ref[:, :] = jnp.stack(pre, axis=0).reshape(NCELLS, block)
    out_boards_ref[:, :] = jnp.stack(fin, axis=0).reshape(NCELLS, block)
    out_legal_ref[:, :] = jnp.stack(new_legal, axis=0).reshape(4, block)
    reward_ref[:, :] = reward.reshape(1, block)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_env_step(
    boards_cm: jax.Array,
    legal_cm: jax.Array,
    actions: jax.Array,
    seed: jax.Array,
    interpret: bool = False,
):
    """One policy-driven env step for all B envs, fused in VMEM.

    Args:
      boards_cm: int32[16, B] cell-major boards (any B ≥ 1: batches that
                 are not a multiple of the 1024-lane block are padded
                 with dummy envs and sliced back — see below).
      legal_cm:  int32[4, B] 0/1 legality of the CURRENT boards (as
                 produced by a previous call's ``new_legal``, or
                 ``legal_to_cell_major`` at chunk entry).
      actions:   int32[B] chosen actions (0..3).
      seed:      int32 scalar or int32[2]; must differ per step for fresh
                 randomness. Pass BOTH words of a threefry key — a single
                 32-bit stream repeats by birthday statistics within a
                 long run (r04 advisor finding).

    Returns (new_boards_cm int32[16,B] — post-reset carry,
             pre_reset_cm int32[16,B] — post-action pre-reset boards,
             new_legal_cm int32[4,B] — legality of new_boards,
             reward int32[B] — merge-score delta, 0 on no-op/terminal).

    Block padding: the kernel folds each 1024-lane block into the VPU's
    (8 sublanes, 128 lanes) tiles. Rather than reject B % 1024 != 0 (the
    r04 constraint, which silently demoted the exact-batch b2560
    flagship and odd per-shard batches to the XLA env), the wrapper pads
    the batch to the next block multiple with zero boards (legality 0 →
    the kernel treats them as terminal and resets them; their outputs
    are sliced off). Full blocks keep the exact batch→tile mapping and
    PRNG stream of the unpadded call; the pad costs one partially-wasted
    block of VPU work (~µs) and ~O(pad) HBM traffic.
    """
    n = boards_cm.shape[1]
    block = 1024  # (8 sublanes × 128 lanes) folding: block % 1024 == 0
    pad = (-n) % block
    if pad:
        boards_cm = jnp.pad(boards_cm, ((0, 0), (0, pad)))
        legal_cm = jnp.pad(legal_cm, ((0, 0), (0, pad)))
        actions = jnp.pad(actions, ((0, pad),))
    nb = n + pad
    grid = nb // block
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed.shape[0] == 1:  # legacy scalar seed: zero second word
        seed = jnp.concatenate([seed, jnp.zeros((1,), jnp.int32)])
    assert seed.shape[0] == 2, seed.shape
    out = pl.pallas_call(
        _env_step_kernel,
        grid=(grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NCELLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NCELLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NCELLS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NCELLS, nb), jnp.int32),
            jax.ShapeDtypeStruct((NCELLS, nb), jnp.int32),
            jax.ShapeDtypeStruct((4, nb), jnp.int32),
            jax.ShapeDtypeStruct((1, nb), jnp.int32),
        ],
    )(
        seed,
        boards_cm,
        legal_cm,
        actions.astype(jnp.int32).reshape(1, nb),
    )
    new_boards, pre, new_legal, reward = out
    if pad:
        new_boards = new_boards[:, :n]
        pre = pre[:, :n]
        new_legal = new_legal[:, :n]
        reward = reward[:, :n]
    return new_boards, pre, new_legal, reward[0]


def legal_to_cell_major(boards: jax.Array) -> jax.Array:
    """int32[4, B] 0/1 legality of [B, 4, 4] boards (chunk-entry seed for
    the carried legality of ``pallas_env_step``)."""
    from t48.env import engine

    cells = engine.split_cells(boards)
    legal = engine.legal_cells(cells, K)
    return jnp.stack([l.astype(jnp.int32) for l in legal], axis=0)


def to_cell_major(boards: jax.Array) -> jax.Array:
    """[B, 4, 4] → int32[16, B]."""
    b = boards.shape[0]
    return boards.reshape(b, NCELLS).T.astype(jnp.int32)


def from_cell_major(cm: jax.Array) -> jax.Array:
    """int32[16, B] → [B, 4, 4]."""
    return cm.T.reshape(-1, K, K)
