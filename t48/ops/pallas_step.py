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
  ``prng_random_bits``), one 32-bit draw per purpose per step.

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


def _merge_lanes(v):
    """compress→merge→compress on 4 lane vectors (engine._merge_lanes).

    Masks are int32 0/1 throughout — Mosaic cannot select on i1 vector
    operands, so booleans only ever appear as ``where`` conditions.
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
    v = compress(v)  # close the gaps merges opened
    changed = jnp.zeros_like(v[0])
    for a, b in zip(v, orig):
        changed = jnp.where(a != b, 1, changed)
    return v, score, changed


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
        dir_cells, deltas, legal = _peek(cells)  # legal: int32 0/1 masks
        n_legal = legal[0] + legal[1] + legal[2] + legal[3]
        done = jnp.where(n_legal == 0, 1, 0)

        # uniform over legal actions: random scores, −1 on illegal, argmax
        rand = _rand_lanes((4 * sub, lanes))
        best_score = jnp.full((sub, lanes), -1, jnp.int32)
        action = jnp.zeros((sub, lanes), jnp.int32)
        for a in range(4):
            s = jnp.where(legal[a] != 0, rand[a * sub : (a + 1) * sub, :], -1)
            take = s > best_score
            best_score = jnp.where(take, s, best_score)
            action = jnp.where(take, a, action)

        # select merged cells / delta / moved per env
        sel = []
        for i in range(NCELLS):
            ud = jnp.where(action == 0, dir_cells[0][i], dir_cells[1][i])
            lr = jnp.where(action == 2, dir_cells[2][i], dir_cells[3][i])
            sel.append(jnp.where(action <= 1, ud, lr))
        d_ud = jnp.where(action == 0, deltas[0], deltas[1])
        d_lr = jnp.where(action == 2, deltas[2], deltas[3])
        delta = jnp.where(action <= 1, d_ud, d_lr)
        m_ud = jnp.where(action == 0, legal[0], legal[1])
        m_lr = jnp.where(action == 2, legal[2], legal[3])
        did = jnp.where(action <= 1, m_ud, m_lr)

        spawn_bits = _rand_lanes((2 * sub, lanes))
        sel = _spawn(sel, did, spawn_bits[0:sub, :], spawn_bits[sub:, :])
        new_cells = [
            jnp.where(did != 0, s, c) for s, c in zip(sel, cells)
        ]
        score_acc = score_acc + jnp.where(did != 0, delta, 0)

        # auto-reset finished envs: zero board + two spawns
        reset_bits = _rand_lanes((4 * sub, lanes))
        zero_cells = [jnp.where(done != 0, 0, c) for c in new_cells]
        zero_cells = _spawn(
            zero_cells, done, reset_bits[0:sub, :], reset_bits[sub : 2 * sub, :]
        )
        zero_cells = _spawn(
            zero_cells, done, reset_bits[2 * sub : 3 * sub, :], reset_bits[3 * sub :, :]
        )
        episodes = episodes + done

        boards = jnp.stack(zero_cells, axis=0)
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


def to_cell_major(boards: jax.Array) -> jax.Array:
    """[B, 4, 4] → int32[16, B]."""
    b = boards.shape[0]
    return boards.reshape(b, NCELLS).T.astype(jnp.int32)


def from_cell_major(cm: jax.Array) -> jax.Array:
    """int32[16, B] → [B, 4, 4]."""
    return cm.T.reshape(-1, K, K)
