"""Pallas kernel logic tests.

The kernel helpers (_merge_lanes, _peek, _spawn) are pure jnp functions —
their semantics are validated here on CPU against the XLA engine. The
compiled-kernel path (`pallas_rollout`) requires real TPU hardware (the
TPU PRNG primitives have no CPU lowering); those runs are exercised by
bench.py and scripts/validate_pallas.py on device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t48.env import engine
from t48.ops import pallas_step as ps


def _cells_from_boards(boards):
    """[B,4,4] → 16 × (1, B) lane vectors (kernel layout)."""
    b = boards.shape[0]
    cm = boards.reshape(b, 16).T
    return [cm[i : i + 1, :] for i in range(16)]


class TestKernelHelpers:
    def test_peek_matches_engine(self):
        rng = np.random.default_rng(0)
        boards = jnp.asarray(rng.integers(0, 8, size=(64, 4, 4)), jnp.int32)
        moved_e, deltas_e, legal_e = jax.jit(engine.peek_all)(boards)

        cells = _cells_from_boards(boards)
        dir_cells, deltas_k, legal_k = ps._peek(cells)
        for a in range(4):
            got = jnp.concatenate(dir_cells[a], axis=0).T.reshape(-1, 4, 4)
            assert np.array_equal(np.asarray(got), np.asarray(moved_e[:, a]))
            assert np.array_equal(
                np.asarray(deltas_k[a][0]), np.asarray(deltas_e[:, a])
            )
            assert np.array_equal(
                np.asarray(legal_k[a][0] != 0), np.asarray(legal_e[:, a])
            )

    def test_merge_lanes_matches_engine_rows(self):
        rows = jnp.asarray(
            np.random.default_rng(1).integers(0, 6, size=(128, 4)), jnp.int32
        )
        merged_e, score_e, changed_e = engine.merge_rows_left(rows)
        lanes = [rows[:, i] for i in range(4)]
        merged_k, score_k, changed_k = ps._merge_lanes(lanes)
        assert np.array_equal(
            np.asarray(jnp.stack(merged_k, -1)), np.asarray(merged_e)
        )
        assert np.array_equal(np.asarray(score_k), np.asarray(score_e))
        assert np.array_equal(np.asarray(changed_k != 0), np.asarray(changed_e))

    def test_uniform_index_range(self):
        r = jnp.arange(0, 2**31 - 1, 2**24, dtype=jnp.int32)
        for n in (1, 3, 7, 16):
            idx = np.asarray(ps._uniform_index(r, jnp.full(r.shape, n, jnp.int32)))
            assert idx.min() >= 0 and idx.max() < n
            if n > 1:  # roughly uniform across buckets
                counts = np.bincount(idx, minlength=n)
                assert counts.min() > 0.5 * counts.mean()

    def test_spawn_fills_one_empty(self):
        boards = jnp.zeros((8, 4, 4), jnp.int32).at[:, 0, 0].set(5)
        cells = _cells_from_boards(boards)
        did = jnp.ones((1, 8), jnp.int32)
        rand_cell = jnp.full((1, 8), 12345, jnp.int32)
        rand_val = jnp.full((1, 8), 1, jnp.int32)
        out = ps._spawn(cells, did, rand_cell, rand_val)
        got = np.asarray(jnp.concatenate(out, 0).T.reshape(8, 4, 4))
        for g in got:
            assert (g != 0).sum() == 2  # original tile + one spawn
            assert g[0, 0] == 5

    def test_merge_lanes_exhaustive_rows(self):
        # every 4-cell row over exponents 0..6 — pins the shortened
        # 2-step post-merge compress against the engine's full compress
        vals = np.arange(7)
        rows = np.stack(
            np.meshgrid(vals, vals, vals, vals, indexing="ij"), -1
        ).reshape(-1, 4)
        rows = jnp.asarray(rows, jnp.int32)
        merged_e, score_e, changed_e = jax.jit(engine.merge_rows_left)(rows)
        lanes = [rows[:, i] for i in range(4)]
        merged_k, score_k, changed_k = ps._merge_lanes(lanes)
        assert np.array_equal(
            np.asarray(jnp.stack(merged_k, -1)), np.asarray(merged_e)
        )
        assert np.array_equal(np.asarray(score_k), np.asarray(score_e))
        assert np.array_equal(np.asarray(changed_k != 0), np.asarray(changed_e))

    def test_legal_all_matches_engine(self):
        rng = np.random.default_rng(2)
        boards = jnp.asarray(rng.integers(0, 4, size=(512, 4, 4)), jnp.int32)
        _, _, legal_e = jax.jit(engine.peek_all)(boards)
        cells = _cells_from_boards(boards)
        legal_k = ps._legal_all(cells)
        for a in range(4):
            assert np.array_equal(
                np.asarray(legal_k[a][0]), np.asarray(legal_e[:, a])
            ), f"direction {a}"

    def test_apply_chosen_matches_engine(self):
        rng = np.random.default_rng(3)
        boards = jnp.asarray(rng.integers(0, 6, size=(256, 4, 4)), jnp.int32)
        moved_e, deltas_e, _ = jax.jit(engine.peek_all)(boards)
        cells = _cells_from_boards(boards)
        for a in range(4):
            action = jnp.full((1, boards.shape[0]), a, jnp.int32)
            out, delta = ps._apply_chosen(cells, action)
            got = jnp.concatenate(out, axis=0).T.reshape(-1, 4, 4)
            assert np.array_equal(np.asarray(got), np.asarray(moved_e[:, a]))
            assert np.array_equal(
                np.asarray(delta[0]), np.asarray(deltas_e[:, a])
            )

    def test_apply_chosen_mixed_actions(self):
        rng = np.random.default_rng(4)
        boards = jnp.asarray(rng.integers(0, 6, size=(256, 4, 4)), jnp.int32)
        moved_e, deltas_e, _ = jax.jit(engine.peek_all)(boards)
        actions = jnp.asarray(
            rng.integers(0, 4, size=(1, boards.shape[0])), jnp.int32
        )
        cells = _cells_from_boards(boards)
        out, delta = ps._apply_chosen(cells, actions)
        got = np.asarray(jnp.concatenate(out, 0).T.reshape(-1, 4, 4))
        a_np = np.asarray(actions[0])
        want = np.asarray(moved_e)[np.arange(boards.shape[0]), a_np]
        assert np.array_equal(got, want)
        assert np.array_equal(
            np.asarray(delta[0]),
            np.asarray(deltas_e)[np.arange(boards.shape[0]), a_np],
        )

    def test_reset_spawn2(self):
        rng = np.random.default_rng(5)
        boards = jnp.asarray(rng.integers(1, 6, size=(64, 4, 4)), jnp.int32)
        cells = _cells_from_boards(boards)
        done = jnp.asarray(
            (np.arange(64) % 2 == 0).reshape(1, 64)
        )
        r1 = jnp.asarray(rng.integers(0, 2**31, size=(1, 64)), jnp.int32)
        r2 = jnp.asarray(rng.integers(0, 2**31, size=(1, 64)), jnp.int32)
        rv = jnp.asarray(rng.integers(0, 2**31, size=(1, 64)), jnp.int32)
        out = ps._reset_spawn2(cells, done, r1, r2, rv)
        got = np.asarray(jnp.concatenate(out, 0).T.reshape(64, 4, 4))
        for i, g in enumerate(got):
            if i % 2 == 0:  # reset: exactly two tiles, values 2 or 4
                nz = g[g != 0]
                assert len(nz) == 2 and set(nz).issubset({1, 2}), g
            else:  # untouched
                assert np.array_equal(g, np.asarray(boards[i]))

    def test_cell_major_roundtrip(self):
        boards = engine.new_boards(jax.random.PRNGKey(0), 16)
        cm = ps.to_cell_major(boards)
        back = ps.from_cell_major(cm)
        assert np.array_equal(np.asarray(back), np.asarray(boards))
