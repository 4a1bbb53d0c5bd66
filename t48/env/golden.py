"""CPU golden model of the 2048 environment with reference-exact semantics.

This is the parity oracle for the JAX engine (t48/env/engine.py): a small
numpy implementation whose observable behavior — merge results, merge-score
accumulation, legality, spawn placement — matches the reference
``Board2048`` (/root/reference/src/board.py:8-241) bit-for-bit, including
its two interleaved host RNG streams:

- the empty-cell pick uses Python ``random.randint`` over row-major empty
  indices (board.py:46-48);
- the tile value uses ``np.random.choice([2, 4], 1)`` (board.py:49),
  i.e. *uniform* 2-or-4 (not the canonical 90/10).

Exact fixed-seed trajectory parity against the reference code is validated
in tests/test_golden_parity.py (the test imports the reference sources when
present and drives both with identical seeds and action sequences). The
golden model stores raw tile values like the reference, not exponents.

Deliberate divergence: none in dynamics. The dead torch-tensor variant of
the row kernel (board.py:56-90) and torch tensor exports (board.py:233-237)
are not reproduced; encoders return numpy arrays.
"""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np

_ACTION_NAMES = ["up", "down", "left", "right"]


def merge_row_left(row: np.ndarray) -> tuple:
    """Slide+merge one row of raw tile values toward index 0.

    Semantics (identical to ``_apply_action_to_vector``, board.py:92-126,
    proven on the exhaustive row space by tests): non-zeros compact to the
    front keeping order; adjacent equal pairs merge once each, resolved in
    move direction; the merge score gains each merged tile's new value.

    Returns (new_row, score_delta).
    """
    vals = [int(x) for x in row if x != 0]
    out: List[int] = []
    score = 0
    i = 0
    while i < len(vals):
        if i + 1 < len(vals) and vals[i] == vals[i + 1]:
            merged = vals[i] * 2
            out.append(merged)
            score += merged
            i += 2
        else:
            out.append(vals[i])
            i += 1
    out += [0] * (len(row) - len(out))
    return np.array(out, dtype=row.dtype), score


class GoldenBoard:
    """Single 2048 board with reference-exact dynamics and RNG consumption.

    API mirrors ``Board2048`` (board.py) so search, baseline players and
    parity tests can treat either interchangeably.
    """

    def __init__(self, k: int = 4, populate_empty_cells: bool = True):
        self.state = np.zeros((k, k), dtype=int)
        self._mergescore = 0
        self._action_history: List[str] = []
        self.k = k
        self.populate_empty_cells = populate_empty_cells
        if populate_empty_cells:
            self._populate_empty_cell()
            self._populate_empty_cell()

    # -- construction ------------------------------------------------------

    def clone(self) -> "GoldenBoard":
        # RNG-stream parity quirk: the reference clone constructs a fully
        # populated board first (board.py:24-30 → board.py:18-20), burning
        # two spawns' worth of host RNG draws before overwriting the state.
        # Exact fixed-seed trajectory parity requires consuming the same
        # draws in the same order.
        board = GoldenBoard(k=self.k, populate_empty_cells=self.populate_empty_cells)
        board.state = np.copy(self.state)
        board._mergescore = self._mergescore
        board._action_history = self._action_history.copy()
        return board

    def _populate_empty_cell(self) -> "GoldenBoard":
        """Spawn a 2 or 4 in a random empty cell.

        RNG stream parity with board.py:41-51: ``random.randint`` picks the
        row-major empty index; ``np.random.choice([2, 4], 1)`` picks the
        value — same calls, same draw order, same stream consumption.
        """
        indices = np.array(np.where(self.state == 0)).T
        i = random.randint(0, len(indices) - 1)
        x, y = indices[i]
        number = np.random.choice([2, 4], 1)
        self.state[x, y] = number[0]
        return self

    # -- dunder helpers (board.py:32-39) -----------------------------------

    def __repr__(self):
        return str(self.state)

    def __contains__(self, element) -> bool:
        return bool(np.isin(element, self.state).all())

    def __eq__(self, other) -> bool:
        return bool((self.state == other.state).all())

    # -- moves -------------------------------------------------------------

    def _merge_all_rows(self, grid: np.ndarray) -> tuple:
        """Merge every row of ``grid`` leftward; returns (result, score)."""
        rows = []
        score = 0
        for r in grid:
            merged, s = merge_row_left(r)
            rows.append(merged)
            score += s
        return np.stack(rows), score

    def _move(self, name: str) -> "GoldenBoard":
        """Apply one named move on a clone (board.py:147-183 semantics):

        the action is recorded unconditionally; the board mutates and a
        tile spawns only if the merge changed the board.
        """
        board = self.clone()
        board._action_history.append(name)
        g = board.state
        if name == "up":
            result, score = board._merge_all_rows(g.T)
            result = result.T
        elif name == "down":
            result, score = board._merge_all_rows(np.flip(g.T, axis=1))
            result = np.flip(result, axis=1).T
        elif name == "left":
            result, score = board._merge_all_rows(g)
        elif name == "right":
            result, score = board._merge_all_rows(np.flip(g, axis=1))
            result = np.flip(result, axis=1)
        else:
            raise ValueError(f"Action: {name} is invalid.")
        if not np.array_equal(result, board.state):
            board.state = result
            board._mergescore += score
            board._populate_empty_cell()
        return board

    def _merge_all_rows_for(self, name: str) -> tuple:
        """Pre-spawn move result for ``name``: (merged_state, score_delta).

        Pure query — no mutation, no RNG. Used by the parity tests and the
        host-side search to inspect candidate moves cheaply.
        """
        g = self.state
        if name == "up":
            result, score = self._merge_all_rows(g.T)
            return result.T, score
        if name == "down":
            result, score = self._merge_all_rows(np.flip(g.T, axis=1))
            return np.flip(result, axis=1).T, score
        if name == "left":
            return self._merge_all_rows(g)
        if name == "right":
            result, score = self._merge_all_rows(np.flip(g, axis=1))
            return np.flip(result, axis=1), score
        raise ValueError(f"Action: {name} is invalid.")

    def up(self) -> "GoldenBoard":
        return self._move("up")

    def down(self) -> "GoldenBoard":
        return self._move("down")

    def left(self) -> "GoldenBoard":
        return self._move("left")

    def right(self) -> "GoldenBoard":
        return self._move("right")

    def peek_action(self, action) -> "GoldenBoard":
        """Would-be board after ``action`` (str or int; board.py:185-202)."""
        if not isinstance(action, str):
            action = _ACTION_NAMES[int(action)]
        initial = action.lower()[0]
        for name in _ACTION_NAMES:
            if name[0] == initial:
                return self._move(name)
        raise ValueError(f"Action: {action} is invalid.")

    # -- queries -----------------------------------------------------------

    def available_moves(self) -> Dict[str, "GoldenBoard"]:
        """Legal moves → peeked boards (board.py:138-145).

        Note: consumes RNG for each legal move's spawn, exactly like the
        reference (each peek that changes the board spawns a tile).
        """
        mapping = {}
        for name in _ACTION_NAMES:
            board = self.peek_action(name)
            if not np.array_equal(self.state, board.state):
                mapping[name] = board
        return mapping

    def available_moves_mask(self) -> np.ndarray:
        """float[4] legality unit vector (board.py:128-135)."""
        mask = np.zeros(4)
        for i, name in enumerate(_ACTION_NAMES):
            board = self.peek_action(name)
            if not np.array_equal(self.state, board.state):
                mask[i] = 1
        return mask

    def simple_score(self) -> int:
        return int(self.state.sum())

    def merge_score(self) -> int:
        return self._mergescore

    def number_of_empty_cells(self) -> int:
        return int((self.state == 0).sum())

    def max_tile(self) -> int:
        return int(self.state.max())

    # -- encoders ----------------------------------------------------------

    def log_scale(self) -> np.ndarray:
        """float[K, K] log2 exponents, 0 for empty (board.py:224-231)."""
        x = self.state
        return np.where(x == 0, 0, np.log2(np.maximum(x, 1)).astype(int))

    def normalized(self) -> np.ndarray:
        """state / max(state) (board.py:218-222; used at eval by
        player.py:49 — the reference's training/eval encoding mismatch)."""
        return self.state / self.state.max()

    def exponents(self) -> np.ndarray:
        """int[K, K] exponent view matching the JAX engine's native layout."""
        return self.log_scale().astype(np.int32)

    def show(self, ignore_zeros: bool = False) -> None:
        print(f"Simple Score: {self.simple_score()}")
        print(f"Merge Score: {self.merge_score()}")
        text = repr(self)
        if ignore_zeros:
            text = text.replace("0", "_")
        print(text)
