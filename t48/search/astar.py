"""Best-first search for 2048 (the reference's 'A*').

Reference: /root/reference/src/state_space_search.py:10-102. Despite the
name, the reference's evaluation ``f(n) = −merge_score // 2`` ignores path
cost entirely (state_space_search.py:38-40), making it greedy best-first
on merge score. We reproduce that behavior (it is what produced the
published SSS_replay artifacts) with the same open-list tiebreak
(insertion order, :57-59,96), a closed list keyed by flattened state
(:80-87), and the same goal test (goal tile present, :72-78 →
board.py:35-36).

Documented divergence: the reference's closed-list dominance test is
inverted (state_space_search.py:83 skips a node when the *stored* f is
worse, re-expanding dominated rediscoveries and dropping improved ones);
we use the standard skip-if-already-seen-with-better-or-equal-f rule.

Search is pointer-chasing and PriorityQueue-bound — deliberately host-side
against the golden single-board env, never jitted (SURVEY.md §7 'hard
parts'). TPU-native additions: an expansion budget (the reference's open
list can explode unboundedly) returning the best node found so far.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np

from t48.env.golden import GoldenBoard


class Node:
    """Search-tree node (state_space_search.py:10-44)."""

    __slots__ = ("parent", "board", "cost", "move", "reward")

    def __init__(self, board: GoldenBoard, parent=None, cost=0, move=None):
        self.parent = parent
        self.board = board
        self.cost = cost
        self.move = move

    def is_root(self) -> bool:
        return self.parent is None

    def f(self) -> int:
        """f(n) = −merge_score // 2 (state_space_search.py:38-40)."""
        return -self.board.merge_score() // 2

    def path_from_root(self):
        """Nodes root→self (the seeding generator walks this forward)."""
        path = []
        node = self
        while node is not None:
            path.append(node)
            node = node.parent
        return list(reversed(path))


def best_first_search(
    board: GoldenBoard,
    goal_tile: Optional[int] = None,
    max_expansions: int = 20_000,
) -> dict:
    """Greedy best-first toward a goal tile (state_space_search.py:46-102).

    Returns a dict with keys success/current_node/path_length/
    visited_nodes/expanded_nodes, like the reference. On budget
    exhaustion, ``success`` is False and ``current_node`` is the
    highest-merge-score node seen (the seeding generator still gets a
    useful trajectory — a TPU-native divergence from the reference's
    unbounded search).
    """
    root = Node(board)
    if goal_tile is None:
        current_max = board.max_tile()
        goal_tile = current_max * 2 if current_max >= 2048 else 2048

    # (f, insertion_order, node): heapq with insertion-order tiebreak
    # reproduces the reference's PriorityQueue behavior (:57-59, 96).
    open_list = [(0, 0, root)]
    closed = {}
    visited = 1
    expanded = 0
    best = root

    while open_list:
        _, _, current = heapq.heappop(open_list)
        visited += 1
        if current.board.merge_score() > best.board.merge_score():
            best = current

        if goal_tile in current.board:
            return {
                "success": True,
                "current_node": current,
                "path_length": current.cost,
                "visited_nodes": visited,
                "expanded_nodes": expanded,
            }

        key = tuple(current.board.state.flatten())
        if key in closed and closed[key] <= current.f():
            continue
        closed[key] = current.f()

        if expanded >= max_expansions:
            break

        for move, next_board in current.board.available_moves().items():
            child = Node(next_board, parent=current, cost=current.cost + 1, move=move)
            expanded += 1
            heapq.heappush(open_list, (child.f(), expanded, child))

    return {
        "success": False,
        "current_node": best,
        "path_length": np.inf,
        "visited_nodes": visited,
        "expanded_nodes": expanded,
    }
