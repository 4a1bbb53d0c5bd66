"""A*-seeded replay warm-start.

Reference: ``generate_replay_buffer_using_A_star``
(/root/reference/src/state_space_search.py:104-131): run the search per
game, walk the solution path, and push its transitions into the replay
buffer before training (double_dqn_conv_sss.py:65).

The reference's backtracking loop has three bugs that SURVEY.md §7.8
mandates fixing (BASELINE.json calls this a *capability* — "A*-seeded
replay warm-start" — not a bug-compatibility target):

- it stores ``(current.board, a, r, current.board, done)`` — state equals
  next_state (:128);
- the reward arguments are reversed while walking backwards, producing
  ``merge(parent) − merge(current) ≤ 0`` (:125);
- ``done`` is set on the *root* (:123) instead of the path's last node.

Here the path is walked root→goal emitting
``(parent_board, action, merge(child) − merge(parent), child_board,
done=is_last)`` — well-formed Double-DQN transitions with positive
rewards along the searched line of play.
"""

from __future__ import annotations

import random

import numpy as np

from t48.env.golden import GoldenBoard
from t48.replay.buffer import Transition
from t48.search.astar import best_first_search

_MOVE_TO_INT = {"up": 0, "down": 1, "left": 2, "right": 3}


def _make_board(k: int, game_seed: int, backend: str):
    """Root board for one search game.

    backend='native' uses the C++ bitboard engine (t48/native) — an order
    of magnitude faster node expansion for the pointer-chasing search;
    'golden' is the reference-exact Python model; 'auto' prefers native.
    """
    if backend in ("auto", "native") and k == 4:
        from t48 import native

        if native.available():
            return native.FastBoard(seed=game_seed or 1)
        if backend == "native":
            raise RuntimeError(f"native engine unavailable: {native.load_error()}")
    return GoldenBoard(k=k)


def generate_replay_transitions(
    games: int = 100,
    max_expansions: int = 20_000,
    k: int = 4,
    seed: int = 0,
    goal_tile: int | None = None,
    verbose: bool = False,
    backend: str = "auto",
) -> Transition:
    """Run ``games`` searches and collect their paths as one Transition
    batch (encoded int8 exponent boards, ready for the replay buffer)."""
    random.seed(seed)
    np.random.seed(seed)

    states, actions, rewards, next_states, dones = [], [], [], [], []
    for g in range(games):
        board = _make_board(k, seed * 7919 + g + 1, backend)
        result = best_first_search(
            board, goal_tile=goal_tile, max_expansions=max_expansions
        )
        path = result["current_node"].path_from_root()
        if verbose:
            print(
                f"game {g}: success={result['success']} "
                f"path={len(path) - 1} expanded={result['expanded_nodes']}"
            )
        for i in range(1, len(path)):
            parent, child = path[i - 1], path[i]
            states.append(parent.board.exponents().reshape(-1))
            actions.append(_MOVE_TO_INT[child.move])
            rewards.append(
                float(child.board.merge_score() - parent.board.merge_score())
            )
            next_states.append(child.board.exponents().reshape(-1))
            dones.append(i == len(path) - 1)

    if not states:
        raise RuntimeError("search produced no transitions")
    return Transition(
        state=np.stack(states).astype(np.int8),
        action=np.array(actions, np.int32),
        reward=np.array(rewards, np.float32),
        next_state=np.stack(next_states).astype(np.int8),
        done=np.array(dones, bool),
    )
