"""Best-first search and A*-seeded replay generation."""

import numpy as np
import pytest

from t48.env.golden import GoldenBoard
from t48.search.astar import Node, best_first_search
from t48.search.seeding import generate_replay_transitions


def _board(raw):
    b = GoldenBoard(k=4, populate_empty_cells=False)
    b.state = np.array(raw)
    return b


class TestBestFirst:
    def test_goal_already_present(self):
        board = _board([[2048, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        result = best_first_search(board)
        # max tile < 2048 is false → goal doubles (state_space_search.py:50-55)
        # board HAS 2048 → goal becomes 4096, so search proceeds; use an
        # explicit small goal instead to test the hit path:
        result = best_first_search(board, goal_tile=2048)
        assert result["success"]
        assert result["current_node"].is_root()
        assert result["path_length"] == 0

    def test_reaches_small_goal(self):
        import random

        random.seed(0)
        np.random.seed(0)
        board = GoldenBoard()
        result = best_first_search(board, goal_tile=32, max_expansions=5000)
        assert result["success"]
        node = result["current_node"]
        assert 32 in node.board
        # parent chain is a valid line of play
        path = node.path_from_root()
        assert path[0].is_root()
        for parent, child in zip(path, path[1:]):
            assert child.move in ("up", "down", "left", "right")
            assert child.cost == parent.cost + 1
            assert child.board.merge_score() >= parent.board.merge_score()

    def test_budget_exhaustion_returns_best(self):
        import random

        random.seed(1)
        np.random.seed(1)
        board = GoldenBoard()
        result = best_first_search(board, goal_tile=65536, max_expansions=200)
        assert not result["success"]
        assert result["expanded_nodes"] >= 200
        assert result["current_node"] is not None

    def test_f_function(self):
        board = _board([[4, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        board._mergescore = 100
        assert Node(board).f() == -50  # −merge_score // 2


class TestSeeding:
    def test_transitions_are_well_formed(self):
        tr = generate_replay_transitions(
            games=2, max_expansions=300, seed=0, goal_tile=64
        )
        n = tr.action.shape[0]
        assert n > 0
        assert tr.state.shape == (n, 16) and tr.next_state.shape == (n, 16)
        # fixed reference bugs (state_space_search.py:123-128):
        # state != next_state on every transition
        assert (tr.state != tr.next_state).any(axis=1).all()
        # rewards are merge-score deltas along the path: non-negative
        assert (tr.reward >= 0).all()
        # exactly one terminal per game, at the path end
        assert tr.done.sum() == 2
        assert ((tr.action >= 0) & (tr.action < 4)).all()

    def test_deterministic_given_seed(self):
        t1 = generate_replay_transitions(games=1, max_expansions=200, seed=7,
                                         goal_tile=32)
        t2 = generate_replay_transitions(games=1, max_expansions=200, seed=7,
                                         goal_tile=32)
        assert np.array_equal(t1.state, t2.state)
        assert np.array_equal(t1.action, t2.action)

    def test_feeds_replay_buffer(self):
        import tests.conftest  # noqa: F401
        import jax

        from t48.replay import buffer as replay_lib

        tr = generate_replay_transitions(games=1, max_expansions=200, seed=3,
                                         goal_tile=32)
        rs = replay_lib.create(1000)
        rs = replay_lib.add_many(rs, tr)
        assert int(rs.fill) == tr.action.shape[0]
        batch = replay_lib.sample(rs, jax.random.PRNGKey(0), 16)
        # cell-major factored batch: [cells, draws, envs]
        assert batch.state.shape == (16, 16, 1)
