"""Golden tests for the pure-JAX 2048 engine.

Ports the reference's executable merge spec
(/root/reference/tests/test_game_board.py:5-59) as plain pytest asserts,
then goes further: exhaustive row-space equivalence against the golden
model, spawn distribution checks, and step/reset invariants.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t48.env import engine
from t48.env.golden import GoldenBoard, merge_row_left

# The reference merge golden table (tests/test_game_board.py:8-23),
# expressed in raw tile values. This is the executable spec of merge
# semantics: single merge per pair, move-direction priority.
MERGE_TABLE = [
    ([0, 0, 0, 0], [0, 0, 0, 0]),
    ([0, 0, 0, 2], [2, 0, 0, 0]),
    ([0, 0, 2, 2], [4, 0, 0, 0]),
    ([2, 0, 0, 0], [2, 0, 0, 0]),
    ([2, 0, 2, 0], [4, 0, 0, 0]),
    ([2, 2, 2, 2], [4, 4, 0, 0]),
    ([2, 2, 4, 4], [4, 8, 0, 0]),
    ([2, 2, 0, 0], [4, 0, 0, 0]),
    ([2, 0, 0, 2], [4, 0, 0, 0]),
    ([0, 0, 2, 2], [4, 0, 0, 0]),
    ([2, 4, 2, 4], [2, 4, 2, 4]),
    ([2, 2, 4, 2], [4, 4, 2, 0]),
    ([2, 4, 4, 2], [2, 8, 2, 0]),
    ([2, 4, 4, 4], [2, 8, 4, 0]),
    ([4, 8, 16, 32], [4, 8, 16, 32]),
]


def to_exp(vals):
    return np.array([0 if v == 0 else int(np.log2(v)) for v in vals], np.int32)


def from_exp(exps):
    e = np.asarray(exps)
    return np.where(e == 0, 0, 2 ** e.astype(np.int64))


class TestMergeGoldenTable:
    def test_jax_engine_matches_table(self):
        rows = jnp.stack([jnp.array(to_exp(i)) for i, _ in MERGE_TABLE])
        merged, score, changed = jax.jit(engine.merge_rows_left)(rows)
        for row_idx, (inp, expect) in enumerate(MERGE_TABLE):
            got = from_exp(np.array(merged[row_idx]))
            assert list(got) == expect, f"{inp} -> {list(got)} != {expect}"
            assert bool(changed[row_idx]) == (inp != expect)

    def test_golden_model_matches_table(self):
        for inp, expect in MERGE_TABLE:
            got, _ = merge_row_left(np.array(inp))
            assert list(got) == expect

    def test_merge_scores(self):
        # score delta = sum of merged tile values (board.py:113-114)
        cases = {
            (2, 2, 2, 2): 8,
            (2, 2, 4, 4): 12,
            (2, 4, 4, 2): 8,
            (0, 0, 2, 2): 4,
            (2, 4, 2, 4): 0,
            (4, 8, 16, 32): 0,
        }
        for inp, expect_score in cases.items():
            _, s = merge_row_left(np.array(inp))
            assert s == expect_score
            _, sj, _ = engine.merge_rows_left(jnp.array(to_exp(inp))[None])
            assert int(sj[0]) == expect_score


class TestExhaustiveRowEquivalence:
    def test_all_rows_exponents_up_to_2048(self):
        """Every 4-exponent row with tiles up to 2^11: JAX == golden."""
        all_rows = np.array(
            list(itertools.product(range(12), repeat=4)), np.int32
        )
        merged_j, score_j, changed_j = jax.jit(engine.merge_rows_left)(
            jnp.asarray(all_rows)
        )
        merged_j = np.asarray(merged_j)
        score_j = np.asarray(score_j)
        for i, row in enumerate(all_rows):
            vals = from_exp(row)
            golden_row, golden_score = merge_row_left(vals)
            assert np.array_equal(from_exp(merged_j[i]), golden_row), row
            assert score_j[i] == golden_score, row


class TestFastPaths:
    """The env_step hot path uses direct legality line scans and a
    merge-of-the-chosen-direction-only network (ported from the Pallas
    kernel). Pin both against the all-four-merges reference path."""

    def test_legal_line_exhaustive(self):
        """_legal_line == 'merging changes the line', for every 4-cell
        line over exponents 0..4 (legality depends only on the
        zero/equality pattern, fully covered by 5 symbols)."""
        lines = np.array(list(itertools.product(range(5), repeat=4)), np.int32)
        cols = [jnp.asarray(lines[:, i]) for i in range(4)]
        front, back = jax.jit(engine._legal_line)(cols)
        merged_f, _, changed_f = engine.merge_rows_left(jnp.asarray(lines))
        merged_b, _, changed_b = engine.merge_rows_left(
            jnp.asarray(lines[:, ::-1])
        )
        assert np.array_equal(np.asarray(front), np.asarray(changed_f))
        assert np.array_equal(np.asarray(back), np.asarray(changed_b))

    def test_merge_lanes_fast_exhaustive(self):
        """_merge_lanes_fast == _merge_lanes over every 4-cell line with
        exponents 0..5 (covers all compaction/merge gap patterns)."""
        lines = np.array(list(itertools.product(range(6), repeat=4)), np.int32)
        cols = [jnp.asarray(lines[:, i]) for i in range(4)]
        fast_v, fast_s = jax.jit(engine._merge_lanes_fast)(cols)
        ref_v, ref_s, _ = engine._merge_lanes(cols)
        for a, b in zip(fast_v, ref_v):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(fast_s), np.asarray(ref_s))

    def test_legal_cells_and_apply_chosen_match_peek(self):
        """Board-level: legality masks and chosen-direction merges equal
        the peek_all reference path on random boards, for every action."""
        key = jax.random.PRNGKey(0)
        boards = jax.random.randint(key, (512, 4, 4), 0, 6, jnp.int32)
        moved, deltas, legal_ref = jax.jit(engine.peek_all)(boards)
        cells = engine.split_cells(boards)
        legal_fast = jnp.stack(engine.legal_cells(cells, 4), axis=-1)
        assert np.array_equal(np.asarray(legal_fast), np.asarray(legal_ref))
        for action in range(4):
            actions = jnp.full((512,), action, jnp.int32)
            new_cells, delta = jax.jit(
                lambda c, a: engine.apply_chosen_cells(c, a, 4)
            )(cells, actions)
            got = engine.assemble_cells(new_cells, 4)
            assert np.array_equal(
                np.asarray(got), np.asarray(moved[:, action])
            ), action
            assert np.array_equal(
                np.asarray(delta), np.asarray(deltas[:, action])
            ), action


class TestAvailability:
    """Reference legality fixtures (tests/test_game_board.py:30-59)."""

    FIXTURES = [
        (
            [[2, 4, 8, 0], [0, 0, 0, 0], [2, 4, 16, 32], [0, 0, 0, 0]],
            {"up", "down", "right"},
        ),
        (
            [[2, 4, 2, 4], [2, 4, 2, 4], [2, 4, 2, 4], [2, 4, 2, 4]],
            {"up", "down"},
        ),
        (
            [[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]],
            set(),
        ),
    ]

    def test_jax_legal_mask(self):
        boards = jnp.stack(
            [jnp.array(to_exp(np.array(b).ravel())).reshape(4, 4)
             for b, _ in self.FIXTURES]
        )
        _, _, legal = jax.jit(engine.peek_all)(boards)
        legal = np.asarray(legal)
        for i, (_, expect) in enumerate(self.FIXTURES):
            got = {engine.ACTIONS[a] for a in range(4) if legal[i, a]}
            assert got == expect

    def test_golden_available_moves(self):
        for raw, expect in self.FIXTURES:
            board = GoldenBoard(k=4, populate_empty_cells=False)
            board.state = np.array(raw)
            assert set(board.available_moves().keys()) == expect


class TestDirections:
    def test_up_down_left_right_against_golden(self):
        """Random boards: all 4 move results identical to golden peeks."""
        rng = np.random.default_rng(0)
        for _ in range(50):
            exps = rng.integers(0, 7, size=(4, 4)).astype(np.int32)
            golden = GoldenBoard(k=4, populate_empty_cells=False)
            golden.state = from_exp(exps).astype(int)
            moved, deltas, legal = jax.jit(engine.peek_all)(jnp.asarray(exps)[None])
            for a, name in enumerate(engine.ACTIONS):
                g2 = golden.clone()
                result, score = g2._merge_all_rows_for(name)
                assert np.array_equal(
                    from_exp(np.asarray(moved[0, a])), result
                ), (name, exps)
                assert int(deltas[0, a]) == score
                assert bool(legal[0, a]) == (
                    not np.array_equal(result, golden.state)
                )


class TestSpawnAndReset:
    def test_spawn_only_fills_one_empty_cell(self):
        key = jax.random.PRNGKey(0)
        board = jnp.zeros((4, 4), jnp.int32).at[0, 0].set(5)
        out = engine._spawn(board, key)
        diff = np.asarray(out) - np.asarray(board)
        changed = np.nonzero(diff)
        assert len(changed[0]) == 1
        assert int(diff[changed][0]) in (1, 2)

    def test_spawn_never_overwrites(self):
        key = jax.random.PRNGKey(1)
        board = jnp.full((4, 4), 3, jnp.int32).at[2, 2].set(0)
        for i in range(20):
            out = engine._spawn(board, jax.random.fold_in(key, i))
            arr = np.asarray(out)
            assert arr[2, 2] in (1, 2)
            assert (arr == 3).sum() == 15

    def test_spawn_distribution(self):
        """Uniform over empty cells; value 2 vs 4 uniform (board.py:41-51)."""
        key = jax.random.PRNGKey(2)
        board = jnp.zeros((4, 4), jnp.int32).at[0, 0].set(1)
        n = 3000
        keys = jax.random.split(key, n)
        outs = np.asarray(jax.vmap(lambda k: engine._spawn(board, k))(keys))
        twos = (outs == 1).sum() - n  # minus the preexisting exponent-1 tile
        fours = (outs == 2).sum()
        assert abs(twos / n - 0.5) < 0.05
        assert abs(fours / n - 0.5) < 0.05
        # placement roughly uniform over the 15 empty cells
        placements = (outs != 0).sum(0) - np.array(
            [[n, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
        )
        freq = placements / n
        assert freq.max() < 2.0 / 15 and freq[freq > 0].min() > 0.5 / 15

    def test_init_two_spawns(self):
        state = engine.init(jax.random.PRNGKey(3), batch=128)
        counts = (np.asarray(state.boards) != 0).reshape(128, -1).sum(-1)
        assert (counts == 2).all()
        assert (np.asarray(state.merge_scores) == 0).all()

    def test_step_noop_keeps_board_and_skips_spawn(self):
        # A full alternating board where only up/down are legal: choosing
        # 'left' must leave the board unchanged with zero reward
        # (board.py:151-153: no spawn on a no-op move).
        exps = to_exp(
            np.array([[2, 4, 2, 4], [2, 4, 2, 4], [2, 4, 2, 4], [2, 4, 2, 4]]).ravel()
        ).reshape(4, 4)
        state = engine.EnvState(
            boards=jnp.asarray(exps)[None],
            merge_scores=jnp.zeros((1,), jnp.int32),
            step_counts=jnp.zeros((1,), jnp.int32),
        )
        new_state, reward, done = engine.step(
            state, jnp.array([engine.LEFT]), jax.random.PRNGKey(0)
        )
        assert np.array_equal(np.asarray(new_state.boards), np.asarray(state.boards))
        assert int(reward[0]) == 0
        assert not bool(done[0])
        assert int(new_state.step_counts[0]) == 1

    def test_step_legal_move_spawns_and_scores(self):
        exps = np.zeros((4, 4), np.int32)
        exps[0, 0] = 1
        exps[0, 1] = 1  # [2, 2, ...] row
        state = engine.EnvState(
            boards=jnp.asarray(exps)[None],
            merge_scores=jnp.zeros((1,), jnp.int32),
            step_counts=jnp.zeros((1,), jnp.int32),
        )
        new_state, reward, done = engine.step(
            state, jnp.array([engine.LEFT]), jax.random.PRNGKey(0)
        )
        board = np.asarray(new_state.boards[0])
        assert board[0, 0] == 2  # merged into a 4
        assert int(reward[0]) == 4
        assert int(new_state.merge_scores[0]) == 4
        assert (board != 0).sum() == 2  # merged tile + 1 spawned tile

    def test_terminal_detection_and_reset(self):
        terminal = to_exp(
            np.array([[2, 4, 2, 4], [4, 2, 4, 2], [2, 4, 2, 4], [4, 2, 4, 2]]).ravel()
        ).reshape(4, 4)
        state = engine.EnvState(
            boards=jnp.asarray(terminal)[None],
            merge_scores=jnp.array([100], jnp.int32),
            step_counts=jnp.array([7], jnp.int32),
        )
        _, _, legal = engine.peek_all(state.boards)
        done = ~legal.any(-1)
        assert bool(done[0])
        reset = engine.reset_where(state, done, jax.random.PRNGKey(0))
        assert int(reset.merge_scores[0]) == 0
        assert int(reset.step_counts[0]) == 0
        assert (np.asarray(reset.boards[0]) != 0).sum() == 2

    def test_max_tile(self):
        boards = jnp.array(
            [to_exp([0, 0, 0, 0] * 4).reshape(4, 4),
             to_exp([2, 4, 1024, 2] + [0] * 12).reshape(4, 4)]
        )
        vals = np.asarray(engine.max_tile(boards))
        assert vals[0] == 0 and vals[1] == 1024


class TestRolloutAgainstGolden:
    def test_random_rollout_trajectory_equivalence(self):
        """Drive JAX engine and golden with the same action sequence from
        the same start board; boards must match whenever spawns are pinned.

        Spawn randomness differs between the two RNGs, so we compare the
        *pre-spawn* move results each step by replaying the golden's board
        into the engine (dynamics parity, tier 1 of SURVEY.md §7).
        """
        rng = np.random.default_rng(42)
        import random as pyrandom

        pyrandom.seed(7)
        np.random.seed(7)
        golden = GoldenBoard()
        peek = jax.jit(engine.peek_all)
        for _ in range(200):
            exps = jnp.asarray(golden.exponents())[None]
            moved, deltas, legal = peek(exps)
            mask = golden.available_moves_mask()
            assert np.array_equal(np.asarray(legal[0]).astype(float), mask)
            if mask.sum() == 0:
                break
            action = int(rng.integers(0, 4))
            nxt = golden.peek_action(action)
            if not np.array_equal(nxt.state, golden.state):
                # compare pre-spawn: golden spawned one tile on top of the
                # merged board; removing it must equal the engine result
                merged_engine = from_exp(np.asarray(moved[0, action])).astype(int)
                diff = nxt.state - merged_engine
                spawn_cells = np.nonzero(diff)
                assert len(spawn_cells[0]) == 1
                assert nxt.state[spawn_cells][0] in (2, 4)
                assert (
                    int(deltas[0, action])
                    == nxt.merge_score() - golden.merge_score()
                )
            golden = nxt


class TestEnvStepCM:
    """engine.env_step_cm — the XLA twin of the Pallas training kernel —
    reproduces the component semantics (apply-chosen, spawn-on-move,
    auto-reset, carried legality)."""

    def _random_boards(self, b=128, steps=25):
        key = jax.random.PRNGKey(11)
        env = engine.init(key, b)

        def body(carry, i):
            env = carry
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
            acts = jax.random.randint(k1, (b,), 0, 4)
            env, _, done = engine.step(env, acts, k2)
            env = engine.reset_where(env, done, k3)
            return env, None

        env, _ = jax.lax.scan(body, env, jnp.arange(steps))
        return env.boards

    def test_contract(self):
        b = 128
        boards = self._random_boards(b)
        cells = engine.split_cells(boards)
        legal_list = engine.legal_cells(cells, 4)
        legal_cm = jnp.stack([l.astype(jnp.int32) for l in legal_list])
        cm = jnp.stack(cells)
        actions = jax.random.randint(jax.random.PRNGKey(5), (b,), 0, 4)
        new_cm, pre_cm, new_legal_cm, reward = jax.jit(engine.env_step_cm)(
            cm, legal_cm, actions, jax.random.PRNGKey(6)
        )

        sel_cells, delta = engine.apply_chosen_cells(cells, actions, 4)
        did = np.asarray(engine._select_lane(legal_list, actions))
        exp_reward = np.where(did, np.asarray(delta), 0)
        assert np.array_equal(np.asarray(reward), exp_reward)

        merged = np.asarray(engine.assemble_cells(sel_cells, 4)).reshape(b, 16)
        pre = np.asarray(pre_cm).T
        orig = np.asarray(boards).reshape(b, 16)
        done = ~np.asarray(jnp.stack(legal_list)).any(0)
        new = np.asarray(new_cm).T
        for i in range(b):
            if did[i]:
                diff = pre[i] - merged[i]
                nz = np.nonzero(diff)[0]
                assert len(nz) == 1  # exactly one spawned tile
                assert merged[i][nz[0]] == 0 and pre[i][nz[0]] in (1, 2)
            else:
                assert np.array_equal(pre[i], orig[i])
            if done[i]:
                vals = new[i][new[i] > 0]
                assert len(vals) == 2 and set(vals) <= {1, 2}
            else:
                assert np.array_equal(new[i], pre[i])

        # emitted legality matches recomputed legality of the new boards
        new_boards = jnp.asarray(new).reshape(b, 4, 4)
        expect_legal = jnp.stack(
            [
                l.astype(jnp.int32)
                for l in engine.legal_cells(engine.split_cells(new_boards), 4)
            ]
        )
        assert np.array_equal(np.asarray(new_legal_cm), np.asarray(expect_legal))
