"""Native C++ engine: build, exhaustive merge parity, rollouts, search."""

import ctypes
import itertools

import numpy as np
import pytest

from t48 import native
from t48.env.golden import GoldenBoard, merge_row_left

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native engine unavailable: {native.load_error()}"
)


def pack(exps_flat):
    buf = (ctypes.c_uint8 * 16)(*[int(e) for e in exps_flat])
    return native._load().t48_pack(buf)


def unpack(raw):
    buf = (ctypes.c_uint8 * 16)()
    native._load().t48_unpack(raw, buf)
    return np.frombuffer(buf, np.uint8).astype(int)


class TestMergeParity:
    def test_exhaustive_rows_vs_golden(self):
        """All 4-nibble rows with exponents ≤ 11: LUT == golden model."""
        lib = native._load()
        for exps in itertools.product(range(12), repeat=4):
            # build a board whose first row is the case, rest empty
            flat = list(exps) + [0] * 12
            raw = pack(flat)
            delta = ctypes.c_uint32()
            changed = ctypes.c_int()
            out = lib.t48_move(raw, 2, ctypes.byref(delta), ctypes.byref(changed))
            got = unpack(out)[:4]
            vals = np.where(np.array(exps) == 0, 0, 2 ** np.array(exps))
            want_vals, want_score = merge_row_left(vals)
            want_exps = np.where(
                want_vals == 0, 0, np.log2(np.maximum(want_vals, 1)).astype(int)
            )
            assert np.array_equal(got, want_exps), exps
            assert delta.value == want_score, exps

    def test_all_directions_random_boards_vs_golden(self):
        lib = native._load()
        rng = np.random.default_rng(0)
        for _ in range(200):
            exps = rng.integers(0, 8, size=16)
            raw = pack(exps)
            golden = GoldenBoard(k=4, populate_empty_cells=False)
            e = exps.reshape(4, 4)
            golden.state = np.where(e == 0, 0, 2 ** e.astype(np.int64))
            for a, name in enumerate(("up", "down", "left", "right")):
                delta = ctypes.c_uint32()
                changed = ctypes.c_int()
                out = lib.t48_move(raw, a, ctypes.byref(delta), ctypes.byref(changed))
                want_state, want_score = golden._merge_all_rows_for(name)
                got_e = unpack(out).reshape(4, 4)
                got_vals = np.where(got_e == 0, 0, 2 ** got_e.astype(np.int64))
                if changed.value:
                    assert np.array_equal(got_vals, want_state), (exps, name)
                else:
                    assert np.array_equal(want_state, golden.state)
                assert delta.value == want_score
            mask = lib.t48_legal_mask(raw)
            want_mask = golden.available_moves_mask()
            got_mask = [(mask >> a) & 1 for a in range(4)]
            assert got_mask == list(want_mask.astype(int))


class TestFastBoard:
    def test_new_board_has_two_tiles(self):
        b = native.FastBoard(seed=42)
        assert (b.exponents() != 0).sum() == 2
        assert b.merge_score() == 0

    def test_play_episode(self):
        b = native.FastBoard(seed=7)
        rng = np.random.default_rng(0)
        steps = 0
        while b.legal_mask() and steps < 5000:
            legal = [a for a in range(4) if b.legal_mask() & (1 << a)]
            b = b.peek_action(int(rng.choice(legal)))
            steps += 1
        assert steps > 20
        assert b.merge_score() > 0
        assert b.max_tile() >= 16

    def test_available_moves_api(self):
        b = native.FastBoard(seed=1)
        moves = b.available_moves()
        assert set(moves) <= {"up", "down", "left", "right"}
        assert moves
        for name, child in moves.items():
            assert not np.array_equal(child.state, b.state)


class TestRollout:
    def test_random_rollout_stats(self):
        total, scores, max_tiles, moves = native.random_rollout(3, 200)
        assert total == moves.sum()
        assert (moves > 10).all()
        assert scores.mean() > 100
        assert max_tiles.max() >= 32


class TestSearchOnNative:
    def test_best_first_with_fastboard(self):
        from t48.search.astar import best_first_search

        board = native.FastBoard(seed=5)
        result = best_first_search(board, goal_tile=64, max_expansions=5000)
        assert result["success"]
        node = result["current_node"]
        assert 64 in node.board
        path = node.path_from_root()
        assert path[0].is_root()


class TestEpisodeSink:
    def test_jsonl_matches_python_formatting(self):
        """The native episode sink's JSONL parses to the same values the
        Python path would produce (same 7-key schema; float32-exact)."""
        import json

        import numpy as np

        from t48 import native

        if not native.available():
            import pytest

            pytest.skip(native.load_error())

        def bits(x):
            return np.float32(x).view(np.int32)

        rows = np.array(
            [
                [128, 1860, 890, bits(12.5), bits(-0.321), bits(0.01), 144],
                [2048, 33333, 12345, bits(0.0), bits(1e-7), bits(1.0), 9],
                [4, 0, 0, bits(-0.0), bits(3.14159), bits(0.5), 1],
            ],
            np.int32,
        )
        out = native.format_episodes_jsonl(rows).decode()
        lines = out.splitlines()
        assert len(lines) == 3
        for line, r in zip(lines, rows):
            d = json.loads(line)
            assert list(d) == [
                "max_tile", "merge_score", "number", "reward",
                "q_value", "epsilon", "number_moves",
            ]
            assert d["max_tile"] == int(r[0])
            assert d["merge_score"] == int(r[1])
            assert d["number"] == int(r[2])
            assert d["number_moves"] == int(r[6])
            for key, col in (("reward", 3), ("q_value", 4), ("epsilon", 5)):
                assert np.float32(d[key]) == r[col].view(np.float32)

    def test_drain_attaches_native_jsonl(self):
        """finish_drain attaches the native bytes; Experiment consumes
        them (episodes.jsonl content parses to the drained episodes)."""
        import json

        from t48.configs import get_preset
        from t48.train import loop as loop_lib

        cfg = get_preset(
            "dense", env_batch=8, batch_size=16, replay_buffer_length=128,
            no_episodes_before_training=2, chunk_iters=64,
            episode_log_size=256, seed=0,
        )
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        episodes = []
        for _ in range(6):  # episodes take ~110+ steps to finish
            state, _ = chunk(state)
            episodes, dropped = loop_lib.drain_episode_log(state.log)
            assert dropped == 0
            if episodes:
                break
        assert episodes
        from t48 import native

        if native.available():
            assert episodes.jsonl is not None
            parsed = [
                json.loads(l) for l in episodes.jsonl.decode().splitlines()
            ]
            assert len(parsed) == len(episodes)
            for a, b in zip(parsed, episodes):
                assert a["max_tile"] == b["max_tile"]
                assert a["number"] == b["number"]
