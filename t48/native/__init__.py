"""ctypes bindings for the native C++ bitboard engine.

Builds ``libt48.so`` from board2048.cpp on first import if missing (one
``g++ -O3`` invocation; no external deps). If no C++ toolchain is
available the module degrades gracefully: ``available()`` returns False
and callers fall back to the Python golden model.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "board2048.cpp")
_LIB = os.path.join(_DIR, "libt48.so")

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
        capture_output=True,
    )


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None:
        return _lib
    try:
        if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
    except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
        _load_error = str(e)
        return None

    u64, u32, i32 = ctypes.c_uint64, ctypes.c_uint32, ctypes.c_int
    p_u64 = ctypes.POINTER(u64)
    p_u32 = ctypes.POINTER(u32)
    p_i32 = ctypes.POINTER(i32)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)

    lib.t48_init.restype = None
    lib.t48_move.argtypes = [u64, i32, p_u32, p_i32]
    lib.t48_move.restype = u64
    lib.t48_legal_mask.argtypes = [u64]
    lib.t48_legal_mask.restype = i32
    lib.t48_step.argtypes = [u64, i32, p_u64, p_u32, p_i32]
    lib.t48_step.restype = u64
    lib.t48_spawn.argtypes = [u64, p_u64]
    lib.t48_spawn.restype = u64
    lib.t48_new_board.argtypes = [p_u64]
    lib.t48_new_board.restype = u64
    lib.t48_max_exponent.argtypes = [u64]
    lib.t48_max_exponent.restype = i32
    lib.t48_count_empty.argtypes = [u64]
    lib.t48_count_empty.restype = i32
    lib.t48_pack.argtypes = [p_u8]
    lib.t48_pack.restype = u64
    lib.t48_unpack.argtypes = [u64, p_u8]
    lib.t48_unpack.restype = None
    lib.t48_random_rollout.argtypes = [u64, i32, i32, p_u32, p_u8, p_i32]
    lib.t48_random_rollout.restype = ctypes.c_long
    lib.t48_format_episodes_jsonl.argtypes = [
        p_i32, i32, ctypes.c_longlong, ctypes.c_char_p, ctypes.c_long
    ]
    lib.t48_format_episodes_jsonl.restype = ctypes.c_long

    lib.t48_init()
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_error() -> Optional[str]:
    _load()
    return _load_error


class FastBoard:
    """Native-backed single board with the GoldenBoard API subset the
    search layer needs (clone/peek_action/available_moves/merge_score/
    state/exponents/max_tile/__contains__).

    Spawn randomness uses the library's xorshift64 stream — fast and
    deterministic per seed, but NOT the reference's host RNG streams;
    exact-parity work stays on the golden model.
    """

    _ACTIONS = ("up", "down", "left", "right")

    def __init__(self, seed: int = 1, _raw=None, _rng=None, _score=0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native engine unavailable: {_load_error}")
        self._lib = lib
        if _rng is None:
            _rng = ctypes.c_uint64(seed if seed else 0x9E3779B97F4A7C15)
        self._rng = _rng
        if _raw is None:
            _raw = lib.t48_new_board(ctypes.byref(self._rng))
        self.raw = _raw
        self._mergescore = _score

    def clone(self) -> "FastBoard":
        # shares the RNG stream (a single search consumes one stream)
        return FastBoard(_raw=self.raw, _rng=self._rng, _score=self._mergescore)

    @classmethod
    def from_exponents(cls, exponents, seed: int = 1) -> "FastBoard":
        """Board from a 4x4 (or flat 16) array of tile exponents
        (0 = empty, n = 2^n tile) — test/fixture constructor."""
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native engine unavailable: {_load_error}")
        flat = np.ascontiguousarray(
            np.asarray(exponents, np.uint8).reshape(16)
        )
        raw = lib.t48_pack(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return cls(seed=seed, _raw=raw)

    def exponents(self) -> np.ndarray:
        buf = (ctypes.c_uint8 * 16)()
        self._lib.t48_unpack(self.raw, buf)
        return np.frombuffer(buf, np.uint8).astype(np.int32).reshape(4, 4)

    @property
    def state(self) -> np.ndarray:
        e = self.exponents()
        return np.where(e == 0, 0, 2 ** e.astype(np.int64))

    def merge_score(self) -> int:
        return self._mergescore

    def max_tile(self) -> int:
        e = self._lib.t48_max_exponent(self.raw)
        return 0 if e == 0 else 2**e

    def simple_score(self) -> int:
        return int(self.state.sum())

    def number_of_empty_cells(self) -> int:
        return self._lib.t48_count_empty(self.raw)

    def __contains__(self, value) -> bool:
        return bool(np.isin(value, self.state).all())

    def legal_mask(self) -> int:
        return self._lib.t48_legal_mask(self.raw)

    def peek_action(self, action) -> "FastBoard":
        if isinstance(action, str):
            initial = action.lower()[0]
            action = "udlr".index(initial)
        delta = ctypes.c_uint32()
        changed = ctypes.c_int()
        new_raw = self._lib.t48_step(
            self.raw, int(action), ctypes.byref(self._rng),
            ctypes.byref(delta), ctypes.byref(changed),
        )
        return FastBoard(
            _raw=new_raw, _rng=self._rng,
            _score=self._mergescore + (delta.value if changed.value else 0),
        )

    def available_moves(self) -> dict:
        mask = self.legal_mask()
        return {
            name: self.peek_action(i)
            for i, name in enumerate(self._ACTIONS)
            if mask & (1 << i)
        }


def random_rollout(seed: int, n_games: int, max_steps: int = 10_000):
    """Batched host rollouts. Returns (total_steps, scores, max_tiles,
    moves) numpy arrays."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native engine unavailable: {_load_error}")
    scores = np.zeros(n_games, np.uint32)
    max_exps = np.zeros(n_games, np.uint8)
    moves = np.zeros(n_games, np.int32)
    total = lib.t48_random_rollout(
        seed,
        n_games,
        max_steps,
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        max_exps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        moves.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    max_tiles = np.where(max_exps == 0, 0, 2 ** max_exps.astype(np.int64))
    return total, scores, max_tiles, moves


def format_episodes_jsonl(rows: np.ndarray, number_base: int = 0) -> bytes:
    """Format the trainer's packed int32 [N, 7] episode rows (max_tile,
    merge_score, number, reward_bits, q_bits, eps_bits, number_moves)
    into JSONL bytes — the native episode sink (~20× the Python
    per-episode formatting; see board2048.cpp). ``number_base`` is added
    to the episode number (int64 in C) so device-rebased counters format
    as absolute numbers. Raises if the native library is unavailable —
    callers fall back to the Python path."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native engine unavailable: {_load_error}")
    rows = np.ascontiguousarray(rows, np.int32)
    n = rows.shape[0]
    cap = 256 * n + 16
    buf = np.empty(cap, np.uint8)  # no memset (create_string_buffer zeroes)
    written = lib.t48_format_episodes_jsonl(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        number_base,
        buf.ctypes.data_as(ctypes.c_char_p),
        cap,
    )
    if written < 0:
        raise RuntimeError("episode JSONL buffer overflow")
    return buf[:written].tobytes()
