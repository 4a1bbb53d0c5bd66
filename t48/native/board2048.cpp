// t48 native engine: bitboard 2048 with precomputed row LUTs.
//
// The TPU compute path is JAX/XLA (t48/env/engine.py); this is the *host*
// runtime component: a C++ golden engine used by the pointer-chasing
// best-first search (t48/search) — which must not be jitted (SURVEY.md §7
// "hard parts") — and as a second independent implementation for
// cross-validating merge semantics (reference: board.py:92-126).
//
// Representation: one uint64_t per 4x4 board, 16 nibbles of log2
// exponents (0 = empty, e = tile 2^e), row-major, cell (r, c) at bits
// 4*(4*r + c). Row merges resolve through a 65536-entry LUT built once at
// init; the four directions come from nibble reversal and bitboard
// transposition, mirroring the reference's flip/transpose construction
// (board.py:147-183).
//
// Exponents saturate at 15 (tile 32768): beyond any state reachable in
// the searches this engine serves. The Python golden model remains the
// unbounded oracle.
//
// Build: g++ -O3 -shared -fPIC -o libt48.so board2048.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct RowResult {
  uint16_t row;
  uint32_t score;
  uint8_t changed;
};

RowResult g_lut[65536];
bool g_inited = false;

// Merge one row of 4 exponent nibbles toward index 0 (the 'left' move),
// reference semantics: compact non-zeros, single merge per adjacent equal
// pair resolved in move direction, score += merged tile value
// (board.py:92-126, golden-tested against tests/test_game_board.py:8-23).
RowResult merge_row_left(uint16_t row) {
  int cells[4] = {
      (row >> 0) & 0xF, (row >> 4) & 0xF, (row >> 8) & 0xF, (row >> 12) & 0xF};
  int compact[4] = {0, 0, 0, 0};
  int n = 0;
  for (int i = 0; i < 4; ++i)
    if (cells[i] != 0) compact[n++] = cells[i];
  int out[4] = {0, 0, 0, 0};
  uint32_t score = 0;
  int w = 0;
  for (int i = 0; i < n; ++i) {
    if (i + 1 < n && compact[i] == compact[i + 1]) {
      int e = compact[i] + 1;
      if (e > 15) e = 15;  // saturate (documented)
      out[w++] = e;
      score += (uint32_t)1 << e;
      ++i;  // each tile merges at most once
    } else {
      out[w++] = compact[i];
    }
  }
  uint16_t packed = (uint16_t)(out[0] | (out[1] << 4) | (out[2] << 8) |
                               (out[3] << 12));
  RowResult r;
  r.row = packed;
  r.score = score;
  r.changed = packed != row;
  return r;
}

inline uint16_t reverse_row(uint16_t row) {
  return (uint16_t)(((row & 0x000F) << 12) | ((row & 0x00F0) << 4) |
                    ((row & 0x0F00) >> 4) | ((row & 0xF000) >> 12));
}

// Transpose the 4x4 nibble matrix (standard bitboard delta swaps).
inline uint64_t transpose(uint64_t x) {
  uint64_t a1 = x & 0xF0F00F0FF0F00F0FULL;
  uint64_t a2 = x & 0x0000F0F00000F0F0ULL;
  uint64_t a3 = x & 0x0F0F00000F0F0000ULL;
  uint64_t a = a1 | (a2 << 12) | (a3 >> 12);
  uint64_t b1 = a & 0xFF00FF0000FF00FFULL;
  uint64_t b2 = a & 0x00FF00FF00000000ULL;
  uint64_t b3 = a & 0x00000000FF00FF00ULL;
  return b1 | (b2 >> 24) | (b3 << 24);
}

struct MoveResult {
  uint64_t board;
  uint32_t score;
  uint8_t changed;
};

MoveResult apply_rows_left(uint64_t board) {
  MoveResult r{0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    uint16_t row = (uint16_t)((board >> (16 * i)) & 0xFFFF);
    const RowResult &lut = g_lut[row];
    r.board |= (uint64_t)lut.row << (16 * i);
    r.score += lut.score;
    r.changed |= lut.changed;
  }
  return r;
}

MoveResult apply_rows_right(uint64_t board) {
  MoveResult r{0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    uint16_t row = (uint16_t)((board >> (16 * i)) & 0xFFFF);
    const RowResult &lut = g_lut[reverse_row(row)];
    r.board |= (uint64_t)reverse_row(lut.row) << (16 * i);
    r.score += lut.score;
    r.changed |= lut.changed;
  }
  return r;
}

// Actions follow the reference order: 0=up 1=down 2=left 3=right
// (board.py:129).
MoveResult apply_move(uint64_t board, int action) {
  MoveResult r;
  switch (action) {
    case 0: {  // up: transpose, left, transpose (board.py:147-154)
      uint64_t t = transpose(board);
      r = apply_rows_left(t);
      r.board = transpose(r.board);
      return r;
    }
    case 1: {  // down (board.py:156-164)
      uint64_t t = transpose(board);
      r = apply_rows_right(t);
      r.board = transpose(r.board);
      return r;
    }
    case 2:  // left (board.py:166-173)
      return apply_rows_left(board);
    default:  // right (board.py:175-183)
      return apply_rows_right(board);
  }
}

inline uint64_t xorshift64(uint64_t *s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  *s = x;
  return x;
}

// Spawn a 2 (exp 1) or 4 (exp 2) uniformly in a random empty cell
// (board.py:41-51 semantics; uniform 2/4 like the reference, not 90/10).
uint64_t spawn(uint64_t board, uint64_t *rng) {
  int empties[16];
  int n = 0;
  for (int i = 0; i < 16; ++i)
    if (((board >> (4 * i)) & 0xF) == 0) empties[n++] = i;
  if (n == 0) return board;
  uint64_t r = xorshift64(rng);
  int cell = empties[r % n];
  uint64_t val = ((r >> 32) & 1) ? 2 : 1;
  return board | (val << (4 * cell));
}

}  // namespace

extern "C" {

void t48_init() {
  if (g_inited) return;
  for (uint32_t row = 0; row < 65536; ++row)
    g_lut[row] = merge_row_left((uint16_t)row);
  g_inited = true;
}

// One move attempt WITHOUT spawn. Returns the post-merge board; writes
// the merge-score delta and whether the board changed.
uint64_t t48_move(uint64_t board, int action, uint32_t *score_delta,
                  int *changed) {
  MoveResult r = apply_move(board, action);
  if (score_delta) *score_delta = r.score;
  if (changed) *changed = r.changed;
  return r.changed ? r.board : board;
}

// Bitmask of legal moves (bit a set iff action a changes the board),
// board.py:128-135 semantics.
int t48_legal_mask(uint64_t board) {
  int mask = 0;
  for (int a = 0; a < 4; ++a)
    if (apply_move(board, a).changed) mask |= 1 << a;
  return mask;
}

// Full env step: move + spawn-if-changed (board.py:147-183 +
// _populate_empty_cell). rng_state is caller-owned xorshift64 state.
uint64_t t48_step(uint64_t board, int action, uint64_t *rng_state,
                  uint32_t *score_delta, int *changed) {
  MoveResult r = apply_move(board, action);
  if (score_delta) *score_delta = r.score;
  if (changed) *changed = r.changed;
  if (!r.changed) return board;
  return spawn(r.board, rng_state);
}

uint64_t t48_spawn(uint64_t board, uint64_t *rng_state) {
  return spawn(board, rng_state);
}

uint64_t t48_new_board(uint64_t *rng_state) {
  uint64_t b = spawn(0, rng_state);
  return spawn(b, rng_state);
}

int t48_max_exponent(uint64_t board) {
  int m = 0;
  for (int i = 0; i < 16; ++i) {
    int e = (board >> (4 * i)) & 0xF;
    if (e > m) m = e;
  }
  return m;
}

int t48_count_empty(uint64_t board) {
  int n = 0;
  for (int i = 0; i < 16; ++i)
    if (((board >> (4 * i)) & 0xF) == 0) ++n;
  return n;
}

// Pack/unpack helpers for Python interop: 16 exponent bytes, row-major.
uint64_t t48_pack(const uint8_t *exponents) {
  uint64_t b = 0;
  for (int i = 0; i < 16; ++i)
    b |= (uint64_t)(exponents[i] & 0xF) << (4 * i);
  return b;
}

void t48_unpack(uint64_t board, uint8_t *exponents) {
  for (int i = 0; i < 16; ++i)
    exponents[i] = (uint8_t)((board >> (4 * i)) & 0xF);
}

// Batched random-legal-policy rollouts on the host: the CPU yardstick for
// the JAX engine's throughput (and a sanity oracle for game-length /
// score distributions). Returns total steps taken.
long t48_random_rollout(uint64_t seed, int n_games, int max_steps,
                        uint32_t *out_scores, uint8_t *out_max_exps,
                        int *out_moves) {
  uint64_t rng = seed ? seed : 0x9E3779B97F4A7C15ULL;
  long total_steps = 0;
  for (int g = 0; g < n_games; ++g) {
    uint64_t board = t48_new_board(&rng);
    uint32_t score = 0;
    int moves = 0;
    while (moves < max_steps) {
      int mask = t48_legal_mask(board);
      if (!mask) break;
      // uniform over legal actions
      int legal[4], n = 0;
      for (int a = 0; a < 4; ++a)
        if (mask & (1 << a)) legal[n++] = a;
      int action = legal[xorshift64(&rng) % n];
      uint32_t delta = 0;
      int changed = 0;
      board = t48_step(board, action, &rng, &delta, &changed);
      score += delta;
      ++moves;
      ++total_steps;
    }
    if (out_scores) out_scores[g] = score;
    if (out_max_exps) out_max_exps[g] = (uint8_t)t48_max_exponent(board);
    if (out_moves) out_moves[g] = moves;
  }
  return total_steps;
}

// ---------------------------------------------------------------------------
// Episode sink: JSONL formatting of the trainer's per-episode metric rows.
//
// The training loop drains hundreds of thousands of completed episodes per
// second at large env batches (t48/train/loop.py drain); formatting each as
// a JSON line in Python costs ~1.5us/episode even with f-strings and was a
// measurable slice of the host critical path. This formatter takes the
// drain's packed int32 [n][7] rows (max_tile, merge_score, number,
// reward_bits, q_bits, eps_bits, number_moves — floats bitcast to int32)
// and emits the exact JSONL schema the Python path writes. %.9g round-trips
// every float32 value.
// ---------------------------------------------------------------------------

static inline float bits_to_float(int32_t b) {
  float f;
  memcpy(&f, &b, sizeof(f));
  return f;
}

// Returns bytes written (excluding NUL), or -1 if `cap` is too small.
// Each line ends with '\n'. `number_base` is added to the (device-rebased
// int32) episode number so absolute numbers past 2^31 format correctly
// (t48/train/loop.py finish_drain).
long t48_format_episodes_jsonl(const int32_t *rows, int n,
                               long long number_base, char *out, long cap) {
  long w = 0;
  for (int i = 0; i < n; ++i) {
    const int32_t *r = rows + 7 * i;
    if (cap - w < 256) return -1;  // worst-case line length bound
    int k = snprintf(
        out + w, (size_t)(cap - w),
        "{\"max_tile\": %d, \"merge_score\": %d, \"number\": %lld, "
        "\"reward\": %.9g, \"q_value\": %.9g, \"epsilon\": %.9g, "
        "\"number_moves\": %d}\n",
        r[0], r[1], (long long)r[2] + number_base,
        (double)bits_to_float(r[3]), (double)bits_to_float(r[4]),
        (double)bits_to_float(r[5]), r[6]);
    if (k < 0 || k >= cap - w) return -1;
    w += k;
  }
  return w;
}

}  // extern "C"
