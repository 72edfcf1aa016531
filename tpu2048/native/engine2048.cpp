// Native host-side 2048 engine: 64-bit bitboards + 65536-entry row LUTs.
//
// The TPU compute path of this framework is the jitted JAX engine
// (tpu2048/env/engine.py); this C++ tier is the host runtime around it:
//  * a fast oracle for mass property-testing the JAX engine (millions of
//    transitions/second, far beyond the pure-Python oracle),
//  * host-side batch playouts for tooling (demo export, interactive clients)
//    without touching an accelerator.
//
// Semantics match the reference implementation exactly (reference
// game.py:121-330): left-priority single merge per tile, score = value of each
// created tile, legality = "move changes the board", spawn 90% tile-2 / 10%
// tile-4 on a uniform empty cell. Boards store EXPONENTS, 4 bits per cell
// (row-major), which caps tiles at 2^15 — beyond any reachable 4x4 game.
//
// Build: g++ -O3 -shared -fPIC -o libengine2048.so engine2048.cpp
// ABI: plain C functions (see extern "C" block) consumed via ctypes.

#include <cstdint>
#include <cstring>

namespace {

using u64 = uint64_t;
using u16 = uint16_t;

struct RowResult {
  u16 row;
  int32_t score;
  int32_t max_created;
};

RowResult g_left[65536];
RowResult g_right[65536];
bool g_init = false;

inline int cell(u16 row, int i) { return (row >> (4 * i)) & 0xF; }

u16 pack(const int c[4]) {
  return (u16)(c[0] | (c[1] << 4) | (c[2] << 8) | (c[3] << 12));
}

RowResult merge_left(u16 row) {
  int vals[4], n = 0;
  for (int i = 0; i < 4; ++i) {
    int v = cell(row, i);
    if (v) vals[n++] = v;
  }
  int out[4] = {0, 0, 0, 0};
  int m = 0, score = 0, maxc = 0;
  for (int i = 0; i < n; ++i) {
    if (i + 1 < n && vals[i] == vals[i + 1]) {
      int e = vals[i] + 1;
      if (e > 15) e = 15;  // bitboard cap; unreachable in real play
      out[m++] = e;
      score += 1 << e;
      if (e > maxc) maxc = e;
      ++i;
    } else {
      out[m++] = vals[i];
    }
  }
  return {pack(out), score, maxc};
}

u16 reverse_row(u16 row) {
  return (u16)(((row & 0x000F) << 12) | ((row & 0x00F0) << 4) |
               ((row & 0x0F00) >> 4) | ((row & 0xF000) >> 12));
}

void ensure_tables() {
  if (g_init) return;
  for (uint32_t r = 0; r < 65536; ++r) {
    RowResult L = merge_left((u16)r);
    g_left[r] = L;
    RowResult R = merge_left(reverse_row((u16)r));
    g_right[r] = {reverse_row(R.row), R.score, R.max_created};
  }
  g_init = true;
}

inline u16 get_row(u64 b, int r) { return (u16)((b >> (16 * r)) & 0xFFFF); }

inline u64 set_row(u64 b, int r, u16 row) {
  return (b & ~(0xFFFFULL << (16 * r))) | ((u64)row << (16 * r));
}

u64 transpose(u64 b) {
  // 4x4 nibble transpose.
  u64 a1 = b & 0xF0F00F0FF0F00F0FULL;
  u64 a2 = b & 0x0000F0F00000F0F0ULL;
  u64 a3 = b & 0x0F0F00000F0F0000ULL;
  u64 a = a1 | (a2 << 12) | (a3 >> 12);
  u64 b1 = a & 0xFF00FF0000FF00FFULL;
  u64 b2 = a & 0x00FF00FF00000000ULL;
  u64 b3 = a & 0x00000000FF00FF00ULL;
  return b1 | (b2 >> 24) | (b3 << 24);
}

struct MoveOut {
  u64 board;
  int32_t score;
  int32_t max_created;
  bool changed;
};

// dir: 0=UP 1=DOWN 2=LEFT 3=RIGHT (model-output convention).
MoveOut do_move(u64 b, int dir) {
  ensure_tables();
  u64 work = (dir <= 1) ? transpose(b) : b;
  const RowResult* tab = (dir == 0 || dir == 2) ? g_left : g_right;
  u64 out = 0;
  int score = 0, maxc = 0;
  for (int r = 0; r < 4; ++r) {
    const RowResult& rr = tab[get_row(work, r)];
    out = set_row(out, r, rr.row);
    score += rr.score;
    if (rr.max_created > maxc) maxc = rr.max_created;
  }
  if (dir <= 1) out = transpose(out);
  return {out, score, maxc, out != b};
}

struct Rng {
  u64 s;
  explicit Rng(u64 seed) : s(seed ? seed : 0x9E3779B97F4A7C15ULL) {}
  u64 next() {  // xorshift64*
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int below(int n) { return (int)(next() % (u64)n); }
};

u64 spawn(u64 b, Rng& rng) {
  int empties[16], n = 0;
  for (int i = 0; i < 16; ++i)
    if (((b >> (4 * i)) & 0xF) == 0) empties[n++] = i;
  if (!n) return b;
  int c = empties[rng.below(n)];
  u64 v = rng.uniform() < 0.9 ? 1 : 2;
  return b | (v << (4 * c));
}

int legal_mask(u64 b) {
  int m = 0;
  for (int d = 0; d < 4; ++d)
    if (do_move(b, d).changed) m |= 1 << d;
  return m;
}

int64_t board_score(u64 b) {
  int64_t s = 0;
  for (int i = 0; i < 16; ++i) {
    int v = (b >> (4 * i)) & 0xF;
    if (v) s += (int64_t)1 << v;
  }
  return s;
}

void unpack_board(u64 b, int32_t* out16) {
  for (int i = 0; i < 16; ++i) out16[i] = (b >> (4 * i)) & 0xF;
}

u64 pack_board(const int32_t* in16) {
  u64 b = 0;
  for (int i = 0; i < 16; ++i) b |= ((u64)(in16[i] & 0xF)) << (4 * i);
  return b;
}

}  // namespace

extern "C" {

// Single-board API (exponent arrays are length-16 row-major int32).
void engine_init() { ensure_tables(); }

// Returns 1 if changed; fills out16/score/max_created.
int engine_move(const int32_t* in16, int dir, int32_t* out16,
                int32_t* score, int32_t* max_created) {
  MoveOut mo = do_move(pack_board(in16), dir);
  unpack_board(mo.board, out16);
  *score = mo.score;
  *max_created = mo.max_created;
  return mo.changed ? 1 : 0;
}

int engine_legal_mask(const int32_t* in16) { return legal_mask(pack_board(in16)); }

int64_t engine_score(const int32_t* in16) { return board_score(pack_board(in16)); }

void engine_spawn(int32_t* board16, uint64_t seed) {
  Rng rng(seed);
  unpack_board(spawn(pack_board(board16), rng), board16);
}

// Batch API: n boards, contiguous int32[n*16]; dirs int32[n].
// Fills out boards, scores, max_created, changed flags.
void engine_move_batch(const int32_t* in, const int32_t* dirs, int n,
                       int32_t* out, int32_t* scores, int32_t* maxc,
                       int32_t* changed) {
  ensure_tables();
  for (int i = 0; i < n; ++i) {
    MoveOut mo = do_move(pack_board(in + 16 * i), dirs[i]);
    unpack_board(mo.board, out + 16 * i);
    scores[i] = mo.score;
    maxc[i] = mo.max_created;
    changed[i] = mo.changed ? 1 : 0;
  }
}

void engine_legal_mask_batch(const int32_t* in, int n, int32_t* masks) {
  ensure_tables();
  for (int i = 0; i < n; ++i) masks[i] = legal_mask(pack_board(in + 16 * i));
}

// Play n full games with uniform-random legal actions (RNG per game derived
// from seed). Returns final scores, move counts and max tiles; used for
// engine cross-validation and host-side throughput baselines.
void engine_random_playout(int n, uint64_t seed, int64_t* final_scores,
                           int32_t* num_moves, int32_t* max_tiles,
                           int64_t* total_env_steps) {
  ensure_tables();
  int64_t steps = 0;
  for (int g = 0; g < n; ++g) {
    Rng rng(seed + (u64)g * 0x9E3779B97F4A7C15ULL);
    u64 b = spawn(spawn(0, rng), rng);
    int64_t score = 0;
    int moves = 0;
    for (;;) {
      int mask = legal_mask(b);
      if (!mask) break;
      int nlegal = __builtin_popcount(mask);
      int pick = rng.below(nlegal);
      int dir = 0;
      for (int d = 0; d < 4; ++d) {
        if (mask & (1 << d)) {
          if (pick-- == 0) { dir = d; break; }
        }
      }
      MoveOut mo = do_move(b, dir);
      score += mo.score;
      b = spawn(mo.board, rng);
      ++moves;
    }
    final_scores[g] = score;
    num_moves[g] = moves;
    int mx = 0;
    for (int i = 0; i < 16; ++i) {
      int v = (b >> (4 * i)) & 0xF;
      if (v > mx) mx = v;
    }
    max_tiles[g] = mx ? (1 << mx) : 0;
    steps += moves;
  }
  *total_env_steps = steps;
}

}  // extern "C"
