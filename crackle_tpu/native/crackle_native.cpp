// Native host kernels for crackle_tpu.
//
// The TPU owns the data-parallel decode path; these C++ routines cover
// the intrinsically serial host-side hot loops (the reference keeps
// them in C++ too): the crack-code DFS trace on encode, union-find CCL
// raster scans, VCG replay for the host decode fallback, and the
// markov bitstream walk. Exposed through a plain C ABI consumed with
// ctypes (no pybind11 dependency).
//
// Semantics mirror crackle_tpu/ops/crackcode.py and ops/ccl.py, which
// follow the reference (src/crackcodes.hpp, src/cc3d.hpp).
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint8_t UP = 0b00, RIGHT = 0b01, DOWN = 0b10, LEFT = 0b11;

inline int popcount4(uint8_t v) { return __builtin_popcount(v & 0xF); }
inline int ctz4(uint8_t v) { return __builtin_ctz(v); }

// ---------------------------------------------------------------------
// crack trace (encode)
// ---------------------------------------------------------------------

// Trace all chains of one slice. adjacency is the (sx+1)*(sy+1) corner
// graph bit array (mutated). Emits per chain: start node and a symbol
// string from {u,d,l,r,b,t,s}. Returns number of chains, or -1 if the
// symbol buffer overflows.
int64_t trace_slice_symbols(
  uint8_t* adj, int64_t sx, int64_t sy,
  uint8_t* out_symbols, int64_t sym_cap,
  int64_t* out_nodes, int64_t* out_lens, int64_t max_chains
) {
  const int64_t sxe = sx + 1;
  const int64_t n = sxe * (sy + 1);
  const int64_t deltas[4] = {1, -1, sxe, -sxe};
  static const char syms[4] = {'r', 'l', 'd', 'u'};

  int64_t n_chains = 0;
  int64_t sym_used = 0;
  std::vector<int64_t> revisit;
  revisit.reserve(256);

  for (int64_t start = 0; start < n; start++) {
    if (!adj[start]) continue;
    if (n_chains >= max_chains) return -1;

    int64_t node = start;
    int64_t code_begin = sym_used;
    int64_t branches_taken = 1;
    revisit.clear();

    while (adj[node] || !revisit.empty()) {
      uint8_t a = adj[node];
      if (!a) {
        if (sym_used >= sym_cap) return -1;
        out_symbols[sym_used++] = 't';
        branches_taken--;
        node = revisit.back();
        revisit.pop_back();
        continue;
      }
      if (popcount4(a) > 1) {
        if (sym_used >= sym_cap) return -1;
        out_symbols[sym_used++] = 'b';
        revisit.push_back(node);
        branches_taken++;
      }
      int d = ctz4(a);
      int64_t nxt = node + deltas[d];
      if (sym_used >= sym_cap) return -1;
      out_symbols[sym_used++] = syms[d];
      switch (d) {
        case 0: adj[node] &= 0b1110; adj[nxt] &= 0b1101; break; // right
        case 1: adj[nxt] &= 0b1110; adj[node] &= 0b1101; break; // left
        case 2: adj[node] &= 0b1011; adj[nxt] &= 0b0111; break; // down
        case 3: adj[nxt] &= 0b1011; adj[node] &= 0b0111; break; // up
      }
      node = nxt;
    }

    if (sym_used + branches_taken > sym_cap) return -1;
    for (int64_t k = 0; k < branches_taken; k++) {
      out_symbols[sym_used++] = 't';
    }

    // remove_initial_branch: if the chain opens with a simple branch,
    // reverse the first segment and relocate the start node.
    uint8_t* code = out_symbols + code_begin;
    int64_t code_len = sym_used - code_begin;
    int64_t adj_start = start;
    if (code_len > 0 && code[0] == 'b') {
      int64_t i = 1;
      bool simple = true;
      while (code[i] != 't') {
        if (code[i] == 'b') { simple = false; break; }
        i++;
      }
      if (simple) {
        int64_t y = start / sxe;
        int64_t x = start - sxe * y;
        code[0] = 's';
        i = 1;
        while (code[i] != 't') {
          switch (code[i]) {
            case 'u': y--; code[i] = 'd'; break;
            case 'd': y++; code[i] = 'u'; break;
            case 'l': x--; code[i] = 'r'; break;
            case 'r': x++; code[i] = 'l'; break;
            default: break; // 's'
          }
          i++;
        }
        code[i] = 's';
        int64_t last = i - 1;
        for (int64_t a2 = 1, b2 = last; a2 < b2; a2++, b2--) {
          uint8_t tmp = code[a2]; code[a2] = code[b2]; code[b2] = tmp;
        }
        adj_start = x + sxe * y;
      }
    }

    // remove_spurious_branches: erase b/t pairs guarding zero moves
    {
      std::vector<int64_t> branch_stack;
      branch_stack.push_back(-1);
      std::vector<uint32_t> branch_lens(code_len + 1, 0);
      std::vector<std::pair<int64_t, int64_t>> to_erase;
      int64_t current_branch = -1;
      for (int64_t i2 = 0; i2 < code_len; i2++) {
        uint8_t ch = code[i2];
        if (ch == 'b') {
          branch_stack.push_back(i2);
        } else if (ch == 't') {
          if (current_branch >= 0 && branch_lens[current_branch + 1] == 0) {
            to_erase.emplace_back(current_branch, i2);
          }
          if (!branch_stack.empty()) {
            current_branch = branch_stack.back();
            branch_stack.pop_back();
          }
        } else {
          branch_lens[current_branch + 1]++;
        }
      }
      for (auto& pr : to_erase) {
        code[pr.first] = 's';
        code[pr.second] = 's';
      }
    }

    out_nodes[n_chains] = adj_start;
    out_lens[n_chains] = code_len;
    n_chains++;
  }

  return n_chains;
}

}  // namespace

extern "C" {

// Full slice encode step: build the corner adjacency from labels,
// trace, apply fixups, and convert symbols to 2-bit codepoints.
// labels: width-byte little-endian label image, flat x-fastest.
// Outputs: codepoints (concatenated, chain order = node discovery
// order), per-chain nodes and codepoint lengths.
// Returns n_chains, or -1 on buffer overflow.
int64_t crackle_trace_slice(
  const void* labels, int32_t label_width,
  int64_t sx, int64_t sy, int32_t permissible,
  uint8_t* scratch_adj,           // (sx+1)*(sy+1) bytes
  uint8_t* scratch_symbols, int64_t sym_cap,
  uint8_t* out_cps, int64_t cps_cap,
  int64_t* out_nodes, int64_t* out_cp_lens, int64_t max_chains
) {
  const int64_t sxe = sx + 1;
  const int64_t n = sxe * (sy + 1);
  memset(scratch_adj, 0, n);

  // build adjacency
  #define BUILD(T) do { \
    const T* L = reinterpret_cast<const T*>(labels); \
    for (int64_t y = 0; y < sy; y++) { \
      for (int64_t x = 0; x < sx; x++) { \
        if (x > 0) { \
          bool eq = L[x + sx * y] == L[(x - 1) + sx * y]; \
          if (eq == (permissible != 0)) { \
            int64_t up = x + sxe * y, down = x + sxe * (y + 1); \
            scratch_adj[up] |= 0b0100; scratch_adj[down] |= 0b1000; \
          } \
        } \
        if (y > 0) { \
          bool eq = L[x + sx * y] == L[x + sx * (y - 1)]; \
          if (eq == (permissible != 0)) { \
            int64_t left = x + sxe * y, right = (x + 1) + sxe * y; \
            scratch_adj[left] |= 0b0001; scratch_adj[right] |= 0b0010; \
          } \
        } \
      } \
    } \
  } while (0)

  switch (label_width) {
    case 1: BUILD(uint8_t); break;
    case 2: BUILD(uint16_t); break;
    case 4: BUILD(uint32_t); break;
    case 8: BUILD(uint64_t); break;
    default: return -2;
  }
  #undef BUILD

  std::vector<int64_t> sym_lens(max_chains);
  int64_t n_chains = trace_slice_symbols(
    scratch_adj, sx, sy, scratch_symbols, sym_cap,
    out_nodes, sym_lens.data(), max_chains
  );
  if (n_chains < 0) return n_chains;

  // symbols -> codepoints (reversal-pair encoding of b/t)
  int64_t cp_used = 0;
  int64_t sym_off = 0;
  for (int64_t c = 0; c < n_chains; c++) {
    const uint8_t* chain = scratch_symbols + sym_off;
    int64_t len = sym_lens[c];
    int64_t cp_begin = cp_used;
    for (int64_t i = 0; i < len; i++) {
      uint8_t symbol = chain[i];
      if (symbol == 's') continue;
      if (cp_used + 2 > cps_cap) return -1;
      if (symbol == 'b') {
        if (i > 0 && cp_used > cp_begin && out_cps[cp_used - 1] != DOWN) {
          out_cps[cp_used++] = UP;
          out_cps[cp_used++] = DOWN;
        } else {
          out_cps[cp_used++] = LEFT;
          out_cps[cp_used++] = RIGHT;
        }
      } else if (symbol == 't') {
        if (i > 0 && cp_used > cp_begin && out_cps[cp_used - 1] != UP) {
          out_cps[cp_used++] = DOWN;
          out_cps[cp_used++] = UP;
        } else {
          out_cps[cp_used++] = RIGHT;
          out_cps[cp_used++] = LEFT;
        }
      } else {
        uint8_t cp = (symbol == 'u') ? UP
                   : (symbol == 'd') ? DOWN
                   : (symbol == 'l') ? LEFT : RIGHT;
        out_cps[cp_used++] = cp;
      }
    }
    out_cp_lens[c] = cp_used - cp_begin;
    sym_off += len;
  }

  return n_chains;
}

// Union-find 4-connected CCL of one slice with first-visit raster
// numbering (cc3d.hpp semantics). labels flat x-fastest.
// Returns N (component count).
int64_t crackle_ccl_slice(
  const void* labels, int32_t label_width,
  int64_t sx, int64_t sy,
  uint32_t* out  // sx*sy
) {
  const int64_t nvox = sx * sy;
  if (nvox == 0) return 0;
  std::vector<uint32_t> parent;
  parent.reserve(nvox / 4 + 8);

  auto find = [&](uint32_t v) {
    while (parent[v] != v) {
      parent[v] = parent[parent[v]];
      v = parent[v];
    }
    return v;
  };

  #define CCL(T) do { \
    const T* L = reinterpret_cast<const T*>(labels); \
    for (int64_t y = 0; y < sy; y++) { \
      for (int64_t x = 0; x < sx; x++) { \
        int64_t loc = x + sx * y; \
        T v = L[loc]; \
        bool left = (x > 0) && (L[loc - 1] == v); \
        bool up = (y > 0) && (L[loc - sx] == v); \
        if (left && up) { \
          uint32_t a = find(out[loc - 1]); \
          uint32_t b = find(out[loc - sx]); \
          uint32_t r = a < b ? a : b; \
          parent[a] = r; parent[b] = r; \
          out[loc] = r; \
        } else if (left) { \
          out[loc] = out[loc - 1]; \
        } else if (up) { \
          out[loc] = find(out[loc - sx]); \
        } else { \
          uint32_t fresh = (uint32_t)parent.size(); \
          parent.push_back(fresh); \
          out[loc] = fresh; \
        } \
      } \
    } \
  } while (0)

  switch (label_width) {
    case 1: CCL(uint8_t); break;
    case 2: CCL(uint16_t); break;
    case 4: CCL(uint32_t); break;
    case 8: CCL(uint64_t); break;
    default: return -2;
  }
  #undef CCL

  // resolve + first-visit renumber
  std::vector<uint32_t> renumber(parent.size(), 0xFFFFFFFFu);
  uint32_t next_label = 0;
  for (int64_t i = 0; i < nvox; i++) {
    uint32_t root = find(out[i]);
    if (renumber[root] == 0xFFFFFFFFu) {
      renumber[root] = next_label++;
    }
    out[i] = renumber[root];
  }
  return next_label;
}

// Same numbering from a voxel connectivity graph (bits: 1=-x, 3=-y).
int64_t crackle_ccl_vcg_slice(
  const uint8_t* vcg, int64_t sx, int64_t sy, uint32_t* out
) {
  const int64_t nvox = sx * sy;
  if (nvox == 0) return 0;
  std::vector<uint32_t> parent;
  parent.reserve(nvox / 4 + 8);

  auto find = [&](uint32_t v) {
    while (parent[v] != v) {
      parent[v] = parent[parent[v]];
      v = parent[v];
    }
    return v;
  };

  for (int64_t y = 0; y < sy; y++) {
    for (int64_t x = 0; x < sx; x++) {
      int64_t loc = x + sx * y;
      bool left = (x > 0) && (vcg[loc] & 0b0010);
      bool up = (y > 0) && (vcg[loc] & 0b1000);
      if (left && up) {
        uint32_t a = find(out[loc - 1]);
        uint32_t b = find(out[loc - sx]);
        uint32_t r = a < b ? a : b;
        parent[a] = r; parent[b] = r;
        out[loc] = r;
      } else if (left) {
        out[loc] = out[loc - 1];
      } else if (up) {
        out[loc] = find(out[loc - sx]);
      } else {
        uint32_t fresh = (uint32_t)parent.size();
        parent.push_back(fresh);
        out[loc] = fresh;
      }
    }
  }

  std::vector<uint32_t> renumber(parent.size(), 0xFFFFFFFFu);
  uint32_t next_label = 0;
  for (int64_t i = 0; i < nvox; i++) {
    uint32_t root = find(out[i]);
    if (renumber[root] == 0xFFFFFFFFu) {
      renumber[root] = next_label++;
    }
    out[i] = renumber[root];
  }
  return next_label;
}

// Sequential VCG replay for the host decode fallback: decoded
// codepoints -> paint presence into the edges array.
// edges preinitialized by caller (0 for permissible, 0xF impermissible).
// Returns 0 on success, -1 on out-of-range positions.
int64_t crackle_replay_vcg(
  const uint8_t* cps, int64_t n_cps,
  const int64_t* nodes, int64_t n_chains,
  int64_t sx, int64_t sy, int32_t permissible,
  uint8_t* edges
) {
  const int64_t sxe = sx + 1;
  const int64_t pixels = sxe * (sy + 1);

  auto paint = [&](int64_t loc, uint8_t bit) {
    if (permissible) edges[loc] |= bit;
    else edges[loc] &= (uint8_t)(0b1111 ^ bit);
  };

  // A codepoint that reverses its predecessor turns the pair into a
  // branch/terminate; the pair-first must NOT paint. So moves commit
  // lazily: hold one pending move, commit it only once the next
  // codepoint proves it is a real move.
  constexpr uint8_t NONE = 255;

  int64_t i = 0;
  std::vector<int64_t> revisit;
  for (int64_t c = 0; c < n_chains; c++) {
    int64_t node = nodes[c];
    int64_t y = node / sxe;
    int64_t x = node - sxe * y;
    int64_t branches = 1;
    uint8_t pending = NONE;
    revisit.clear();

    auto commit = [&](uint8_t mv) -> bool {
      if ((uint64_t)(x + (sxe)*y) >= (uint64_t)pixels) return false;
      switch (mv) {
        case UP:
          if (x > 0 && y > 0) paint((x - 1) + sx * (y - 1), 0b0001);
          if (y > 0) paint(x + sx * (y - 1), 0b0010);
          y--;
          break;
        case DOWN:
          if (x > 0) paint((x - 1) + sx * y, 0b0001);
          paint(x + sx * y, 0b0010);
          y++;
          break;
        case LEFT:
          if (x > 0 && y > 0) paint((x - 1) + sx * (y - 1), 0b0100);
          if (x > 0) paint((x - 1) + sx * y, 0b1000);
          x--;
          break;
        case RIGHT:
          if (y > 0) paint(x + sx * (y - 1), 0b0100);
          paint(x + sx * y, 0b1000);
          x++;
          break;
      }
      return true;
    };

    while (branches > 0 && i < n_cps) {
      uint8_t mv = cps[i++];
      if (pending != NONE && ((mv ^ pending) == 0b10)) {
        // pair: pending was the first half, never painted
        if (mv == UP || mv == LEFT) {  // terminate
          branches--;
          if (branches > 0 && !revisit.empty()) {
            int64_t loc = revisit.back();
            revisit.pop_back();
            y = loc / sx;
            x = loc - sx * y;
          }
        } else {  // branch
          revisit.push_back(x + sx * y);
          branches++;
        }
        pending = NONE;
      } else {
        if (pending != NONE) {
          if (!commit(pending)) return -1;
        }
        pending = mv;
      }
    }
    if (pending != NONE) {
      if (!commit(pending)) return -1;
      pending = NONE;
    }
  }
  return 0;
}

// Markov bitstream decode: rank codes -> diff codepoints -> undiffed
// codepoints. model_inv: rank->direction table, 4^order rows of 4.
// Returns the number of codepoints written.
int64_t crackle_markov_decode(
  const uint8_t* stream, int64_t n_bytes,
  const uint8_t* model_inv, int64_t order,
  uint8_t* out, int64_t out_cap
) {
  if (n_bytes == 0) return 0;
  const int64_t n_bits = n_bytes * 8;

  auto getbit = [&](int64_t p) -> int {
    return (stream[p >> 3] >> (p & 7)) & 1;
  };

  int64_t n_out = 0;
  uint8_t first = (uint8_t)((stream[0] & 0b11));
  if (n_out >= out_cap) return n_out;
  out[n_out++] = first;

  // context window: oldest digit at 4^0, newest at 4^(order-1)
  std::vector<uint8_t> window(order, 0);
  int64_t widx = 0;
  int64_t base10 = 0;
  if (order > 0) {
    window[widx] = first;
    widx = (widx + 1) % order;
    base10 = (int64_t)first << (2 * (order - 1));
  }

  int64_t p = 2;
  while (p < n_bits && n_out < out_cap) {
    int rank;
    if (!getbit(p)) { rank = 0; p += 1; }
    else if (p + 1 >= n_bits) { break; }
    else if (!getbit(p + 1)) { rank = 1; p += 2; }
    else if (p + 2 >= n_bits) { break; }
    else if (!getbit(p + 2)) { rank = 2; p += 3; }
    else { rank = 3; p += 3; }

    uint8_t d = model_inv[base10 * 4 + rank];
    out[n_out++] = d;
    if (order > 0) {
      uint8_t front = window[widx];
      base10 -= front;
      base10 >>= 2;
      base10 += (int64_t)d << (2 * (order - 1));
      window[widx] = d;
      widx = (widx + 1) % order;
    }
  }

  // un-diff mod 4
  uint8_t acc = 0;
  for (int64_t k = 0; k < n_out; k++) {
    acc = (uint8_t)((acc + out[k]) & 3);
    out[k] = acc;
  }
  return n_out;
}

// Markov bitstream encode from diff codepoints. model: dir->rank,
// 4^order rows of 4. Returns bytes written or -1 on overflow.
int64_t crackle_markov_encode(
  const uint8_t* diffs, int64_t n,
  const uint8_t* model, int64_t order,
  uint8_t* out, int64_t out_cap
) {
  if (n == 0) return 0;
  memset(out, 0, (size_t)out_cap);

  auto setbit = [&](int64_t p) {
    out[p >> 3] |= (uint8_t)(1 << (p & 7));
  };

  int64_t p = 2;
  out[0] = (uint8_t)(diffs[0] & 0b11);

  std::vector<uint8_t> window(order, 0);
  int64_t widx = 0;
  int64_t base10 = 0;
  if (order > 0) {
    window[widx] = diffs[0];
    widx = (widx + 1) % order;
    base10 = (int64_t)diffs[0] << (2 * (order - 1));
  }

  for (int64_t i = 1; i < n; i++) {
    uint8_t rank = model[base10 * 4 + diffs[i]];
    int len = (rank == 0) ? 1 : (rank == 1) ? 2 : 3;
    if ((p + len + 7) / 8 > out_cap) return -1;
    switch (rank) {
      case 0: break;
      case 1: setbit(p); break;
      case 2: setbit(p); setbit(p + 1); break;
      default: setbit(p); setbit(p + 1); setbit(p + 2); break;
    }
    p += len;
    if (order > 0) {
      uint8_t front = window[widx];
      base10 -= front;
      base10 >>= 2;
      base10 += (int64_t)diffs[i] << (2 * (order - 1));
      window[widx] = diffs[i];
      widx = (widx + 1) % order;
    }
  }
  return (p + 7) / 8;
}

}  // extern "C"
