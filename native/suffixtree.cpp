// Arena-based generalized suffix tree (McCreight with suffix links).
//
// C++ runtime core for the suffix-tree subsystem — semantics are
// output-identical to the Python oracle (genomics_rs_tpu/suffixtree/
// tree.py), which itself reproduces the reference
// (/root/reference/src/suffixtree/tree.rs) golden-for-golden:
// deterministic id layout "S1_leaves S1_internal S2_leaves ..."
// (tree.rs:78-93), slot-indexed children over the ASCII-sorted merged
// alphabet (tree.rs:56-63,140-148), associated-strings bit
// propagation, the perfect-suffix-match next_leaf_id reassignment
// (tree.rs:872-879), and compute_stats' string-0-only leaf test
// (tree.rs:755-757).
//
// Exposed through a flat C API consumed via ctypes
// (genomics_rs_tpu/suffixtree/native.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

namespace {

constexpr int32_t NONE = -1;

struct Node {
  int32_t string_depth = 0;
  int32_t edge_start = 0;
  int32_t edge_end = 0;
  int32_t parent = NONE;
  int32_t suffix_link = NONE;
  int32_t source_string = 0;
  uint32_t assoc = 0;
  bool used = false;
  std::vector<int32_t> children;  // slot-indexed child ids, NONE = empty
};

struct Tree {
  int32_t slot[256];  // first-occurrence slot per char, NONE unknown
  std::vector<std::string> strings;  // each includes its terminator
  int64_t next_internal_id = 0;
  int64_t next_leaf_id = 1;
  std::vector<Node> nodes;
  std::vector<std::pair<int64_t, int64_t>> leaf_ranges;  // [start, end)
  bool error = false;  // unknown character etc.
};

inline int32_t child_at(const Node& n, int32_t slot) {
  return (slot >= 0 && slot < (int32_t)n.children.size()) ? n.children[slot]
                                                          : NONE;
}

inline int32_t slot_of(Tree* t, unsigned char c) { return t->slot[c]; }

void add_child(Tree* t, int64_t parent, int64_t child_id, int32_t string_idx) {
  Node& child = t->nodes[child_id];
  child.parent = (int32_t)parent;
  unsigned char c =
      (unsigned char)t->strings[string_idx][child.edge_start];
  int32_t slot = slot_of(t, c);
  if (slot < 0) {
    t->error = true;
    return;
  }
  Node& p = t->nodes[parent];
  if ((int32_t)p.children.size() <= slot) p.children.resize(slot + 1, NONE);
  p.children[slot] = (int32_t)child_id;
  child.used = true;
}

int64_t create_internal_node(Tree* t, int64_t parent, int64_t original,
                             int32_t edge_start, int32_t edge_end,
                             int32_t string_idx) {
  int64_t internal_id = t->next_internal_id++;
  if ((int64_t)t->nodes.size() <= internal_id)
    t->nodes.resize(internal_id + 1);
  {
    Node& n = t->nodes[internal_id];
    n.string_depth =
        t->nodes[parent].string_depth + (edge_end - edge_start);
    n.edge_start = edge_start;
    n.edge_end = edge_end;
    n.parent = (int32_t)parent;
    n.suffix_link = NONE;
    n.source_string = string_idx;
    n.assoc = t->nodes[original].assoc | (1u << string_idx);
    n.used = true;
    n.children.clear();
  }
  add_child(t, parent, internal_id, string_idx);
  add_child(t, internal_id, original, string_idx);
  return internal_id;
}

int64_t create_leaf(Tree* t, int64_t parent, int32_t edge_start,
                    int32_t edge_end, int32_t string_idx) {
  int64_t leaf_id = t->next_leaf_id++;
  if ((int64_t)t->nodes.size() <= leaf_id) t->nodes.resize(leaf_id + 1);
  {
    Node& n = t->nodes[leaf_id];
    n.string_depth =
        t->nodes[parent].string_depth + (edge_end - edge_start);
    n.edge_start = edge_start;
    n.edge_end = edge_end;
    n.parent = (int32_t)parent;
    n.suffix_link = NONE;
    n.source_string = string_idx;
    n.assoc = 1u << string_idx;
    n.used = true;
    n.children.clear();
  }
  add_child(t, parent, leaf_id, string_idx);
  return leaf_id;
}

// Split an edge at break_idx; optionally hang a new leaf off the new
// internal node (tree.rs:470-536).
int64_t break_edge(Tree* t, int64_t node, int32_t break_idx,
                   int32_t leaf_start, int32_t leaf_end, bool make_leaf,
                   int32_t internal_string_idx, int32_t leaf_string_idx) {
  {
    Node& n = t->nodes[node];
    if (break_idx == n.edge_start || break_idx == n.edge_end) return node;
  }
  int32_t original_label_start;
  int64_t parent;
  {
    Node& n = t->nodes[node];
    original_label_start = n.edge_start;
    n.edge_start = break_idx;
    parent = n.parent;
  }
  int64_t new_internal = create_internal_node(
      t, parent, node, original_label_start, break_idx, internal_string_idx);
  t->nodes[new_internal].assoc |= 1u << leaf_string_idx;
  if (make_leaf)
    return create_leaf(t, new_internal, leaf_start, leaf_end,
                       leaf_string_idx);
  return new_internal;
}

// First index where a and b differ, scanning block-wise with memcmp
// (vectorized) before the byte tail — the naive per-char edge walk
// dominated second-string insertion for highly similar genomes.
inline int64_t first_mismatch(const char* a, const char* b, int64_t n) {
  int64_t i = 0;
  while (i + 4096 <= n) {
    if (std::memcmp(a + i, b + i, 4096) != 0) break;
    i += 4096;
  }
  while (i + 64 <= n) {
    if (std::memcmp(a + i, b + i, 64) != 0) break;
    i += 64;
  }
  while (i < n && a[i] == b[i]) ++i;
  return i;
}

// Skip/count descent re-matching beta (tree.rs:633-734).
int64_t node_hops(Tree* t, int64_t current, int32_t beta_start,
                  int32_t beta_end, int32_t beta_string_idx) {
  int32_t beta_length = beta_end - beta_start;
  int64_t cur = current;
  if (beta_length <= 0) return cur;

  const std::string& beta_string = t->strings[beta_string_idx];
  int32_t remaining = beta_length;
  while (remaining > 0) {
    unsigned char c = (unsigned char)beta_string[beta_end - remaining];
    int32_t slot = slot_of(t, c);
    if (slot < 0) {
      t->error = true;
      return cur;
    }
    int32_t child = child_at(t->nodes[cur], slot);
    if (child == NONE) break;
    int32_t edge_len, child_src, child_start;
    {
      Node& ch = t->nodes[child];
      edge_len = ch.edge_end - ch.edge_start;
      child_src = ch.source_string;
      child_start = ch.edge_start;
    }
    if (edge_len <= remaining) {
      remaining -= edge_len;
      cur = child;
    } else {
      // Partial match: find the split point and break the edge
      // (memcmp-accelerated — this scan runs over the long tail of a
      // split leaf edge on every CASE-2 suffix of a similar second
      // string, and dominated generalized insertion per-char).
      const std::string& src = t->strings[child_src];
      int64_t adv = first_mismatch(
          src.data() + child_start,
          beta_string.data() + (beta_end - remaining), remaining);
      int32_t bidx = adv > 0 ? (int32_t)(child_start + adv) : 0;
      cur = break_edge(t, child, bidx, 0, 0, false, child_src,
                       beta_string_idx);
      break;
    }
  }
  return cur;
}

// Naive walk inserting one suffix from start_node (tree.rs:808-923).
void find_path(Tree* t, int32_t suffix_idx, int64_t start_node,
               int32_t string_idx) {
  int64_t current = start_node;
  const std::string& s = t->strings[string_idx];
  const int32_t slen = (int32_t)s.size();
  int32_t suffix_len = slen - suffix_idx;
  int32_t suffix_sub_idx;
  {
    Node& cn = t->nodes[current];
    suffix_sub_idx = cn.string_depth - (cn.edge_end - cn.edge_start);
  }

  for (;;) {
    int32_t edge_start, edge_end, current_src;
    {
      Node& cn = t->nodes[current];
      edge_start = cn.edge_start;
      edge_end = cn.edge_end;
      current_src = cn.source_string;
    }
    const std::string& src_str = t->strings[current_src];

    // Edge-label walk, memcmp-accelerated; semantics identical to the
    // per-char loop (tree.rs:808+): the virtual '\0' past the suffix
    // end always mismatches a real edge char.
    for (int32_t label_idx = edge_start; label_idx < edge_end;
         ++label_idx) {
      if (suffix_sub_idx > suffix_len) break;
      int32_t spos = suffix_idx + suffix_sub_idx;
      int64_t ncmp = (int64_t)(edge_end - label_idx);
      if ((int64_t)(slen - spos) < ncmp) ncmp = slen - spos;
      if (ncmp > 0) {
        int64_t adv = first_mismatch(s.data() + spos,
                                     src_str.data() + label_idx, ncmp);
        label_idx += (int32_t)adv;
        suffix_sub_idx += (int32_t)adv;
        if (label_idx >= edge_end) break;
        spos = suffix_idx + suffix_sub_idx;
      }
      char suffix_char = (spos < slen) ? s[spos] : '\0';
      if (suffix_char != src_str[label_idx]) {
        break_edge(t, current, label_idx, spos, slen, true, current_src,
                   string_idx);
        return;
      }
      ++suffix_sub_idx;
    }

    t->nodes[current].assoc |= 1u << string_idx;

    if (suffix_sub_idx == suffix_len) {
      // Perfect match with an existing path (tree.rs:872-879).
      t->next_leaf_id = current + 1;
      return;
    }
    if (suffix_sub_idx > suffix_len) return;

    unsigned char c = (unsigned char)s[suffix_idx + suffix_sub_idx];
    int32_t slot = slot_of(t, c);
    if (slot < 0) {
      t->error = true;
      return;
    }
    int32_t child = child_at(t->nodes[current], slot);
    if (child != NONE) {
      current = child;
    } else {
      create_leaf(t, current, suffix_idx + suffix_sub_idx, slen, string_idx);
      return;
    }
  }
}

// Per-suffix McCreight jump (tree.rs:286-384).
void suffix_link_traversal(Tree* t, int32_t suffix_idx, int32_t string_idx) {
  int64_t nls = (suffix_idx == 0) ? 0 : t->next_leaf_id - 1;
  int32_t parent = t->nodes[nls].parent;
  int64_t u = (parent != NONE) ? parent : 0;
  int32_t v_link = t->nodes[u].suffix_link;

  int64_t v;
  bool establish = false;
  if (v_link != NONE) {
    v = v_link;  // CASE 1
  } else {
    int32_t u_prime = t->nodes[u].parent;
    int32_t v_prime = t->nodes[u_prime].suffix_link;
    int32_t es, ee, ss;
    {
      Node& un = t->nodes[u];
      es = un.edge_start;
      ee = un.edge_end;
      ss = un.source_string;
    }
    if (u_prime == 0) {
      v = node_hops(t, v_prime, es + 1, ee, ss);  // CASE 2B
    } else {
      v = node_hops(t, v_prime, es, ee, ss);  // CASE 2A
    }
    establish = true;
  }

  if (u != 0 && establish) {
    // Depth-1 internal nodes link to the root (tree.rs:369-378).
    Node& un = t->nodes[u];
    un.suffix_link = (un.string_depth == 1) ? 0 : (int32_t)v;
  }
  find_path(t, suffix_idx, v, string_idx);
}

// Preorder DFS over used children in ascending slot order
// (tree.rs:444-464). Visitor returns true to stop; the stopped-at node
// id is returned, or NONE.
template <typename F>
int64_t dfs(Tree* t, int64_t start, F&& visit) {
  std::vector<int64_t> stack;
  stack.push_back(start);
  while (!stack.empty()) {
    int64_t id = stack.back();
    stack.pop_back();
    if (visit(id)) return id;
    const std::vector<int32_t>& ch = t->nodes[id].children;
    for (auto it = ch.rbegin(); it != ch.rend(); ++it)
      if (*it != NONE) stack.push_back(*it);
  }
  return NONE;
}

bool is_leaf(Tree* t, int64_t id) {
  int32_t src = t->nodes[id].source_string;
  auto& r = t->leaf_ranges[src];
  return id >= r.first && id < r.second;
}

}  // namespace

extern "C" {

// alphabet: merged, ASCII-sorted characters (terminators + alphabet
// file chars) — slot = index of first occurrence, as in tree.rs:56-63.
void* st_new(const char* alphabet, int64_t alphabet_len) {
  Tree* t = new Tree();
  for (int i = 0; i < 256; ++i) t->slot[i] = NONE;
  for (int64_t i = 0; i < alphabet_len; ++i) {
    unsigned char c = (unsigned char)alphabet[i];
    if (t->slot[c] == NONE) t->slot[c] = (int32_t)i;
  }
  t->nodes.resize(1);
  Node& root = t->nodes[0];
  root.suffix_link = 0;
  root.used = true;
  return t;
}

void st_free(void* tp) { delete (Tree*)tp; }

// data includes the terminator char; full_len = original length + 1.
// Returns 0 on success, nonzero on error (unknown character).
int st_insert(void* tp, const char* data, int64_t full_len,
              int use_links) {
  Tree* t = (Tree*)tp;
  int64_t string_length = full_len - 1;

  if (t->next_internal_id != 0) t->next_leaf_id = t->next_internal_id;
  t->next_internal_id += string_length + 2;
  t->leaf_ranges.push_back({t->next_leaf_id, t->next_internal_id});

  int64_t need = t->next_internal_id + 2 * string_length + 4;
  if ((int64_t)t->nodes.size() < need) t->nodes.resize(need);

  int32_t string_idx = (int32_t)t->strings.size();
  t->strings.emplace_back(data, (size_t)full_len);

  for (int32_t i = 0; i <= (int32_t)string_length; ++i) {
    if (use_links)
      suffix_link_traversal(t, i, string_idx);
    else
      find_path(t, i, 0, string_idx);
    if (t->error) return 1;
  }
  return 0;
}

// Tree stats + BWT for string 0 via one lexicographic DFS
// (tree.rs:740-803). out_i64: [num_internal, num_leaves, num_nodes,
// max_string_depth, longest_repeat_len, longest_repeat_start,
// bwt_len]; bwt buffer must hold len(strings[0]) bytes.
int st_stats(void* tp, int64_t* out_i64, double* avg_depth, char* bwt,
             int64_t bwt_cap) {
  Tree* t = (Tree*)tp;
  if (t->strings.empty()) return 1;
  const std::string& s = t->strings[0];
  int64_t slen = (int64_t)s.size();
  if (bwt_cap < slen) return 2;
  for (int64_t i = 0; i < slen; ++i) bwt[i] = ' ';

  int64_t idx = 0, num_leaves = 0, num_internal = 0, max_depth = 0;
  int64_t depth_sum = 0, longest_len = 0, longest_start = 0;
  bool longest_flag = false;

  dfs(t, 0, [&](int64_t id) {
    if (id > 0 && id < slen + 1 && idx < slen) {
      if (longest_flag) {
        longest_start = id;
        longest_flag = false;
      }
      ++num_leaves;
      bwt[idx++] = (id == 1) ? '$' : s[id - 2];
    } else if (id != 0) {
      ++num_internal;
      int64_t d = t->nodes[id].string_depth;
      depth_sum += d;
      if (d > max_depth) {
        longest_len = d;
        longest_flag = true;
        max_depth = d;
      }
    }
    return false;
  });

  out_i64[0] = num_internal;
  out_i64[1] = num_leaves;
  out_i64[2] = num_internal + num_leaves + 1;
  out_i64[3] = max_depth;
  out_i64[4] = longest_len;
  out_i64[5] = longest_start;
  out_i64[6] = slen;
  *avg_depth = num_internal ? (double)depth_sum / (double)num_internal : 0.0;
  return 0;
}

// Longest common substring of two inserted strings (tree.rs:218-281).
// out3 = [offset_in_a, offset_in_b, length].
int st_lcs(void* tp, int32_t a, int32_t b, int64_t* out3) {
  Tree* t = (Tree*)tp;
  int64_t max_depth = 0, deepest = 0;
  uint32_t need_a = 1u << a, need_b = 1u << b;

  dfs(t, 0, [&](int64_t id) {
    uint32_t assoc = t->nodes[id].assoc;
    if (__builtin_popcount(assoc) < 2) return false;
    if ((assoc & need_a) && (assoc & need_b) &&
        t->nodes[id].string_depth > max_depth) {
      max_depth = t->nodes[id].string_depth;
      deepest = id;
    }
    return false;
  });

  auto leaf_of = [&](int32_t sidx, uint32_t bit) -> int64_t {
    return dfs(t, deepest, [&](int64_t id) {
      return is_leaf(t, id) && (t->nodes[id].assoc & bit) != 0;
    });
  };
  int64_t leaf_one = leaf_of(a, need_a);
  int64_t leaf_two = leaf_of(b, need_b);
  if (leaf_one == NONE || leaf_two == NONE) {
    out3[0] = out3[1] = out3[2] = 0;
    return 0;
  }
  auto offset = [&](int64_t leaf, int32_t sidx) -> int64_t {
    if (sidx == 0) return leaf - 1;
    int64_t start = t->leaf_ranges[sidx].first;
    return (leaf >= start) ? leaf - start : 0;
  };
  out3[0] = offset(leaf_one, a);
  out3[1] = offset(leaf_two, b);
  out3[2] = max_depth;
  return 0;
}

int64_t st_num_strings(void* tp) {
  return (int64_t)((Tree*)tp)->strings.size();
}

// Compare-mode similarity for one pair: total length of recursively
// found longest common substrings (the reference's Compare semantics,
// /root/reference/src/main.rs:267-308 — fresh 2-string tree per
// sub-pair, recurse on prefix and suffix remainders while LCS > 0).
// Runs the whole recursion natively, reusing one arena across
// sub-pairs: the per-sub-pair Python/ctypes/alloc overhead dominated
// the pure-wrapper version (~2 us/char vs ~0.1 us/char here).
// out2 = [total score, first LCS length]. Returns 0 on success.
int st_similarity(const char* alphabet, int64_t alphabet_len,
                  const char* a, int64_t alen, const char* b, int64_t blen,
                  char term_a, char term_b, int64_t* out2) {
  int32_t slot[256];
  for (int i = 0; i < 256; ++i) slot[i] = NONE;
  for (int64_t i = 0; i < alphabet_len; ++i) {
    unsigned char c = (unsigned char)alphabet[i];
    if (slot[c] == NONE) slot[c] = (int32_t)i;
  }

  Tree t;  // reused across sub-pairs (capacity persists)
  std::memcpy(t.slot, slot, sizeof(slot));

  struct Sub {
    std::string a, b;
    int64_t i, j, len;
  };

  // LCS of (sa+term_a, sb+term_b) via a fresh logical tree in the
  // reused arena. Returns (i, j, len) with the tree code's exact
  // tie-breaks (deepest qualifying node, first DFS leaf per string).
  auto lcs = [&](const std::string& sa, const std::string& sb,
                 int64_t out3[3]) -> int {
    // Reset the arena without releasing capacity.
    t.strings.clear();
    t.leaf_ranges.clear();
    t.next_internal_id = 0;
    t.next_leaf_id = 1;
    t.error = false;
    size_t need0 = 1;
    if (t.nodes.size() < need0) t.nodes.resize(need0);
    t.nodes[0] = Node();
    t.nodes[0].suffix_link = 0;
    t.nodes[0].used = true;

    std::string wa = sa;
    wa.push_back(term_a);
    std::string wb = sb;
    wb.push_back(term_b);
    // Stale nodes from a previous (larger) sub-pair are unreachable
    // until re-created, and every creation path resets all fields —
    // no range clearing needed, so node/children capacity is reused.

    if (st_insert(&t, wa.data(), (int64_t)wa.size(), 1)) return 1;
    if (st_insert(&t, wb.data(), (int64_t)wb.size(), 1)) return 1;
    return st_lcs(&t, 0, 1, out3);
  };

  int64_t out3[3];
  if (lcs(std::string(a, (size_t)alen), std::string(b, (size_t)blen), out3))
    return 1;
  int64_t first = out3[2];
  int64_t score = 0;
  std::vector<Sub> stack;
  stack.push_back(Sub{std::string(a, (size_t)alen),
                      std::string(b, (size_t)blen), out3[0], out3[1],
                      out3[2]});
  while (!stack.empty()) {
    Sub s = std::move(stack.back());
    stack.pop_back();
    if (s.len > 0) {
      std::string pa = s.a.substr(0, (size_t)s.i);
      std::string pb = s.b.substr(0, (size_t)s.j);
      if (lcs(pa, pb, out3)) return 1;
      stack.push_back(
          Sub{std::move(pa), std::move(pb), out3[0], out3[1], out3[2]});
      std::string sa = s.a.substr((size_t)(s.i + s.len));
      std::string sb = s.b.substr((size_t)(s.j + s.len));
      if (lcs(sa, sb, out3)) return 1;
      stack.push_back(
          Sub{std::move(sa), std::move(sb), out3[0], out3[1], out3[2]});
    }
    score += s.len;
  }
  out2[0] = score;
  out2[1] = first;
  return 0;
}

}  // extern "C"
