// Prefix-cache page store: the native core behind serve/prefix_store.py.
//
// One NODE per cached FULL page of prompt tokens, keyed by
// (parent_page_id, page_tokens): chained keys make prefix equality an O(1)
// hash probe per page. Refcounts count live table rows using the page;
// refcount-0 nodes stay cached until evicted leaf-first (children key off
// the parent id) in LRU order. Policy is identical to PyPrefixStore — the
// Python twin is the differential-test oracle (tests/test_prefix_store_native.py),
// the same convention as native/scheduler.cpp.
//
// C ABI via ctypes (no pybind11 in this environment); built on demand by
// serve/_prefix_native.py with g++ -O2 -shared -fPIC.

#include <cstddef>
#include <cstdint>
#include <functional>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int32_t parent;
  std::vector<int32_t> tokens;
  bool operator==(const Key& o) const {
    return parent == o.parent && tokens == o.tokens;
  }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = std::hash<int32_t>()(k.parent);
    for (int32_t t : k.tokens) {
      h ^= std::hash<int32_t>()(t) + 0x9e3779b97f4a7c15ULL + (h << 6) + (h >> 2);
    }
    return h;
  }
};

struct Node {
  int32_t page = -1;
  int32_t parent = -1;
  Key key;  // owning copy for O(1) erase on eviction
  int64_t ref = 0;
  int64_t children = 0;
  int64_t stamp = 0;
};

struct Store {
  int32_t page_size;
  int64_t clock = 0;
  int64_t hits = 0;
  int64_t misses = 0;
  std::unordered_map<Key, Node*, KeyHash> by_key;
  std::unordered_map<int32_t, Node*> by_page;

  explicit Store(int32_t ps) : page_size(ps) {}
  ~Store() {
    for (auto& kv : by_page) delete kv.second;
  }
};

constexpr int32_t kRoot = -1;

Key make_key(int32_t parent, const int32_t* tokens, int32_t n) {
  Key k;
  k.parent = parent;
  k.tokens.assign(tokens, tokens + n);
  return k;
}

}  // namespace

extern "C" {

void* qa_pstore_create(int32_t page_size) {
  if (page_size <= 0) return nullptr;
  return new Store(page_size);
}

void qa_pstore_destroy(void* h) { delete static_cast<Store*>(h); }

// Longest cached full-page chain matching tokens' prefix; bumps LRU stamps.
// Returns the number of pages written to out (capacity max_pages).
int32_t qa_pstore_lookup(void* h, const int32_t* tokens, int32_t n_tokens,
                         int32_t max_pages, int32_t* out) {
  Store* s = static_cast<Store*>(h);
  int32_t n_full = n_tokens / s->page_size;
  int32_t parent = kRoot;
  int32_t n = 0;
  for (int32_t i = 0; i < n_full && n < max_pages; ++i) {
    Key k = make_key(parent, tokens + int64_t(i) * s->page_size, s->page_size);
    auto it = s->by_key.find(k);
    if (it == s->by_key.end()) {
      s->misses++;
      break;
    }
    Node* node = it->second;
    node->stamp = ++s->clock;
    out[n++] = node->page;
    parent = node->page;
  }
  s->hits += n;
  return n;
}

// One reference per page; -1 if any page is not a store node (no refs taken
// past the failing page — callers treat this as a fatal invariant breach).
int32_t qa_pstore_acquire(void* h, int32_t n, const int32_t* pages) {
  Store* s = static_cast<Store*>(h);
  for (int32_t i = 0; i < n; ++i) {
    auto it = s->by_page.find(pages[i]);
    if (it == s->by_page.end()) return -1;
    it->second->ref++;
  }
  return 0;
}

// Drop one reference per page; unknown / zero-ref pages are ignored (the
// engine releases a slot's whole shared list; eviction may have removed
// entries already).
void qa_pstore_release(void* h, int32_t n, const int32_t* pages) {
  Store* s = static_cast<Store*>(h);
  for (int32_t i = 0; i < n; ++i) {
    auto it = s->by_page.find(pages[i]);
    if (it != s->by_page.end() && it->second->ref > 0) {
      it->second->ref--;
      it->second->stamp = ++s->clock;
    }
  }
}

// Offer the owner's full-prompt pages. Writes the pages now owned by the
// store (caller holds one ref on each) to out_owned and returns the count;
// pages not in out_owned stayed private (duplicates of an existing chain).
int32_t qa_pstore_register(void* h, const int32_t* tokens, int32_t n_tokens,
                           int32_t n_pages, const int32_t* pages,
                           int32_t* out_owned) {
  Store* s = static_cast<Store*>(h);
  int32_t n_full = n_tokens / s->page_size;
  if (n_full > n_pages) n_full = n_pages;
  int32_t parent = kRoot;
  int32_t n_owned = 0;
  for (int32_t i = 0; i < n_full; ++i) {
    int32_t page = pages[i];
    Key k = make_key(parent, tokens + int64_t(i) * s->page_size, s->page_size);
    auto it = s->by_key.find(k);
    if (it != s->by_key.end()) {
      if (it->second->page == page) {
        out_owned[n_owned++] = page;  // the caller's own admission hit
      }  // else: duplicate content; the caller's page stays private
      parent = it->second->page;
      continue;
    }
    Node* node = new Node();
    node->page = page;
    node->parent = parent;
    node->key = k;
    node->ref = 1;  // the registering owner
    node->stamp = ++s->clock;
    s->by_key.emplace(std::move(k), node);
    s->by_page.emplace(page, node);
    if (parent != kRoot) {
      auto pit = s->by_page.find(parent);
      if (pit != s->by_page.end()) pit->second->children++;
    }
    out_owned[n_owned++] = page;
    parent = page;
  }
  return n_owned;
}

// Up to n refcount-0 LEAF pages, LRU first, removed from the store and
// written to out (the engine hands them back to the page allocator).
int32_t qa_pstore_evict(void* h, int32_t n, int32_t* out) {
  Store* s = static_cast<Store*>(h);
  int32_t n_out = 0;
  while (n_out < n) {
    Node* best = nullptr;
    for (auto& kv : s->by_page) {
      Node* node = kv.second;
      if (node->ref == 0 && node->children == 0 &&
          (best == nullptr || node->stamp < best->stamp)) {
        best = node;
      }
    }
    if (best == nullptr) break;
    s->by_key.erase(best->key);
    s->by_page.erase(best->page);
    if (best->parent != kRoot) {
      auto pit = s->by_page.find(best->parent);
      if (pit != s->by_page.end()) pit->second->children--;
    }
    out[n_out++] = best->page;
    delete best;
  }
  return n_out;
}

int32_t qa_pstore_num_nodes(void* h) {
  return static_cast<int32_t>(static_cast<Store*>(h)->by_page.size());
}

int32_t qa_pstore_num_evictable(void* h) {
  Store* s = static_cast<Store*>(h);
  int32_t n = 0;
  for (auto& kv : s->by_page) {
    if (kv.second->ref == 0 && kv.second->children == 0) n++;
  }
  return n;
}

int64_t qa_pstore_hits(void* h) { return static_cast<Store*>(h)->hits; }
int64_t qa_pstore_misses(void* h) { return static_cast<Store*>(h)->misses; }

int32_t qa_pstore_refcount(void* h, int32_t page) {
  Store* s = static_cast<Store*>(h);
  auto it = s->by_page.find(page);
  if (it == s->by_page.end()) return -1;
  return static_cast<int32_t>(it->second->ref);
}

}  // extern "C"
