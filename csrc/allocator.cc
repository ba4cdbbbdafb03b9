// Paged-KV block allocator — native runtime memory management.
//
// Host-side twin of ppq_tpu/serving/paged.py BlockAllocator (the Python
// implementation stays as the reference twin and CI fallback; parity is
// pinned by tests/test_native_allocator.py). The serving engine calls
// ensure()/release()/tables() on EVERY admit, retire, and burst — at
// production request rates that is the scheduler's hot loop, which the
// project brief puts in native code (runtime memory management), while
// the device only ever sees the (B, MB) int32 tables this code emits.
//
// Design notes:
//  * Block 0 is the reserved TRASH block: never handed out; unallocated
//    table entries point at it so device writes for inactive slots land
//    somewhere harmless (plain scatters, no read-modify-write).
//  * The free list is LIFO over [1, num_blocks) and initialized so the
//    LOWEST block ids are handed out first (pop from the back of a
//    descending stack) — bit-identical allocation order to the Python
//    twin, so block tables (not just allocation counts) match exactly.
//  * Plain extern "C" ABI (ctypes; pybind11 is not in this image).
//    Handles are process-local indices guarded by a mutex — the engine
//    may drive allocators from several Python threads.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Allocator {
    int64_t num_blocks = 0;
    int64_t max_batch = 0;
    int64_t max_blocks_per_seq = 0;
    int64_t block_size = 0;
    std::vector<int32_t> free_list;               // LIFO, back = next out
    std::vector<std::vector<int32_t>> slot_blocks;
    // reference counts (prefix caching): a block may be owned by several
    // slots plus the engine's prefix cache; it returns to the free list
    // only when the last reference drops
    std::vector<int32_t> refs;
};

std::mutex g_mutex;
std::unordered_map<int64_t, Allocator> g_allocators;
int64_t g_next_handle = 1;

Allocator* get(int64_t handle) {
    auto it = g_allocators.find(handle);
    return it == g_allocators.end() ? nullptr : &it->second;
}

}  // namespace

extern "C" {

// Returns a handle (> 0), or 0 on invalid arguments.
int64_t pkv_create(int64_t num_blocks, int64_t max_batch,
                   int64_t max_blocks_per_seq, int64_t block_size) {
    if (num_blocks < 1 || max_batch < 1 || max_blocks_per_seq < 1 ||
        block_size < 1)
        return 0;
    std::lock_guard<std::mutex> lock(g_mutex);
    int64_t handle = g_next_handle++;
    Allocator& a = g_allocators[handle];
    a.num_blocks = num_blocks;
    a.max_batch = max_batch;
    a.max_blocks_per_seq = max_blocks_per_seq;
    a.block_size = block_size;
    a.free_list.reserve(num_blocks - 1);
    for (int64_t b = num_blocks - 1; b >= 1; --b)
        a.free_list.push_back(static_cast<int32_t>(b));
    a.slot_blocks.assign(max_batch, {});
    a.refs.assign(num_blocks, 0);
    return handle;
}

void pkv_destroy(int64_t handle) {
    std::lock_guard<std::mutex> lock(g_mutex);
    g_allocators.erase(handle);
}

// Grow `slot`'s block list to cover `tokens` positions.
// rc: 0 ok; -1 pool exhausted (allocation rolled back); -2 sequence
// exceeds max_blocks_per_seq; -3 bad handle/slot.
int32_t pkv_ensure(int64_t handle, int64_t slot, int64_t tokens) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    if (!a || slot < 0 || slot >= a->max_batch) return -3;
    int64_t need = (tokens + a->block_size - 1) / a->block_size;
    if (need > a->max_blocks_per_seq) return -2;
    auto& have = a->slot_blocks[slot];
    size_t before = have.size();
    while (static_cast<int64_t>(have.size()) < need) {
        if (a->free_list.empty()) {
            // roll back: this call either fully succeeds or leaves the
            // allocator untouched (the Python twin raises MemoryError
            // after partial growth; the engine treats both as fatal, and
            // all-or-nothing is the safer contract)
            while (have.size() > before) {
                a->refs[have.back()] = 0;
                a->free_list.push_back(have.back());
                have.pop_back();
            }
            return -1;
        }
        have.push_back(a->free_list.back());
        a->refs[have.back()] = 1;
        a->free_list.pop_back();
    }
    return 0;
}

// Attach EXISTING blocks (a cached prefix) to the front of `slot`'s
// list, taking one reference each. Blocks must be live (ref > 0) and
// the slot's list empty (adoption happens at admit). rc 0 ok.
int32_t pkv_adopt(int64_t handle, int64_t slot, const int32_t* blocks,
                  int64_t n) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    if (!a || slot < 0 || slot >= a->max_batch || !blocks) return -3;
    if (!a->slot_blocks[slot].empty()) return -4;
    if (n > a->max_blocks_per_seq) return -2;
    for (int64_t i = 0; i < n; ++i) {
        int32_t b = blocks[i];
        if (b < 1 || b >= a->num_blocks || a->refs[b] <= 0) return -5;
    }
    auto& have = a->slot_blocks[slot];
    for (int64_t i = 0; i < n; ++i) {
        have.push_back(blocks[i]);
        ++a->refs[blocks[i]];
    }
    return 0;
}

// Take / drop standalone references (the prefix cache's own holds —
// not tied to any slot). Blocks free when the LAST reference drops.
int32_t pkv_retain(int64_t handle, const int32_t* blocks, int64_t n) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    if (!a || !blocks) return -3;
    for (int64_t i = 0; i < n; ++i) {
        int32_t b = blocks[i];
        if (b < 1 || b >= a->num_blocks || a->refs[b] <= 0) return -5;
    }
    for (int64_t i = 0; i < n; ++i) ++a->refs[blocks[i]];
    return 0;
}

int32_t pkv_unref(int64_t handle, const int32_t* blocks, int64_t n) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    if (!a || !blocks) return -3;
    for (int64_t i = n - 1; i >= 0; --i) {
        int32_t b = blocks[i];
        if (b < 1 || b >= a->num_blocks || a->refs[b] <= 0) return -5;
        if (--a->refs[b] == 0) a->free_list.push_back(b);
    }
    return 0;
}

// Release all of `slot`'s references; blocks with no remaining owners
// return to the pool (reverse order, so a release-then-ensure round
// trip reuses the same ids like the twin).
int32_t pkv_release(int64_t handle, int64_t slot) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    if (!a || slot < 0 || slot >= a->max_batch) return -3;
    auto& blocks = a->slot_blocks[slot];
    for (auto it = blocks.rbegin(); it != blocks.rend(); ++it)
        if (--a->refs[*it] == 0) a->free_list.push_back(*it);
    blocks.clear();
    return 0;
}

int64_t pkv_free_blocks(int64_t handle) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    return a ? static_cast<int64_t>(a->free_list.size()) : -1;
}

int64_t pkv_slot_blocks(int64_t handle, int64_t slot) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    if (!a || slot < 0 || slot >= a->max_batch) return -1;
    return static_cast<int64_t>(a->slot_blocks[slot].size());
}

// Fill out[max_batch * max_blocks_per_seq] (row-major) with the device
// block tables; unallocated entries are 0 (the trash block).
int32_t pkv_tables(int64_t handle, int32_t* out) {
    std::lock_guard<std::mutex> lock(g_mutex);
    Allocator* a = get(handle);
    if (!a || !out) return -3;
    std::memset(out, 0,
                sizeof(int32_t) * a->max_batch * a->max_blocks_per_seq);
    for (int64_t s = 0; s < a->max_batch; ++s) {
        const auto& blocks = a->slot_blocks[s];
        int32_t* row = out + s * a->max_blocks_per_seq;
        std::memcpy(row, blocks.data(), sizeof(int32_t) * blocks.size());
    }
    return 0;
}

}  // extern "C"
