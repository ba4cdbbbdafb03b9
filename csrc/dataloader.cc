// Prefetching .npy data loader — native runtime IO.
//
// Calibration and evaluation walk directories of .npy batches
// (samples/Imagenet, ProgramEntrance_1); at TPU calibration throughput
// the Python single-threaded np.load becomes the pipeline's serial leg.
// This loader parses npy v1/v2 headers and reads file payloads on a
// worker-thread pool, keeping a bounded ring of decoded batches ahead of
// the consumer. Delivery is SUBMIT-ORDER (deterministic calibration
// sweeps), backpressure via the ring capacity.
//
// Python twin/fallback: numpy's own np.load in ppq_tpu/utils/dataio.py;
// parity pinned by tests/test_dataio.py. Plain extern "C" ABI (ctypes).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// dtype codes shared with the Python wrapper (utils/dataio.py)
enum DType : int32_t {
    DT_F32 = 0, DT_F64 = 1, DT_I32 = 2, DT_I64 = 3, DT_U8 = 4,
    DT_I8 = 5, DT_F16 = 6, DT_BOOL = 7,
};

struct Item {
    int64_t index = 0;
    int32_t status = -1;            // 0 ok, else error code
    int32_t dtype = -1;
    int32_t fortran = 0;
    std::vector<int64_t> shape;
    std::vector<uint8_t> data;
};

struct Loader {
    size_t capacity = 4;
    std::vector<std::thread> workers;
    std::deque<std::pair<int64_t, std::string>> pending;  // submit queue
    std::unordered_map<int64_t, std::shared_ptr<Item>> done;
    int64_t next_submit = 0;
    int64_t next_deliver = 0;
    size_t in_flight = 0;
    bool closing = false;
    std::mutex m;
    std::condition_variable cv_worker;   // pending work / slot free
    std::condition_variable cv_reader;   // item ready
};

std::mutex g_mutex;
std::unordered_map<int64_t, std::shared_ptr<Loader>> g_loaders;
int64_t g_next_handle = 1;

std::shared_ptr<Loader> get(int64_t handle) {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_loaders.find(handle);
    return it == g_loaders.end() ? nullptr : it->second;
}

int32_t dtype_of(const std::string& descr) {
    // leading byte order: '<' | '|' accepted ('=' treated as little
    // endian — every platform we build for is LE); '>' rejected
    std::string d = descr;
    if (!d.empty() && (d[0] == '<' || d[0] == '|' || d[0] == '='))
        d = d.substr(1);
    else if (!d.empty() && d[0] == '>')
        return -1;
    if (d == "f4") return DT_F32;
    if (d == "f8") return DT_F64;
    if (d == "i4") return DT_I32;
    if (d == "i8") return DT_I64;
    if (d == "u1") return DT_U8;
    if (d == "i1") return DT_I8;
    if (d == "f2") return DT_F16;
    if (d == "b1") return DT_BOOL;
    return -1;
}

size_t itemsize_of(int32_t dt) {
    switch (dt) {
        case DT_F64: case DT_I64: return 8;
        case DT_F32: case DT_I32: return 4;
        case DT_F16: return 2;
        default: return 1;
    }
}

// status codes: 0 ok; 1 open failed; 2 bad magic; 3 bad header;
// 4 unsupported dtype; 5 short read
void load_npy(const std::string& path, Item& item) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) { item.status = 1; return; }
    uint8_t magic[8];
    if (std::fread(magic, 1, 8, f) != 8 ||
        std::memcmp(magic, "\x93NUMPY", 6) != 0) {
        std::fclose(f); item.status = 2; return;
    }
    int major = magic[6];
    uint32_t hlen = 0;
    if (major == 1) {
        uint8_t b[2];
        if (std::fread(b, 1, 2, f) != 2) { std::fclose(f); item.status = 3;
                                           return; }
        hlen = b[0] | (b[1] << 8);
    } else {
        uint8_t b[4];
        if (std::fread(b, 1, 4, f) != 4) { std::fclose(f); item.status = 3;
                                           return; }
        hlen = b[0] | (b[1] << 8) | (b[2] << 16) |
               (static_cast<uint32_t>(b[3]) << 24);
    }
    std::string header(hlen, '\0');
    if (std::fread(&header[0], 1, hlen, f) != hlen) {
        std::fclose(f); item.status = 3; return;
    }
    // descr
    size_t p = header.find("'descr'");
    if (p == std::string::npos) { std::fclose(f); item.status = 3; return; }
    p = header.find('\'', p + 7);
    size_t q = header.find('\'', p + 1);
    if (p == std::string::npos || q == std::string::npos) {
        std::fclose(f); item.status = 3; return;
    }
    item.dtype = dtype_of(header.substr(p + 1, q - p - 1));
    if (item.dtype < 0) { std::fclose(f); item.status = 4; return; }
    // fortran_order
    item.fortran = header.find("'fortran_order': True") !=
                   std::string::npos;
    // shape tuple
    p = header.find("'shape'");
    p = header.find('(', p);
    q = header.find(')', p);
    if (p == std::string::npos || q == std::string::npos) {
        std::fclose(f); item.status = 3; return;
    }
    item.shape.clear();
    int64_t cur = -1;
    for (size_t i = p + 1; i <= q; ++i) {
        char c = header[i];
        if (c >= '0' && c <= '9')
            cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
        else if (cur >= 0) { item.shape.push_back(cur); cur = -1; }
    }
    size_t count = 1;
    for (int64_t s : item.shape) count *= static_cast<size_t>(s);
    size_t nbytes = count * itemsize_of(item.dtype);
    item.data.resize(nbytes);
    if (nbytes && std::fread(item.data.data(), 1, nbytes, f) != nbytes) {
        std::fclose(f); item.status = 5; return;
    }
    std::fclose(f);
    item.status = 0;
}

void worker_loop(std::shared_ptr<Loader> L) {
    for (;;) {
        std::pair<int64_t, std::string> job;
        {
            std::unique_lock<std::mutex> lock(L->m);
            L->cv_worker.wait(lock, [&] {
                return L->closing ||
                       (!L->pending.empty() &&
                        L->done.size() + L->in_flight < L->capacity);
            });
            if (L->closing) return;
            job = L->pending.front();
            L->pending.pop_front();
            ++L->in_flight;
        }
        auto item = std::make_shared<Item>();
        item->index = job.first;
        load_npy(job.second, *item);
        {
            std::lock_guard<std::mutex> lock(L->m);
            L->done[job.first] = item;
            --L->in_flight;
        }
        L->cv_reader.notify_all();
        L->cv_worker.notify_all();
    }
}

}  // namespace

extern "C" {

int64_t dl_create(int64_t capacity, int64_t n_threads) {
    if (capacity < 1 || n_threads < 1) return 0;
    auto L = std::make_shared<Loader>();
    L->capacity = static_cast<size_t>(capacity);
    for (int64_t i = 0; i < n_threads; ++i)
        L->workers.emplace_back(worker_loop, L);
    std::lock_guard<std::mutex> lock(g_mutex);
    int64_t handle = g_next_handle++;
    g_loaders[handle] = L;
    return handle;
}

// Enqueue one file; results are delivered in submit order.
int64_t dl_submit(int64_t handle, const char* path) {
    auto L = get(handle);
    if (!L || !path) return -1;
    int64_t idx;
    {
        std::lock_guard<std::mutex> lock(L->m);
        idx = L->next_submit++;
        L->pending.emplace_back(idx, std::string(path));
    }
    L->cv_worker.notify_one();
    return idx;
}

// Block until the NEXT (submit-order) item is decoded; returns its
// status and fills shape/ndim/dtype/fortran/nbytes. The item stays
// current until dl_next_copy.
int32_t dl_next_meta(int64_t handle, int64_t* shape_out, int32_t* ndim,
                     int32_t* dtype, int32_t* fortran, int64_t* nbytes) {
    auto L = get(handle);
    if (!L) return -3;
    std::unique_lock<std::mutex> lock(L->m);
    int64_t want = L->next_deliver;
    if (want >= L->next_submit) return -2;      // nothing submitted
    L->cv_reader.wait(lock, [&] {
        return L->closing || L->done.count(want);
    });
    if (L->closing) return -3;
    auto item = L->done[want];
    *ndim = static_cast<int32_t>(item->shape.size());
    for (size_t i = 0; i < item->shape.size() && i < 16; ++i)
        shape_out[i] = item->shape[i];
    *dtype = item->dtype;
    *fortran = item->fortran;
    *nbytes = static_cast<int64_t>(item->data.size());
    return item->status;
}

// Copy the current item's payload into dst and advance.
int32_t dl_next_copy(int64_t handle, uint8_t* dst) {
    auto L = get(handle);
    if (!L) return -3;
    std::shared_ptr<Item> item;
    {
        std::unique_lock<std::mutex> lock(L->m);
        int64_t want = L->next_deliver;
        L->cv_reader.wait(lock, [&] {
            return L->closing || L->done.count(want);
        });
        if (L->closing) return -3;
        item = L->done[want];
        L->done.erase(want);
        ++L->next_deliver;
    }
    if (item->status == 0 && dst && !item->data.empty())
        std::memcpy(dst, item->data.data(), item->data.size());
    L->cv_worker.notify_all();
    return item->status;
}

void dl_close(int64_t handle) {
    std::shared_ptr<Loader> L;
    {
        std::lock_guard<std::mutex> lock(g_mutex);
        auto it = g_loaders.find(handle);
        if (it == g_loaders.end()) return;
        L = it->second;
        g_loaders.erase(it);
    }
    {
        std::lock_guard<std::mutex> lock(L->m);
        L->closing = true;
    }
    L->cv_worker.notify_all();
    L->cv_reader.notify_all();
    for (auto& t : L->workers) t.join();
}

}  // extern "C"
