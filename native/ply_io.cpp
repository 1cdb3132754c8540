// Native data-loading runtime for lidar_slam_tpu.
//
// TPU-native counterpart of the reference's C++ I/O layer
// (slam_viz/src/core/file_utils.cpp:20-141 load_ply/load_bin and
// tools/convert_to_ply.cpp): binary PLY / KITTI-bin parsing plus an
// asynchronous readahead prefetcher, so host disk latency hides behind
// device compute. Exposed as a C ABI consumed via ctypes
// (lidar_slam_tpu/utils/native.py) — no pybind11 dependency.
//
// All loaders return the number of points written to `out` (x,y,z triples),
// or -1 on error. `cap` bounds the number of points.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Property {
    std::string name;
    size_t size;
};

size_t type_size(const std::string& t) {
    if (t == "float" || t == "float32" || t == "uint" || t == "uint32" ||
        t == "int" || t == "int32")
        return 4;
    if (t == "double" || t == "float64") return 8;
    if (t == "uchar" || t == "uint8" || t == "char" || t == "int8") return 1;
    if (t == "ushort" || t == "uint16" || t == "short" || t == "int16") return 2;
    return 4;
}

// Read one header line (bounded).
bool read_line(FILE* f, std::string& line) {
    line.clear();
    int c;
    while ((c = fgetc(f)) != EOF) {
        if (c == '\n') return true;
        if (c != '\r') line.push_back(static_cast<char>(c));
        if (line.size() > 4096) return false;
    }
    return !line.empty();
}

long load_ply_impl(const char* path, float* out, long cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    std::string line;
    if (!read_line(f, line) || line != "ply") {
        fclose(f);
        return -1;
    }
    long num_vertices = 0;
    bool binary = false;
    std::vector<Property> props;
    while (read_line(f, line)) {
        if (line.rfind("format", 0) == 0) {
            binary = line.find("binary") != std::string::npos;
        } else if (line.rfind("element vertex", 0) == 0) {
            num_vertices = atol(line.c_str() + 15);
        } else if (line.rfind("property", 0) == 0) {
            char dtype[64], name[64];
            if (sscanf(line.c_str(), "property %63s %63s", dtype, name) == 2)
                props.push_back({name, type_size(dtype)});
        } else if (line == "end_header") {
            break;
        }
    }
    long n = num_vertices < cap ? num_vertices : cap;
    if (n <= 0) {
        fclose(f);
        return 0;
    }
    size_t stride = 0, xo = 0, yo = 0, zo = 0;
    size_t xs = 0, ys = 0, zs = 0;  // per-coordinate property byte widths
    for (const auto& p : props) {
        if (p.name == "x") { xo = stride; xs = p.size; }
        if (p.name == "y") { yo = stride; ys = p.size; }
        if (p.name == "z") { zo = stride; zs = p.size; }
        stride += p.size;
    }
    if (binary) {
        // Only float32 and float64 coordinates are handled; anything else
        // returns -1 so callers fall back to the Python parser instead of
        // silently reinterpreting bytes.
        if ((xs != 4 && xs != 8) || (ys != 4 && ys != 8) ||
            (zs != 4 && zs != 8)) {
            fclose(f);
            return -1;
        }
        std::vector<char> buf(stride * static_cast<size_t>(n));
        size_t got = fread(buf.data(), stride, static_cast<size_t>(n), f);
        fclose(f);
        auto read_coord = [](const char* p, size_t sz) -> float {
            if (sz == 8) {
                double d;
                std::memcpy(&d, p, 8);
                return static_cast<float>(d);
            }
            float v;
            std::memcpy(&v, p, 4);
            return v;
        };
        for (size_t i = 0; i < got; ++i) {
            const char* rec = buf.data() + i * stride;
            out[i * 3 + 0] = read_coord(rec + xo, xs);
            out[i * 3 + 1] = read_coord(rec + yo, ys);
            out[i * 3 + 2] = read_coord(rec + zo, zs);
        }
        return static_cast<long>(got);
    }
    // ASCII body: x y z are the first three columns in property order only if
    // laid out that way; match the reference by reading the first 3 floats.
    long i = 0;
    while (i < n && read_line(f, line)) {
        double x, y, z;
        if (sscanf(line.c_str(), "%lf %lf %lf", &x, &y, &z) == 3) {
            out[i * 3 + 0] = static_cast<float>(x);
            out[i * 3 + 1] = static_cast<float>(y);
            out[i * 3 + 2] = static_cast<float>(z);
            ++i;
        }
    }
    fclose(f);
    return i;
}

long load_bin_impl(const char* path, float* out, long cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    long n = bytes / 16;  // x,y,z,intensity float32
    if (n > cap) n = cap;
    std::vector<float> buf(static_cast<size_t>(n) * 4);
    size_t got = fread(buf.data(), 16, static_cast<size_t>(n), f);
    fclose(f);
    for (size_t i = 0; i < got; ++i) {
        out[i * 3 + 0] = buf[i * 4 + 0];
        out[i * 3 + 1] = buf[i * 4 + 1];
        out[i * 3 + 2] = buf[i * 4 + 2];
    }
    return static_cast<long>(got);
}

// ---------------------------------------------------------------------------
// Host voxel-grid downsampling (centroid per voxel), mirroring the reference
// host implementation (file_utils.cpp:148-196). Running it inside the
// prefetch worker overlaps it with device compute, taking it off the SLAM
// critical path entirely, and shrinks the host->device transfer.
// ---------------------------------------------------------------------------

long voxel_downsample_impl(const float* pts, long n, float voxel, float* out,
                           long cap) {
    if (voxel <= 0) {
        long m = n < cap ? n : cap;
        std::memcpy(out, pts, static_cast<size_t>(m) * 3 * sizeof(float));
        return m;
    }
    struct Acc {
        double x = 0, y = 0, z = 0;
        int cnt = 0;
    };
    std::unordered_map<long long, Acc> map;
    map.reserve(static_cast<size_t>(n));
    const double inv = 1.0 / voxel;
    for (long i = 0; i < n; ++i) {
        const float x = pts[i * 3], y = pts[i * 3 + 1], z = pts[i * 3 + 2];
        // floor(p / voxel) per axis, packed like the device kernel
        long long qx = (long long)std::floor(x * inv) + (1 << 20);
        long long qy = (long long)std::floor(y * inv) + (1 << 20);
        long long qz = (long long)std::floor(z * inv) + (1 << 20);
        long long key = (qx << 42) | (qy << 21) | qz;
        Acc& a = map[key];
        a.x += x;
        a.y += y;
        a.z += z;
        a.cnt += 1;
    }
    // Emit in ascending key order (x-major): consumers rely on x-sorted
    // clouds for slab-pruned correspondence search (ops/slab_nn.py), matching
    // the device voxel kernel's sorted output. When over capacity, keep an
    // evenly strided subset (spatially fair).
    std::vector<std::pair<long long, const Acc*>> items;
    items.reserve(map.size());
    for (const auto& kv : map) items.emplace_back(kv.first, &kv.second);
    std::sort(items.begin(), items.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    const long total = static_cast<long>(items.size());
    const long m = total < cap ? total : cap;
    for (long i = 0; i < m; ++i) {
        const Acc& a = *items[total <= cap ? i : (i * total) / cap].second;
        out[i * 3] = static_cast<float>(a.x / a.cnt);
        out[i * 3 + 1] = static_cast<float>(a.y / a.cnt);
        out[i * 3 + 2] = static_cast<float>(a.z / a.cnt);
    }
    return m;
}

// ---------------------------------------------------------------------------
// Host radius-neighborhood PCA normals via a voxel-hash grid.
// Mirrors the semantics of lidar_slam_tpu/ops/normals.py (radius method):
// neighbors within `radius`, covariance about their centroid, smallest
// eigenvector by the analytic trigonometric 3x3 method, z-oriented, (0,0,1)
// fallback for <3 neighbors. Runs inside the prefetch workers so it is
// overlapped with device compute (the device-side version costs ~4.5 ms per
// 16k scan on a v5e — pure win to hide it on the host).
// ---------------------------------------------------------------------------

// Normal from accumulated neighbor moments in QUERY-RELATIVE coordinates
// (sx..yz are sums of d and d*d^T components over cnt neighbors; relative
// coords avoid the catastrophic cancellation of absolute second moments at
// KITTI ranges). Smallest eigenvector by the analytic trigonometric 3x3
// method, z-oriented; (0,0,1) fallback for degenerate neighborhoods.
static void pca_normal_from_moments(double sx, double sy, double sz,
                                    double xx, double yy, double zz,
                                    double xy, double xz, double yz,
                                    int cnt, float* o) {
    if (cnt < 3) {
        o[0] = 0; o[1] = 0; o[2] = 1;
        return;
    }
    const double inv = 1.0 / cnt;
    const double mx = sx * inv, my = sy * inv, mz = sz * inv;
    double a00 = xx * inv - mx * mx, a11 = yy * inv - my * my,
           a22 = zz * inv - mz * mz;
    double a01 = xy * inv - mx * my, a02 = xz * inv - mx * mz,
           a12 = yz * inv - my * mz;
    // analytic smallest eigenvalue (trigonometric method)
    const double q = (a00 + a11 + a22) / 3.0;
    const double p1 = a01 * a01 + a02 * a02 + a12 * a12;
    const double p2 = (a00 - q) * (a00 - q) + (a11 - q) * (a11 - q) +
                      (a22 - q) * (a22 - q) + 2.0 * p1;
    const double p = std::sqrt(std::max(p2 / 6.0, 1e-30));
    const double b00 = (a00 - q) / p, b11 = (a11 - q) / p,
                 b22 = (a22 - q) / p;
    const double b01 = a01 / p, b02 = a02 / p, b12 = a12 / p;
    double detB = b00 * (b11 * b22 - b12 * b12) -
                  b01 * (b01 * b22 - b12 * b02) +
                  b02 * (b01 * b12 - b11 * b02);
    double rr = detB / 2.0;
    rr = rr < -1.0 ? -1.0 : (rr > 1.0 ? 1.0 : rr);
    const double phi = std::acos(rr) / 3.0;
    const double lam = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);
    // null-space direction of (A - lam I): largest cross product of rows
    const double r0x = a00 - lam, r0y = a01, r0z = a02;
    const double r1x = a01, r1y = a11 - lam, r1z = a12;
    const double r2x = a02, r2y = a12, r2z = a22 - lam;
    double c01x = r0y * r1z - r0z * r1y, c01y = r0z * r1x - r0x * r1z,
           c01z = r0x * r1y - r0y * r1x;
    double c02x = r0y * r2z - r0z * r2y, c02y = r0z * r2x - r0x * r2z,
           c02z = r0x * r2y - r0y * r2x;
    double c12x = r1y * r2z - r1z * r2y, c12y = r1z * r2x - r1x * r2z,
           c12z = r1x * r2y - r1y * r2x;
    double n01 = c01x * c01x + c01y * c01y + c01z * c01z;
    double n02 = c02x * c02x + c02y * c02y + c02z * c02z;
    double n12 = c12x * c12x + c12y * c12y + c12z * c12z;
    double vx, vy, vz, nn;
    if (n01 >= n02 && n01 >= n12) { vx = c01x; vy = c01y; vz = c01z; nn = n01; }
    else if (n02 >= n12) { vx = c02x; vy = c02y; vz = c02z; nn = n02; }
    else { vx = c12x; vy = c12y; vz = c12z; nn = n12; }
    if (nn < 1e-20) { o[0] = 0; o[1] = 0; o[2] = 1; return; }
    const double s = 1.0 / std::sqrt(nn);
    vx *= s; vy *= s; vz *= s;
    if (vz < 0) { vx = -vx; vy = -vy; vz = -vz; }
    o[0] = (float)vx; o[1] = (float)vy; o[2] = (float)vz;
}

void normals_radius_impl(const float* pts, long n, float radius, float* out) {
    const double r2 = (double)radius * radius;
    const double inv_cell = 1.0 / radius;
    std::unordered_map<long long, std::vector<int>> grid;
    grid.reserve(static_cast<size_t>(n));
    auto cell_key = [&](double x, double y, double z) -> long long {
        long long qx = (long long)std::floor(x * inv_cell) + (1 << 20);
        long long qy = (long long)std::floor(y * inv_cell) + (1 << 20);
        long long qz = (long long)std::floor(z * inv_cell) + (1 << 20);
        return (qx << 42) | (qy << 21) | qz;
    };
    for (long i = 0; i < n; ++i)
        grid[cell_key(pts[i * 3], pts[i * 3 + 1], pts[i * 3 + 2])].push_back(
            static_cast<int>(i));

    for (long i = 0; i < n; ++i) {
        const double px = pts[i * 3], py = pts[i * 3 + 1], pz = pts[i * 3 + 2];
        double sx = 0, sy = 0, sz = 0;
        double xx = 0, yy = 0, zz = 0, xy = 0, xz = 0, yz = 0;
        int cnt = 0;
        const long long cx = (long long)std::floor(px * inv_cell);
        const long long cy = (long long)std::floor(py * inv_cell);
        const long long cz = (long long)std::floor(pz * inv_cell);
        for (long long dx = -1; dx <= 1; ++dx)
            for (long long dy = -1; dy <= 1; ++dy)
                for (long long dz = -1; dz <= 1; ++dz) {
                    long long key = (((cx + dx) + (1 << 20)) << 42) |
                                    (((cy + dy) + (1 << 20)) << 21) |
                                    ((cz + dz) + (1 << 20));
                    auto it = grid.find(key);
                    if (it == grid.end()) continue;
                    for (int j : it->second) {
                        const double tx = pts[j * 3], ty = pts[j * 3 + 1],
                                     tz = pts[j * 3 + 2];
                        const double ddx = tx - px, ddy = ty - py,
                                     ddz = tz - pz;
                        if (ddx * ddx + ddy * ddy + ddz * ddz >= r2) continue;
                        // accumulate in query-relative coords (no cancellation)
                        sx += ddx; sy += ddy; sz += ddz;
                        xx += ddx * ddx; yy += ddy * ddy; zz += ddz * ddz;
                        xy += ddx * ddy; xz += ddx * ddz; yz += ddy * ddz;
                        ++cnt;
                    }
                }
        pca_normal_from_moments(sx, sy, sz, xx, yy, zz, xy, xz, yz, cnt,
                                out + i * 3);
    }
}

// ---------------------------------------------------------------------------
// Reference-exact k-NN PCA normals (icp.hpp:23-67): k nearest neighbors
// (self included, as in the reference's tree query), covariance about the
// neighbor centroid, smallest-eigenvalue eigenvector, z-oriented, (0,0,1)
// for < 3 neighbors. Static median-split KD-tree, branch pruning on the
// split plane. Runs in the prefetch workers / dataset-prep loop so the
// device never pays the 40-140x TPU cost of rank-based k-NN selection.
// ---------------------------------------------------------------------------

struct KDTree3 {
    static constexpr long BUCKET = 24;  // leaf size: linear scan below this
    const float* pts;
    long n;
    std::vector<int> idx;  // subtree = idx[lo, hi), split node at mid

    KDTree3(const float* p, long n_) : pts(p), n(n_), idx((size_t)n_) {
        for (long i = 0; i < n; ++i) idx[(size_t)i] = (int)i;
        build(0, n, 0);
    }

    void build(long lo, long hi, int axis) {
        if (hi - lo <= BUCKET) return;
        const long mid = (lo + hi) / 2;
        std::nth_element(
            idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
            [&](int a, int b) { return pts[a * 3 + axis] < pts[b * 3 + axis]; });
        const int next = axis == 2 ? 0 : axis + 1;
        build(lo, mid, next);
        build(mid + 1, hi, next);
    }

    static inline void heap_push(const double d2, const int pi, int k,
                                 std::pair<double, int>* heap, int& hn) {
        if (hn < k) {
            heap[hn++] = {d2, pi};
            std::push_heap(heap, heap + hn);
        } else if (d2 < heap[0].first) {
            std::pop_heap(heap, heap + hn);
            heap[hn - 1] = {d2, pi};
            std::push_heap(heap, heap + hn);
        }
    }

    // heap: max-heap of (dist2, point index), size k once warm.
    void query(const double q[3], int k, std::pair<double, int>* heap,
               int& hn, long lo, long hi, int axis) const {
        if (hi - lo <= BUCKET) {  // leaf: linear scan
            for (long j = lo; j < hi; ++j) {
                const int pi = idx[(size_t)j];
                const double dx = (double)pts[pi * 3] - q[0];
                const double dy = (double)pts[pi * 3 + 1] - q[1];
                const double dz = (double)pts[pi * 3 + 2] - q[2];
                heap_push(dx * dx + dy * dy + dz * dz, pi, k, heap, hn);
            }
            return;
        }
        const long mid = (lo + hi) / 2;
        const int pi = idx[(size_t)mid];
        const double dx = (double)pts[pi * 3] - q[0];
        const double dy = (double)pts[pi * 3 + 1] - q[1];
        const double dz = (double)pts[pi * 3 + 2] - q[2];
        heap_push(dx * dx + dy * dy + dz * dz, pi, k, heap, hn);
        const double diff = q[axis] - (double)pts[pi * 3 + axis];
        const int next = axis == 2 ? 0 : axis + 1;
        const long nlo = diff < 0 ? lo : mid + 1;
        const long nhi = diff < 0 ? mid : hi;
        query(q, k, heap, hn, nlo, nhi, next);
        // far side only if the split plane is closer than the current worst
        if (hn < k || diff * diff < heap[0].first) {
            const long flo = diff < 0 ? mid + 1 : lo;
            const long fhi = diff < 0 ? hi : mid;
            query(q, k, heap, hn, flo, fhi, next);
        }
    }
};

void normals_knn_impl(const float* pts, long n, int k, float* out) {
    if (n <= 0) return;
    if (k < 1) k = 1;
    if (k > n) k = (int)n;
    KDTree3 tree(pts, n);
    std::vector<std::pair<double, int>> heap((size_t)k);
    for (long i = 0; i < n; ++i) {
        const double q[3] = {(double)pts[i * 3], (double)pts[i * 3 + 1],
                             (double)pts[i * 3 + 2]};
        int hn = 0;
        tree.query(q, k, heap.data(), hn, 0, n, 0);
        double sx = 0, sy = 0, sz = 0;
        double xx = 0, yy = 0, zz = 0, xy = 0, xz = 0, yz = 0;
        for (int j = 0; j < hn; ++j) {
            const int pi = heap[(size_t)j].second;
            const double ddx = (double)pts[pi * 3] - q[0];
            const double ddy = (double)pts[pi * 3 + 1] - q[1];
            const double ddz = (double)pts[pi * 3 + 2] - q[2];
            sx += ddx; sy += ddy; sz += ddz;
            xx += ddx * ddx; yy += ddy * ddy; zz += ddz * ddz;
            xy += ddx * ddy; xz += ddx * ddz; yz += ddy * ddz;
        }
        pca_normal_from_moments(sx, sy, sz, xx, yy, zz, xy, xz, yz, hn,
                                out + i * 3);
    }
}

// ---------------------------------------------------------------------------
// Readahead prefetcher: a worker pool loads frames ahead of the consumer into
// fixed slots; get() blocks until its frame is ready. Frames are consumed
// roughly in order (SLAM playback), so eviction is by frame index.
// ---------------------------------------------------------------------------

struct Prefetcher {
    std::vector<std::string> paths;
    long cap;            // max points per frame (post-downsample)
    float voxel;         // > 0: voxel-downsample in the worker
    float normals_r;     // > 0: compute radius normals in the worker
    long normals_k;      // > 0: reference-exact k-NN normals instead (wins)
    long raw_cap;        // scratch capacity for raw points
    int window;          // number of readahead slots
    std::vector<std::vector<float>> normal_slots;
    std::vector<std::vector<float>> slots;
    std::vector<long> counts;        // points in slot (-2 = empty, -1 = error)
    std::vector<int> slot_frame;     // frame index held by slot
    std::atomic<long> next_to_load{0};
    std::atomic<long> consumed{0};
    std::atomic<bool> stop{false};
    std::mutex mu;
    std::condition_variable cv;
    std::vector<std::thread> workers;

    Prefetcher(const char** p, int n, long cap_, int window_, int n_threads,
               float voxel_ = 0.0f, long raw_cap_ = 0, float normals_r_ = 0.0f,
               long start_ = 0, long normals_k_ = 0)
        : cap(cap_), voxel(voxel_), normals_r(normals_r_),
          normals_k(normals_k_),
          raw_cap(raw_cap_ > 0 ? raw_cap_ : cap_), window(window_) {
        // Resume support: begin loading (and counting consumption) at
        // start_ so get(start_) doesn't deadlock behind window-full slots
        // of frames the consumer will never request.
        next_to_load.store(start_);
        consumed.store(start_);
        paths.assign(p, p + n);
        slots.resize(window);
        counts.assign(window, -2);
        slot_frame.assign(window, -1);
        for (auto& s : slots) s.resize(static_cast<size_t>(cap) * 3);
        if (normals_r > 0 || normals_k > 0) {
            normal_slots.resize(window);
            for (auto& s : normal_slots) s.resize(static_cast<size_t>(cap) * 3);
        }
        for (int t = 0; t < n_threads; ++t)
            workers.emplace_back([this] { work(); });
    }

    ~Prefetcher() {
        stop = true;
        cv.notify_all();
        for (auto& w : workers) w.join();
    }

    void work() {
        while (!stop) {
            long frame = next_to_load.fetch_add(1);
            if (frame >= static_cast<long>(paths.size())) break;
            int slot = static_cast<int>(frame % window);
            // wait until the slot's previous occupant was consumed
            {
                std::unique_lock<std::mutex> lk(mu);
                cv.wait(lk, [&] {
                    return stop || frame - consumed.load() < window;
                });
                if (stop) break;
            }
            const std::string& path = paths[static_cast<size_t>(frame)];
            long cnt;
            if (voxel > 0) {
                std::vector<float> raw(static_cast<size_t>(raw_cap) * 3);
                long nr;
                if (path.size() > 4 &&
                    path.compare(path.size() - 4, 4, ".bin") == 0)
                    nr = load_bin_impl(path.c_str(), raw.data(), raw_cap);
                else
                    nr = load_ply_impl(path.c_str(), raw.data(), raw_cap);
                cnt = nr < 0 ? nr
                             : voxel_downsample_impl(raw.data(), nr, voxel,
                                                     slots[slot].data(), cap);
            } else if (path.size() > 4 &&
                       path.compare(path.size() - 4, 4, ".bin") == 0) {
                cnt = load_bin_impl(path.c_str(), slots[slot].data(), cap);
            } else {
                cnt = load_ply_impl(path.c_str(), slots[slot].data(), cap);
            }
            if (cnt > 0) {
                if (normals_k > 0)
                    normals_knn_impl(slots[slot].data(), cnt,
                                     static_cast<int>(normals_k),
                                     normal_slots[slot].data());
                else if (normals_r > 0)
                    normals_radius_impl(slots[slot].data(), cnt, normals_r,
                                        normal_slots[slot].data());
            }
            {
                std::lock_guard<std::mutex> lk(mu);
                counts[slot] = cnt;
                slot_frame[slot] = static_cast<int>(frame);
            }
            cv.notify_all();
        }
    }

    long get(long frame, float* out, float* out_normals = nullptr) {
        int slot = static_cast<int>(frame % window);
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return slot_frame[slot] == static_cast<int>(frame); });
        long cnt = counts[slot];
        if (cnt > 0) {
            std::memcpy(out, slots[slot].data(),
                        static_cast<size_t>(cnt) * 3 * sizeof(float));
            if (out_normals && (normals_r > 0 || normals_k > 0))
                std::memcpy(out_normals, normal_slots[slot].data(),
                            static_cast<size_t>(cnt) * 3 * sizeof(float));
        }
        consumed.store(frame + 1);
        cv.notify_all();
        return cnt;
    }
};

}  // namespace

extern "C" {

long lidar_load_ply(const char* path, float* out, long cap) {
    return load_ply_impl(path, out, cap);
}

long lidar_load_bin(const char* path, float* out, long cap) {
    return load_bin_impl(path, out, cap);
}

int lidar_write_ply(const char* path, const float* pts, long n,
                    const float* intensity) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    char header[256];
    int hl = snprintf(
        header, sizeof(header),
        "ply\nformat binary_little_endian 1.0\nelement vertex %ld\n"
        "property float x\nproperty float y\nproperty float z\n%s"
        "end_header\n",
        n, intensity ? "property float intensity\n" : "");
    fwrite(header, 1, static_cast<size_t>(hl), f);
    if (intensity) {
        std::vector<float> rec(4);
        for (long i = 0; i < n; ++i) {
            rec[0] = pts[i * 3];
            rec[1] = pts[i * 3 + 1];
            rec[2] = pts[i * 3 + 2];
            rec[3] = intensity[i];
            fwrite(rec.data(), sizeof(float), 4, f);
        }
    } else {
        fwrite(pts, sizeof(float) * 3, static_cast<size_t>(n), f);
    }
    fclose(f);
    return 0;
}

long lidar_voxel_downsample(const float* pts, long n, float voxel, float* out,
                            long cap) {
    return voxel_downsample_impl(pts, n, voxel, out, cap);
}

void* lidar_prefetch_create(const char** paths, int n, long cap, int window,
                            int n_threads) {
    return new Prefetcher(paths, n, cap, window, n_threads);
}

void* lidar_prefetch_create_voxel(const char** paths, int n, long cap,
                                  int window, int n_threads, float voxel,
                                  long raw_cap) {
    return new Prefetcher(paths, n, cap, window, n_threads, voxel, raw_cap);
}

void* lidar_prefetch_create_full(const char** paths, int n, long cap,
                                 int window, int n_threads, float voxel,
                                 long raw_cap, float normals_radius) {
    return new Prefetcher(paths, n, cap, window, n_threads, voxel, raw_cap,
                          normals_radius);
}

// v2: adds start_frame for checkpoint resume (workers begin at start_frame
// instead of 0 — see Prefetcher ctor).
void* lidar_prefetch_create_v2(const char** paths, int n, long cap,
                               int window, int n_threads, float voxel,
                               long raw_cap, float normals_radius,
                               long start_frame) {
    return new Prefetcher(paths, n, cap, window, n_threads, voxel, raw_cap,
                          normals_radius, start_frame);
}

long lidar_prefetch_get_full(void* h, long frame, float* out_pts,
                             float* out_normals) {
    return static_cast<Prefetcher*>(h)->get(frame, out_pts, out_normals);
}

void lidar_normals_radius(const float* pts, long n, float radius, float* out) {
    normals_radius_impl(pts, n, radius, out);
}

// Reference-exact k-NN PCA normals (icp.hpp:23-67) — KD-tree, self included.
void lidar_normals_knn(const float* pts, long n, long k, float* out) {
    normals_knn_impl(pts, n, static_cast<int>(k), out);
}

// v3: adds normals_k (> 0 selects reference-exact k-NN worker normals,
// overriding normals_radius).
void* lidar_prefetch_create_v3(const char** paths, int n, long cap,
                               int window, int n_threads, float voxel,
                               long raw_cap, float normals_radius,
                               long start_frame, long normals_k) {
    return new Prefetcher(paths, n, cap, window, n_threads, voxel, raw_cap,
                          normals_radius, start_frame, normals_k);
}

long lidar_prefetch_get(void* h, long frame, float* out) {
    return static_cast<Prefetcher*>(h)->get(frame, out);
}

void lidar_prefetch_destroy(void* h) { delete static_cast<Prefetcher*>(h); }

}  // extern "C"
