// Host-side native runtime for lightgaussian_tpu.
//
// The reference keeps its hot host/device helpers in native code
// (`/root/reference/submodules/simple-knn/*.cu` for 3-NN scale init; its data
// layer leans on compiled plyfile/struct paths). The TPU build keeps device
// math in Pallas/XLA; this library covers the *host* hot paths:
//
//   * COLMAP binary parsing (`images.bin` / `points3D.bin`) — variable-length
//     records that cost a Python struct loop seconds on million-point scenes
//     (`scene/colmap_loader.py:148-289` semantics).
//   * Morton-windowed mean-squared-distance-to-3-NN over float3 points — the
//     `simple_knn._C.distCUDA2` equivalent (`simple_knn.cu:147-183`) for
//     Gaussian scale initialization on host.
//   * MSB-first bit packing/unpacking used by the VecTree `extreme_saving`
//     bundle (`vectree/utils.py:105-111` semantics).
//
// Exposed as a plain C ABI for ctypes; no Python.h dependency.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <limits>
#include <numeric>
#include <vector>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;
  template <typename T>
  T take() {
    if (p + sizeof(T) > end) {
      ok = false;
      return T{};
    }
    T v;
    std::memcpy(&v, p, sizeof(T));
    p += sizeof(T);
    return v;
  }
  bool skip(size_t n) {
    if (p + n > end) return ok = false;
    p += n;
    return true;
  }
};

inline uint32_t expand_bits_10(uint32_t v) {
  v = (v | (v << 16)) & 0x030000FF;
  v = (v | (v << 8)) & 0x0300F00F;
  v = (v | (v << 4)) & 0x030C30C3;
  v = (v | (v << 2)) & 0x09249249;
  return v;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// images.bin
// ---------------------------------------------------------------------------
// Layout per record (colmap read_write_model.py):
//   image_id i32 | qvec 4xf64 | tvec 3xf64 | camera_id i32 | name NUL-str |
//   n_pts u64 | n_pts x (x f64, y f64, point3D_id i64)
//
// Two-phase API: lg_images_bin_sizes() scans once and reports totals so the
// caller can allocate numpy arrays; lg_parse_images_bin() fills them.

int lg_images_bin_sizes(const uint8_t* buf, uint64_t len, uint64_t* n_images,
                        uint64_t* total_points, uint64_t* total_name_bytes) {
  Cursor c{buf, buf + len};
  uint64_t n = c.take<uint64_t>();
  uint64_t pts = 0, name_bytes = 0;
  for (uint64_t i = 0; i < n && c.ok; ++i) {
    c.skip(4 + 7 * 8 + 4);  // image_id, qvec+tvec, camera_id
    const uint8_t* nul =
        static_cast<const uint8_t*>(std::memchr(c.p, 0, c.end - c.p));
    if (!nul) return 1;
    name_bytes += (nul - c.p) + 1;
    c.p = nul + 1;
    uint64_t np = c.take<uint64_t>();
    pts += np;
    c.skip(np * 24);
  }
  if (!c.ok) return 1;
  *n_images = n;
  *total_points = pts;
  *total_name_bytes = name_bytes;
  return 0;
}

// meta: i64[n,4] = (image_id, camera_id, n_pts, name_offset)
// qt:   f64[n,7] = (qw,qx,qy,qz, tx,ty,tz)
// names: concatenated NUL-terminated strings (total_name_bytes)
// xys:  f64[total_points,2]; ids: i64[total_points]
int lg_parse_images_bin(const uint8_t* buf, uint64_t len, int64_t* meta,
                        double* qt, char* names, double* xys, int64_t* ids) {
  Cursor c{buf, buf + len};
  uint64_t n = c.take<uint64_t>();
  uint64_t pt_off = 0, name_off = 0;
  for (uint64_t i = 0; i < n && c.ok; ++i) {
    int32_t image_id = c.take<int32_t>();
    for (int k = 0; k < 7; ++k) qt[i * 7 + k] = c.take<double>();
    int32_t camera_id = c.take<int32_t>();
    const uint8_t* nul =
        static_cast<const uint8_t*>(std::memchr(c.p, 0, c.end - c.p));
    if (!nul) return 1;
    size_t name_len = (nul - c.p) + 1;  // include NUL
    std::memcpy(names + name_off, c.p, name_len);
    c.p = nul + 1;
    uint64_t np = c.take<uint64_t>();
    if (c.p + np * 24 > c.end) return 1;
    // packed (x f64, y f64, id i64) triples; deinterleave
    for (uint64_t j = 0; j < np; ++j) {
      std::memcpy(&xys[(pt_off + j) * 2], c.p + j * 24, 16);
      std::memcpy(&ids[pt_off + j], c.p + j * 24 + 16, 8);
    }
    c.p += np * 24;
    meta[i * 4 + 0] = image_id;
    meta[i * 4 + 1] = camera_id;
    meta[i * 4 + 2] = static_cast<int64_t>(np);
    meta[i * 4 + 3] = static_cast<int64_t>(name_off);
    pt_off += np;
    name_off += name_len;
  }
  return c.ok ? 0 : 1;
}

// ---------------------------------------------------------------------------
// points3D.bin
// ---------------------------------------------------------------------------
// Record: point_id u64 | xyz 3xf64 | rgb 3xu8 | error f64 |
//         track_len u64 | track_len x (image_id i32, point2D_idx i32)

int lg_points3d_bin_count(const uint8_t* buf, uint64_t len, uint64_t* n_out) {
  if (len < 8) return 1;
  std::memcpy(n_out, buf, 8);
  return 0;
}

int lg_parse_points3d_bin(const uint8_t* buf, uint64_t len, double* xyz,
                          uint8_t* rgb, double* err) {
  Cursor c{buf, buf + len};
  uint64_t n = c.take<uint64_t>();
  for (uint64_t i = 0; i < n && c.ok; ++i) {
    c.skip(8);  // point id
    for (int k = 0; k < 3; ++k) xyz[i * 3 + k] = c.take<double>();
    for (int k = 0; k < 3; ++k) rgb[i * 3 + k] = c.take<uint8_t>();
    err[i] = c.take<double>();
    uint64_t track = c.take<uint64_t>();
    c.skip(track * 8);
  }
  return c.ok ? 0 : 1;
}

// ---------------------------------------------------------------------------
// Morton-windowed mean squared distance to 3 nearest neighbors
// ---------------------------------------------------------------------------

// points: f32[n,3]; out: f32[n]; window: candidates per side per ordering.
// Same Morton-locality approximation as the CUDA boxMeanDist
// (`simple_knn.cu:147-183`) and the jnp path (`ops/knn.py`): union of
// candidates from 3 axis-permuted Morton orderings, exact top-3 distances.
int lg_knn3_mean_sq_dist(const float* points, uint64_t n, int window,
                         float* out) {
  if (n == 0) return 0;
  if (n <= 4) {
    // tiny scenes: exact all-pairs
    for (uint64_t i = 0; i < n; ++i) {
      std::vector<float> d;
      for (uint64_t j = 0; j < n; ++j) {
        if (i == j) continue;
        float dx = points[i * 3] - points[j * 3];
        float dy = points[i * 3 + 1] - points[j * 3 + 1];
        float dz = points[i * 3 + 2] - points[j * 3 + 2];
        d.push_back(dx * dx + dy * dy + dz * dz);
      }
      std::sort(d.begin(), d.end());
      size_t k = std::min<size_t>(3, d.size());
      float s = 0;
      for (size_t t = 0; t < k; ++t) s += d[t];
      out[i] = k ? s / k : 0.f;
    }
    return 0;
  }

  float mins[3] = {points[0], points[1], points[2]};
  float maxs[3] = {points[0], points[1], points[2]};
  for (uint64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      mins[k] = std::min(mins[k], points[i * 3 + k]);
      maxs[k] = std::max(maxs[k], points[i * 3 + k]);
    }
  float inv[3];
  for (int k = 0; k < 3; ++k) {
    float r = maxs[k] - mins[k];
    inv[k] = r > 1e-12f ? 1023.0f / r : 0.f;
  }

  std::vector<uint32_t> q(n * 3);
  for (uint64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      float s = (points[i * 3 + k] - mins[k]) * inv[k];
      q[i * 3 + k] = expand_bits_10(
          static_cast<uint32_t>(std::min(1023.0f, std::max(0.0f, s))));
    }

  const int perms[3][3] = {{0, 1, 2}, {1, 2, 0}, {2, 0, 1}};
  std::vector<uint64_t> order(n);
  std::vector<uint64_t> keys(n);
  // best3[i] = three smallest squared distances found so far, with the
  // matching neighbor ids so a pair revisited from another Morton ordering
  // (each pair can surface up to 6 times) doesn't occupy multiple slots.
  constexpr uint64_t kNone = ~uint64_t{0};
  std::vector<float> best(n * 3, std::numeric_limits<float>::infinity());
  std::vector<uint64_t> best_id(n * 3, kNone);

  auto consider = [&](uint64_t i, uint64_t j) {
    float* b = &best[i * 3];
    uint64_t* ids3 = &best_id[i * 3];
    if (ids3[0] == j || ids3[1] == j || ids3[2] == j) return;
    float dx = points[i * 3] - points[j * 3];
    float dy = points[i * 3 + 1] - points[j * 3 + 1];
    float dz = points[i * 3 + 2] - points[j * 3 + 2];
    float d = dx * dx + dy * dy + dz * dz;
    if (d < b[2]) {
      if (d < b[0]) {
        b[2] = b[1]; ids3[2] = ids3[1];
        b[1] = b[0]; ids3[1] = ids3[0];
        b[0] = d; ids3[0] = j;
      } else if (d < b[1]) {
        b[2] = b[1]; ids3[2] = ids3[1];
        b[1] = d; ids3[1] = j;
      } else {
        b[2] = d; ids3[2] = j;
      }
    }
  };

  for (int p = 0; p < 3; ++p) {
    for (uint64_t i = 0; i < n; ++i)
      keys[i] = (static_cast<uint64_t>(q[i * 3 + perms[p][0]] |
                                       (q[i * 3 + perms[p][1]] << 1) |
                                       (q[i * 3 + perms[p][2]] << 2))
                 << 32) |
                i;
    std::sort(keys.begin(), keys.end());
    for (uint64_t s = 0; s < n; ++s) order[s] = keys[s] & 0xFFFFFFFFu;
    for (uint64_t s = 0; s < n; ++s) {
      uint64_t i = order[s];
      uint64_t lo = s > static_cast<uint64_t>(window) ? s - window : 0;
      uint64_t hi = std::min<uint64_t>(n, s + window + 1);
      for (uint64_t t = lo; t < hi; ++t) {
        if (t == s) continue;
        consider(i, order[t]);
      }
    }
  }

  for (uint64_t i = 0; i < n; ++i) {
    const float* b = &best[i * 3];
    out[i] = (b[0] + b[1] + b[2]) / 3.0f;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// MSB-first bit packing (vectree `dec2bin`/`bin2dec` semantics)
// ---------------------------------------------------------------------------

// values: u32[n] each < 2^bits -> packed bitstream u8[ceil(n*bits/8)]
int lg_pack_bits_msb(const uint32_t* values, uint64_t n, int bits,
                     uint8_t* out, uint64_t out_len) {
  std::memset(out, 0, out_len);
  uint64_t bitpos = 0;
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t v = values[i];
    for (int b = bits - 1; b >= 0; --b, ++bitpos) {
      if ((v >> b) & 1u) out[bitpos >> 3] |= 0x80u >> (bitpos & 7);
    }
  }
  return 0;
}

int lg_unpack_bits_msb(const uint8_t* packed, uint64_t packed_len, uint64_t n,
                       int bits, uint32_t* out) {
  uint64_t bitpos = 0;
  if ((n * bits + 7) / 8 > packed_len) return 1;
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t v = 0;
    for (int b = 0; b < bits; ++b, ++bitpos) {
      v = (v << 1) | ((packed[bitpos >> 3] >> (7 - (bitpos & 7))) & 1u);
    }
    out[i] = v;
  }
  return 0;
}

}  // extern "C"
