// Threaded CPU bit-packers — native analog of the reference's JIT-compiled
// pack_block extension (gptqmodel/utils/cpp.py::_pack_block_extension,
// qlinear/__init__.py:1036 pack_block): packing whole checkpoints is the
// host-side hot path of quantization finalize, and the numpy route is
// single-threaded. Built at first use via g++ (see utils/cpp.py), called
// through ctypes; bit-exact with the numpy reference (tests/test_cpp_pack.py).
//
// Layout contracts (must match ops/pack.py):
// - continuous: word r of column c packs codes[r*pf + j][c] at bit offset
//   bits*j, pf = 32/bits (bits in {2,4,8}).
// - planar (gptq_p): per 32-code block, `bits` words, low plane first;
//   plane of width w stores codes i*(32/w).. in word i at shifts w*j
//   (docs: reference docs/gptq_planar.md).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void pack_cont_cols(const int32_t* codes, int32_t* out, int64_t n, int64_t m,
                    int bits, int64_t c0, int64_t c1) {
  const int pf = 32 / bits;
  const int64_t rows_out = n / pf;
  for (int64_t r = 0; r < rows_out; ++r) {
    const int32_t* src = codes + (r * pf) * m;
    int32_t* dst = out + r * m;
    for (int64_t c = c0; c < c1; ++c) {
      uint32_t w = 0;
      for (int j = 0; j < pf; ++j) {
        w |= (static_cast<uint32_t>(src[j * m + c]) & ((1u << bits) - 1u))
             << (bits * j);
      }
      dst[c] = static_cast<int32_t>(w);
    }
  }
}

struct Plane {
  int width;
  int offset;
};

// bits -> plane layout (low to high), mirroring ops/pack.py _PLANAR_PLANES
static const Plane kPlanes[9][3] = {
    {}, {}, {{2, 0}}, {{2, 0}, {1, 2}}, {{4, 0}},
    {{4, 0}, {1, 4}}, {{4, 0}, {2, 4}}, {{4, 0}, {2, 4}, {1, 6}}, {{8, 0}},
};
static const int kNumPlanes[9] = {0, 0, 1, 2, 1, 2, 2, 3, 1};

void pack_planar_cols(const int32_t* codes, int32_t* out, int64_t n, int64_t m,
                      int bits, int64_t c0, int64_t c1) {
  const int64_t blocks = n / 32;
  for (int64_t b = 0; b < blocks; ++b) {
    const int32_t* src = codes + (b * 32) * m;
    int32_t* dst = out + (b * bits) * m;
    int row = 0;
    for (int p = 0; p < kNumPlanes[bits]; ++p) {
      const int w = kPlanes[bits][p].width;
      const int off = kPlanes[bits][p].offset;
      const int pf = 32 / w;
      for (int i = 0; i < w; ++i) {  // word i of this plane
        int32_t* d = dst + (row + i) * m;
        for (int64_t c = c0; c < c1; ++c) {
          uint32_t acc = 0;
          for (int j = 0; j < pf; ++j) {
            uint32_t v = static_cast<uint32_t>(src[(i * pf + j) * m + c]);
            acc |= ((v >> off) & ((1u << w) - 1u)) << (w * j);
          }
          d[c] = static_cast<int32_t>(acc);
        }
      }
      row += w;
    }
  }
}

template <typename Fn>
void run_threads(int64_t m, int threads, Fn fn) {
  if (threads <= 1) {
    fn(0, m);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (m + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t c0 = t * chunk;
    int64_t c1 = c0 + chunk < m ? c0 + chunk : m;
    if (c0 >= c1) break;
    pool.emplace_back([=] { fn(c0, c1); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// codes [n, m] int32 -> out [n*bits/32, m] int32 (continuous layout)
void pack_axis0_cont(const int32_t* codes, int32_t* out, int64_t n, int64_t m,
                     int bits, int threads) {
  run_threads(m, threads, [&](int64_t c0, int64_t c1) {
    pack_cont_cols(codes, out, n, m, bits, c0, c1);
  });
}

// codes [n, m] int32 -> out [n*bits/32, m] int32 (planar layout)
void pack_axis0_planar(const int32_t* codes, int32_t* out, int64_t n,
                       int64_t m, int bits, int threads) {
  run_threads(m, threads, [&](int64_t c0, int64_t c1) {
    pack_planar_cols(codes, out, n, m, bits, c0, c1);
  });
}

}  // extern "C"
