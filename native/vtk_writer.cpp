// Fast legacy-VTK STRUCTURED_GRID serializer.
//
// Native replacement for the reference's per-float struct.pack loop
// (`Cylinder/Non-uniform density/Coronal/Movies/Export_vtk.py:71-110`):
// identical bytes (ASCII header, big-endian float32 points in k-major order,
// per-variable SCALARS blocks), written via a single buffered pass.
//
// Exposed as a plain C ABI consumed from Python through ctypes
// (eigensolver_tpu/native/vtk_native.py). Input arrays are C-contiguous
// float32 of shape (ax, ay, az); file order is k-outer / i-inner, matching
// the reference's `for k: for j: for i:` loops.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

inline uint32_t bswap32(uint32_t v) {
#if defined(__GNUC__) || defined(__clang__)
  return __builtin_bswap32(v);
#else
  return ((v & 0xFF) << 24) | ((v & 0xFF00) << 8) | ((v >> 8) & 0xFF00) |
         ((v >> 24) & 0xFF);
#endif
}

// Gather a C-order (ax, ay, az) array into k-major big-endian order.
void gather_kmajor_be(const float* a, int ax, int ay, int az,
                      std::vector<uint32_t>& out) {
  out.resize(static_cast<size_t>(ax) * ay * az);
  size_t n = 0;
  for (int k = 0; k < az; ++k)
    for (int j = 0; j < ay; ++j)
      for (int i = 0; i < ax; ++i) {
        uint32_t bits;
        std::memcpy(&bits,
                    &a[(static_cast<size_t>(i) * ay + j) * az + k],
                    sizeof(float));
        out[n++] = bswap32(bits);
      }
}

}  // namespace

extern "C" {

// Returns 0 on success, negative errno-style codes on failure.
int eig_write_structured_grid(const char* path, int ax, int ay, int az,
                              const float* x, const float* y, const float* z,
                              int nvars, const char** names,
                              const float* const* vars) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;

  const long long n = static_cast<long long>(ax) * ay * az;
  std::fprintf(f, "# vtk DataFile Version 3.0 \n");
  std::fprintf(f, "vtk output \n");
  std::fprintf(f, "BINARY \n");
  std::fprintf(f, "DATASET STRUCTURED_GRID \n");
  std::fprintf(f, "DIMENSIONS  %d %d %d  \n", ax, ay, az);
  std::fprintf(f, "POINTS %lld float  \n", n);

  // interleaved x,y,z per point, k-major
  {
    std::vector<uint32_t> bx, by, bz;
    gather_kmajor_be(x, ax, ay, az, bx);
    gather_kmajor_be(y, ax, ay, az, by);
    gather_kmajor_be(z, ax, ay, az, bz);
    std::vector<uint32_t> inter(static_cast<size_t>(n) * 3);
    for (long long p = 0; p < n; ++p) {
      inter[3 * p + 0] = bx[p];
      inter[3 * p + 1] = by[p];
      inter[3 * p + 2] = bz[p];
    }
    if (std::fwrite(inter.data(), 4, inter.size(), f) !=
        inter.size()) { std::fclose(f); return -2; }
  }

  std::fprintf(f, "\nPOINT_DATA %lld  ", n);
  std::vector<uint32_t> buf;
  for (int v = 0; v < nvars; ++v) {
    std::fprintf(f, "\nSCALARS %s float \n", names[v]);
    std::fprintf(f, "LOOKUP_TABLE default \n");
    gather_kmajor_be(vars[v], ax, ay, az, buf);
    if (std::fwrite(buf.data(), 4, buf.size(), f) != buf.size()) {
      std::fclose(f);
      return -2;
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
