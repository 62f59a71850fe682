// Append-only binary root store with crash-safe intra-sweep checkpointing.
//
// The reference's only persistence is a single end-of-run pickle
// (`multiprocessor_Inhomogeneous_method.py:834-835`) - a crashed 1800-process
// sweep loses everything (SURVEY.md section 5, checkpoint/resume). This store
// appends fsync'd fixed-size records per completed (k-block, mode) so a sweep
// can resume from the last durable block. Consumed via ctypes
// (eigensolver_tpu/native/vtk_native.py + sweep checkpoint hooks).
//
// Layout: 16-byte header {magic 'EIGR', version u32, reserved u64} then
// records of {mode i32, flags u32, k f64, omega_re f64, omega_im f64} = 32 B.

#include <cstdint>
#include <cstdio>
#include <cstring>

#if defined(_WIN32)
#define EIG_FSYNC(f) std::fflush(f)
#else
#include <unistd.h>
#define EIG_FSYNC(f) (std::fflush(f), fsync(fileno(f)))
#endif

namespace {
constexpr uint32_t kMagic = 0x45494752;  // 'EIGR'
constexpr uint32_t kVersion = 1;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t reserved;
};

struct Record {
  int32_t mode;
  uint32_t flags;
  double k;
  double omega_re;
  double omega_im;
};
static_assert(sizeof(Record) == 32, "record layout");
}  // namespace

extern "C" {

// Open for append, writing the header if the file is new/empty.
// Returns an opaque handle (FILE*) or nullptr.
void* eig_store_open(const char* path) {
  FILE* f = std::fopen(path, "ab+");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  if (std::ftell(f) == 0) {
    Header h{kMagic, kVersion, 0};
    std::fwrite(&h, sizeof(h), 1, f);
    EIG_FSYNC(f);
  }
  return f;
}

// Append n records (parallel arrays) and fsync. Returns 0 on success.
int eig_store_append(void* handle, int32_t mode, int64_t n, const double* ks,
                     const double* om_re, const double* om_im) {
  FILE* f = static_cast<FILE*>(handle);
  if (!f) return -1;
  for (int64_t i = 0; i < n; ++i) {
    Record r{mode, 0u, ks[i], om_re[i], om_im ? om_im[i] : 0.0};
    if (std::fwrite(&r, sizeof(r), 1, f) != 1) return -2;
  }
  EIG_FSYNC(f);
  return 0;
}

// Number of complete records in the file (also validates the header).
int64_t eig_store_count(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h{};
  if (std::fread(&h, sizeof(h), 1, f) != 1 || h.magic != kMagic) {
    std::fclose(f);
    return -2;
  }
  std::fseek(f, 0, SEEK_END);
  long end = std::ftell(f);
  std::fclose(f);
  return (end - static_cast<long>(sizeof(Header))) /
         static_cast<long>(sizeof(Record));
}

// Read up to n records into parallel output arrays. Returns count read.
int64_t eig_store_read(const char* path, int64_t n, int32_t* modes, double* ks,
                       double* om_re, double* om_im) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h{};
  if (std::fread(&h, sizeof(h), 1, f) != 1 || h.magic != kMagic) {
    std::fclose(f);
    return -2;
  }
  int64_t i = 0;
  Record r;
  while (i < n && std::fread(&r, sizeof(r), 1, f) == 1) {
    modes[i] = r.mode;
    ks[i] = r.k;
    om_re[i] = r.omega_re;
    om_im[i] = r.omega_im;
    ++i;
  }
  std::fclose(f);
  return i;
}

void eig_store_close(void* handle) {
  if (handle) std::fclose(static_cast<FILE*>(handle));
}

}  // extern "C"
