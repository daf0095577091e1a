// Native PLY binary-body reader for tpusplat.
//
// The TPU-native analogue of the reference's C++ scene loader
// (src/GSScene.cpp:26-68): the text header is parsed in Python, this reads
// the binary vertex records with large buffered I/O (and is the place where
// multi-threaded parsing / direct dtype conversion can live). Exposed via
// ctypes (tpusplat/io/native_loader.py).

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Reads `num_vertices` records of `nfloats` little-endian float32s starting
// at `body_offset`. Returns the number of complete records read.
int64_t tps_read_records(const char* path, int64_t body_offset,
                         int64_t num_vertices, int64_t nfloats, void* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, static_cast<long>(body_offset), SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  const size_t rec_bytes = static_cast<size_t>(nfloats) * sizeof(float);
  // Large buffered reads: 1M records at a time.
  char* dst = static_cast<char*>(out);
  int64_t done = 0;
  while (done < num_vertices) {
    const int64_t want = num_vertices - done;
    const size_t got = std::fread(dst + done * rec_bytes, rec_bytes,
                                  static_cast<size_t>(want), f);
    if (got == 0) break;
    done += static_cast<int64_t>(got);
  }
  std::fclose(f);
  return done;
}

}  // extern "C"
