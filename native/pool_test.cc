// TSAN test driver for the corpus decode pool (and the per-video decoder it
// wraps): decodes every video passed on argv through a 3-worker pool with a
// small bounded queue, twice, and checks frame accounting. Built with
// `make tsan-test` (thread sanitizer) and run by tests/test_native_dataplane.py
// when the binary exists.
//
// Usage: pool_test <video> [<video> ...]

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* vimo_pool_create(int workers, int chunk_frames, int max_ready);
int vimo_pool_submit(void* p, long job_id, const char* path);
void vimo_pool_seal(void* p);
int vimo_pool_peek(void* p, long* job_id, long* n, int* w, int* h,
                   int* final_flag, int* err);
long vimo_pool_take(void* p, void* out);
void vimo_pool_destroy(void* p);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <video>...\n", argv[0]);
    return 2;
  }
  long expect_finals = argc - 1;
  for (int round = 0; round < 2; round++) {
    void* pool = vimo_pool_create(3, 6, 3);
    for (int i = 1; i < argc; i++)
      if (vimo_pool_submit(pool, i, argv[i]) != 0) return 3;
    vimo_pool_seal(pool);

    long jid = 0, n = 0, total = 0, finals = 0;
    int w = 0, h = 0, fin = 0, err = 0;
    std::vector<unsigned char> buf;
    while (vimo_pool_peek(pool, &jid, &n, &w, &h, &fin, &err)) {
      buf.resize((size_t)n * w * h * 3);
      long got = vimo_pool_take(pool, n ? buf.data() : nullptr);
      if (got != n) return 4;
      total += n;
      if (fin) finals++;
    }
    vimo_pool_destroy(pool);
    if (finals != expect_finals) {
      std::fprintf(stderr, "round %d: finals %ld != %ld\n", round, finals,
                   expect_finals);
      return 5;
    }
    std::printf("round %d: %ld frames, %ld finals\n", round, total, finals);
  }

  // Mid-stream teardown: destroy with jobs still queued / decoding and the
  // ready queue non-empty. Workers must abandon in-flight videos at the next
  // block boundary and join without deadlock or races.
  {
    void* pool = vimo_pool_create(3, 2, 2);  // tiny blocks, tiny queue
    for (int rep = 0; rep < 4; rep++)
      for (int i = 1; i < argc; i++)
        if (vimo_pool_submit(pool, rep * argc + i, argv[i]) != 0) return 6;
    long jid = 0, n = 0;
    int w = 0, h = 0, fin = 0, err = 0;
    std::vector<unsigned char> buf;
    if (vimo_pool_peek(pool, &jid, &n, &w, &h, &fin, &err)) {
      buf.resize((size_t)n * w * h * 3);
      if (vimo_pool_take(pool, n ? buf.data() : nullptr) != n) return 7;
    }
    vimo_pool_destroy(pool);  // most submitted work still outstanding
    std::printf("mid-stream destroy OK\n");
  }

  std::printf("pool_test OK\n");
  return 0;
}
