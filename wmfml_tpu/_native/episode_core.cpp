// Native episode-assembly core.
//
// The reference assembles every episode with a per-task Python loop over
// numpy fancy-indexing (dataset/shapenet_3d.py:143-209). At production batch
// sizes the host-side gather (tens of MB of image rows per batch) is the part
// that must overlap with TPU compute, so it runs here: a multithreaded
// strided gather from the dataset blob into one contiguous staging buffer
// that feeds jax.device_put directly.
//
// Layout contract (row-major):
//   data  [n_items, views, row_bytes]   -- one "row" = one image (any dtype)
//   items [tasks]                       -- item index per task
//   perm  [tasks, views]                -- view permutation per task
//   ctx   [tasks, shot,  row_bytes]
//   qry   [tasks, query, row_bytes]     -- views perm[shot : shot+query]
//
// Build: make -C wmfml_tpu/_native   (g++ -O3 -shared; no deps)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather context+query image rows for a batch of episodic tasks.
// Returns 0 on success.
int assemble_episode(const uint8_t* data, int64_t n_items, int64_t views,
                     int64_t row_bytes, const int64_t* items,
                     const int64_t* perm, int64_t tasks, int64_t shot,
                     int64_t query, int64_t query_offset, uint8_t* ctx_out,
                     uint8_t* qry_out, int n_threads) {
  if (shot + query_offset + query > views && query_offset >= 0) {
    // query views must exist; query_offset < 0 means "wrap from 0" (eval
    // mode uses all views: offset 0, query == views)
    return 1;
  }
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > tasks) n_threads = static_cast<int>(tasks);

  auto worker = [&](int64_t t0, int64_t t1) {
    for (int64_t t = t0; t < t1; ++t) {
      const int64_t item = items[t];
      if (item < 0 || item >= n_items) continue;
      const uint8_t* base = data + item * views * row_bytes;
      const int64_t* p = perm + t * views;
      uint8_t* ctx_dst = ctx_out + t * shot * row_bytes;
      for (int64_t s = 0; s < shot; ++s) {
        std::memcpy(ctx_dst + s * row_bytes, base + p[s] * row_bytes,
                    static_cast<size_t>(row_bytes));
      }
      uint8_t* qry_dst = qry_out + t * query * row_bytes;
      const int64_t off = query_offset >= 0 ? shot + query_offset : 0;
      for (int64_t q = 0; q < query; ++q) {
        std::memcpy(qry_dst + q * row_bytes, base + p[off + q] * row_bytes,
                    static_cast<size_t>(row_bytes));
      }
    }
  };

  if (n_threads <= 1) {
    worker(0, tasks);
    return 0;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (tasks + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; ++i) {
    const int64_t t0 = i * chunk;
    const int64_t t1 = t0 + chunk < tasks ? t0 + chunk : tasks;
    if (t0 >= t1) break;
    threads.emplace_back(worker, t0, t1);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Fused gather of label rows (float32), same layout contract.
int assemble_labels(const float* labels, int64_t n_items, int64_t views,
                    int64_t dim, const int64_t* items, const int64_t* perm,
                    int64_t tasks, int64_t shot, int64_t query,
                    int64_t query_offset, float* ctx_out, float* qry_out) {
  for (int64_t t = 0; t < tasks; ++t) {
    const int64_t item = items[t];
    if (item < 0 || item >= n_items) continue;
    const float* base = labels + item * views * dim;
    const int64_t* p = perm + t * views;
    for (int64_t s = 0; s < shot; ++s) {
      std::memcpy(ctx_out + (t * shot + s) * dim, base + p[s] * dim,
                  sizeof(float) * static_cast<size_t>(dim));
    }
    const int64_t off = query_offset >= 0 ? shot + query_offset : 0;
    for (int64_t q = 0; q < query; ++q) {
      std::memcpy(qry_out + (t * query + q) * dim, base + p[off + q] * dim,
                  sizeof(float) * static_cast<size_t>(dim));
    }
  }
  return 0;
}

// Alpha-mask background compositing for a whole split, multithreaded.
// images [n, h*w, 4] float32 (alpha==1 marks background pixels,
// dataset/shapenet_3d.py:238-239); bg [n_bg, h*w, 3]; bg_idx [n].
int composite_backgrounds(float* images, int64_t n, int64_t pixels,
                          const float* bg, int64_t n_bg,
                          const int64_t* bg_idx, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  auto worker = [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      float* img = images + i * pixels * 4;
      const float* b = bg + (bg_idx[i] % n_bg) * pixels * 3;
      for (int64_t p = 0; p < pixels; ++p) {
        const bool is_fg = img[p * 4 + 3] < 1.0f;
        if (!is_fg) {
          img[p * 4 + 0] = b[p * 3 + 0];
          img[p * 4 + 1] = b[p * 3 + 1];
          img[p * 4 + 2] = b[p * 3 + 2];
        }
      }
    }
  };
  std::vector<std::thread> threads;
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; ++i) {
    const int64_t i0 = i * chunk;
    const int64_t i1 = i0 + chunk < n ? i0 + chunk : n;
    if (i0 >= i1) break;
    threads.emplace_back(worker, i0, i1);
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
