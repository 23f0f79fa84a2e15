// C API + threaded prefetch loader for ofa_sr_tpu (ctypes binding surface).
//
// Replaces the reference's vendored PyTorch DataLoader machinery
// (my_data_loader.py, 836 LoC of worker/signal plumbing) with a compact
// native pipeline: decode -> random crop/flip/rotate -> bicubic 2x/4x
// downscale, running on a std::thread pool that keeps a bounded queue of
// ready batches ahead of the device.
//
// Determinism: every sample's transform RNG is an mt19937 seeded from
// (epoch, index) — worker scheduling can never change results (the Python
// loader holds the same contract; the two pipelines are each deterministic,
// not bit-identical to each other).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include "image.h"

namespace ofa {
namespace {

struct Sample {
  std::vector<float> hr, x2, x4;
  bool ok = false;
};

void rotate_nearest(const std::vector<float>& src, int h, int w, int c,
                    double deg, std::vector<float>* dst) {
  // torchvision RandomRotation default: nearest resample, no expand,
  // rotation about the center, out-of-bounds -> 0
  dst->assign(src.size(), 0.0f);
  const double rad = deg * M_PI / 180.0;
  const double cs = std::cos(rad), sn = std::sin(rad);
  const double cx = (w - 1) / 2.0, cy = (h - 1) / 2.0;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // inverse map output -> input
      double dx = x - cx, dy = y - cy;
      int sx = int(std::lround(cs * dx + sn * dy + cx));
      int sy = int(std::lround(-sn * dx + cs * dy + cy));
      if (sx >= 0 && sx < w && sy >= 0 && sy < h)
        std::memcpy(dst->data() + (size_t(y) * w + x) * c,
                    src.data() + (size_t(sy) * w + sx) * c,
                    size_t(c) * sizeof(float));
    }
  }
}

bool make_sr_sample(const std::string& path, int crop, uint64_t seed,
                    bool augment, Sample* out) {
  Image img;
  if (!load_image(path.c_str(), &img)) return false;
  std::vector<float> f(img.data.size());
  to_float(img, f.data());
  int h = img.h, w = img.w, c = img.c;

  std::mt19937_64 rng(seed);
  std::vector<float> work;
  if (augment) {
    if (h < crop || w < crop) return false;
    std::uniform_int_distribution<int> dt(0, h - crop), dl(0, w - crop);
    int top = dt(rng), left = dl(rng);
    work.resize(size_t(crop) * crop * c);
    crop_f32(f.data(), h, w, c, top, left, crop, crop, work.data());
    h = w = crop;
    // horizontal flip p=0.5
    std::uniform_real_distribution<double> u01(0.0, 1.0);
    if (u01(rng) < 0.5) {
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w / 2; ++x)
          for (int ch = 0; ch < c; ++ch)
            std::swap(work[(size_t(y) * w + x) * c + ch],
                      work[(size_t(y) * w + (w - 1 - x)) * c + ch]);
    }
    // rotation uniform(-90, 90), nearest
    std::uniform_real_distribution<double> da(-90.0, 90.0);
    std::vector<float> rot;
    rotate_nearest(work, h, w, c, da(rng), &rot);
    work.swap(rot);
  } else {
    // ModCrop(4)
    int th = h - h % 4, tw = w - w % 4;
    work.resize(size_t(th) * tw * c);
    crop_f32(f.data(), h, w, c, 0, 0, th, tw, work.data());
    h = th;
    w = tw;
  }

  out->hr.swap(work);
  out->x2.resize(size_t(h / 2) * (w / 2) * c);
  out->x4.resize(size_t(h / 4) * (w / 4) * c);
  resize_bicubic_f32(out->hr.data(), h, w, c, out->x2.data(), h / 2, w / 2);
  resize_bicubic_f32(out->hr.data(), h, w, c, out->x4.data(), h / 4, w / 4);
  out->ok = true;
  return true;
}

struct Loader {
  std::vector<std::string> paths;
  int crop = 96;
  int batch = 16;
  bool augment = true;
  uint64_t epoch = 0;
  int n_threads = 4;
  size_t queue_cap = 4;

  std::vector<int> order;          // index order for this epoch
  std::atomic<size_t> next_batch{0};
  size_t n_batches = 0;

  std::deque<std::pair<size_t, std::vector<Sample>>> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  size_t emit_next = 0;  // next batch id to hand to the consumer

  void start_epoch(uint64_t ep) {
    stop_workers();
    epoch = ep;
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = int(i);
    if (augment) {
      std::mt19937_64 rng(ep);
      for (size_t i = order.size(); i > 1; --i) {
        std::uniform_int_distribution<size_t> d(0, i - 1);
        std::swap(order[i - 1], order[d(rng)]);
      }
      n_batches = order.size() / size_t(batch);  // drop_last
    } else {
      n_batches = (order.size() + batch - 1) / size_t(batch);
    }
    next_batch = 0;
    emit_next = 0;
    ready.clear();
    stop = false;
    for (int t = 0; t < n_threads; ++t)
      workers.emplace_back([this] { worker(); });
  }

  void worker() {
    while (!stop) {
      size_t bi = next_batch.fetch_add(1);
      if (bi >= n_batches) return;
      std::vector<Sample> samples;
      size_t lo = bi * batch;
      size_t hi = std::min(lo + batch, order.size());
      for (size_t k = lo; k < hi; ++k) {
        Sample s;
        uint64_t seed = epoch * 1000003ull + uint64_t(order[k]);
        make_sr_sample(paths[order[k]], crop, seed, augment, &s);
        samples.push_back(std::move(s));
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [this] { return ready.size() < queue_cap || stop; });
      if (stop) return;
      ready.emplace_back(bi, std::move(samples));
      cv_ready.notify_all();
    }
  }

  // Pop the next batch IN ORDER (batches may finish out of order).
  bool pop(std::vector<Sample>* out) {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      if (emit_next >= n_batches) return false;
      for (auto it = ready.begin(); it != ready.end(); ++it) {
        if (it->first == emit_next) {
          *out = std::move(it->second);
          ready.erase(it);
          ++emit_next;
          cv_space.notify_all();
          return true;
        }
      }
      cv_ready.wait(lk);
    }
  }

  void stop_workers() {
    stop = true;
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers) t.join();
    workers.clear();
  }

  ~Loader() { stop_workers(); }
};

}  // namespace
}  // namespace ofa

// ---------------------------------------------------------------------------
// C API (ctypes surface)
// ---------------------------------------------------------------------------

extern "C" {

int ofa_image_dims(const char* path, int* h, int* w) {
  ofa::Image img;
  if (!ofa::load_image(path, &img)) return -1;
  *h = img.h;
  *w = img.w;
  return 0;
}

int ofa_decode_image(const char* path, float* out /* h*w*3 */) {
  ofa::Image img;
  if (!ofa::load_image(path, &img)) return -1;
  ofa::to_float(img, out);
  return 0;
}

int ofa_resize_bicubic(const float* src, int sh, int sw, int c, float* dst,
                       int dh, int dw) {
  ofa::resize_bicubic_f32(src, sh, sw, c, dst, dh, dw);
  return 0;
}

void* ofa_loader_create(const char** paths, int n_paths, int crop, int batch,
                        int augment, int n_threads) {
  auto* l = new ofa::Loader();
  l->paths.assign(paths, paths + n_paths);
  l->crop = crop;
  l->batch = batch;
  l->augment = augment != 0;
  l->n_threads = n_threads;
  return l;
}

void ofa_loader_start_epoch(void* handle, uint64_t epoch) {
  static_cast<ofa::Loader*>(handle)->start_epoch(epoch);
}

long ofa_loader_n_batches(void* handle) {
  return long(static_cast<ofa::Loader*>(handle)->n_batches);
}

// Fills caller buffers [batch, crop, crop, 3] / halves / quarters.
// Returns the number of samples in the batch, 0 when the epoch is done,
// -1 on a decode error.
int ofa_loader_next(void* handle, float* hr, float* x2, float* x4) {
  auto* l = static_cast<ofa::Loader*>(handle);
  std::vector<ofa::Sample> samples;
  if (!l->pop(&samples)) return 0;
  const size_t hr_n = size_t(l->crop) * l->crop * 3;
  const size_t x2_n = hr_n / 4, x4_n = hr_n / 16;
  for (size_t i = 0; i < samples.size(); ++i) {
    if (!samples[i].ok || samples[i].hr.size() != hr_n) return -1;
    std::memcpy(hr + i * hr_n, samples[i].hr.data(), hr_n * sizeof(float));
    std::memcpy(x2 + i * x2_n, samples[i].x2.data(), x2_n * sizeof(float));
    std::memcpy(x4 + i * x4_n, samples[i].x4.data(), x4_n * sizeof(float));
  }
  return int(samples.size());
}

void ofa_loader_destroy(void* handle) {
  delete static_cast<ofa::Loader*>(handle);
}

}  // extern "C"
