// vslam_io — native dataset runtime: PNG decode + threaded prefetch queue.
//
// TPU-native equivalent of the reference's C++ IO runtime: the rosbag2
// replayer thread (src/ros/nodes/NodeReplayer.cpp:98-122), the mutexed
// timestamp-pairing Queue (src/ros/Queue.cpp) and cv_bridge/OpenCV image
// decoding collapse into one self-contained shared library: worker threads
// decode (rgb, depth) PNG pairs ahead of the consumer into a bounded ring
// buffer; the Python pipeline pops frames in order while the TPU crunches
// the previous one. Zero third-party dependencies beyond zlib.
//
// PNG support: 8-bit grayscale / RGB / RGBA (converted to float32 luma,
// Rec.601 like the reference's IMREAD_GRAYSCALE path, utils.cpp:43-58) and
// 16-bit grayscale (TUM depth maps, scaled by a caller-provided factor —
// 1/5000 m for TUM). Interlaced PNGs are not supported (none in TUM/KITTI).
//
// C ABI (ctypes-friendly):
//   void* vslam_loader_open(const char** rgb, const char** depth, int n,
//                           int n_threads, int capacity, float depth_scale);
//   int   vslam_loader_next(void* h, float* gray, float* depth,
//                           int* height, int* width);   // 0 ok, <0 eof/err
//   void  vslam_loader_close(void* h);
//   int   vslam_decode_png_f32(const char* path, float* out, int* h, int* w,
//                              int max_pixels, float scale16);  // standalone
//
// Raw-transport variants (native sensor dtypes, for the pipeline's u8/u16
// host->device staging — the device converts, the link moves 4x less):
//   void* vslam_loader_open_raw(const char** rgb, const char** depth, int n,
//                               int n_threads, int capacity);
//   int   vslam_loader_next_raw(void* h, uint8_t* gray, uint16_t* depth,
//                               int* height, int* width, int max_pixels);

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<float> data;     // f32 mode
  std::vector<uint8_t> u8;     // raw mode, 8-bit gray (Rec.601 luma)
  std::vector<uint16_t> u16;   // raw mode, 16-bit gray (depth counts)
  bool ok = false;
  bool is16 = false;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an 8/16-bit gray or 8-bit RGB(A) PNG. f32 mode (raw=false):
// `scale16` multiplies 16-bit samples (depth-map scaling); 8-bit images come
// out in [0, 255] (luma for color). Raw mode (raw=true): native dtypes —
// u8 gray (Rec.601 rounded, matching cv::IMREAD_GRAYSCALE) or u16 counts.
Image decode_png(const std::string& path, float scale16, bool raw_mode = false) {
  Image img;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return img;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != size_t(size)) {
    fclose(f);
    return img;
  }
  fclose(f);

  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (size < 8 || memcmp(buf.data(), magic, 8) != 0) return img;

  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 8 <= size_t(size)) {
    uint32_t len = be32(&buf[pos]);
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > size_t(size)) break;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = be32(data);
      h = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w <= 0 || h <= 0 || interlace != 0) return img;

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return img;          // palette unsupported
  }
  if (bit_depth != 8 && !(bit_depth == 16 && color_type == 0)) return img;

  const int bypp = channels * bit_depth / 8;   // bytes per pixel
  const size_t stride = size_t(w) * bypp;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return img;

  // undo per-scanline filters in place into `pix`
  std::vector<uint8_t> pix(stride * h);
  for (int y = 0; y < h; y++) {
    const uint8_t* src = &raw[size_t(y) * (stride + 1)];
    uint8_t filter = src[0];
    src++;
    uint8_t* dst = &pix[size_t(y) * stride];
    const uint8_t* up = y > 0 ? &pix[size_t(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= size_t(bypp) ? dst[x - bypp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bypp)) ? up[x - bypp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return img;
      }
      dst[x] = uint8_t(v);
    }
  }

  img.h = h;
  img.w = w;
  const size_t npx = size_t(w) * h;
  if (raw_mode) {
    if (bit_depth == 16) {  // 16-bit gray (TUM depth counts, host-endian)
      img.is16 = true;
      img.u16.resize(npx);
      for (size_t i = 0; i < npx; i++)
        img.u16[i] = (uint16_t(pix[2 * i]) << 8) | pix[2 * i + 1];
    } else if (channels == 1) {
      img.u8.assign(pix.begin(), pix.end());
    } else {  // color -> Rec.601 luma rounded to u8 (IMREAD_GRAYSCALE)
      img.u8.resize(npx);
      for (size_t i = 0; i < npx; i++) {
        const uint8_t* p = &pix[i * bypp];
        float y = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
        img.u8[i] = uint8_t(y + 0.5f);
      }
    }
    img.ok = true;
    return img;
  }
  img.data.resize(npx);
  if (bit_depth == 16) {  // 16-bit gray (TUM depth)
    for (size_t i = 0; i < img.data.size(); i++) {
      uint16_t v = (uint16_t(pix[2 * i]) << 8) | pix[2 * i + 1];  // big-endian
      img.data[i] = float(v) * scale16;
    }
  } else if (channels == 1) {
    for (size_t i = 0; i < img.data.size(); i++) img.data[i] = float(pix[i]);
  } else {  // color -> Rec.601 luma, alpha ignored
    for (size_t i = 0; i < img.data.size(); i++) {
      const uint8_t* p = &pix[i * bypp];
      img.data[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    }
  }
  img.ok = true;
  return img;
}

struct Frame {
  long index = -1;
  Image gray, depth;
};

// Bounded prefetch queue: N workers decode pairs in index order; the
// consumer pops strictly in order (deterministic like the reference's
// lock-step replayer).
struct Loader {
  std::vector<std::string> rgb_paths, depth_paths;
  float depth_scale = 1.0f;
  bool raw = false;  // native-dtype mode: u8 gray + u16 depth counts
  size_t capacity = 8;

  std::mutex mu;
  std::condition_variable cv_full, cv_ready;
  std::deque<Frame> ready;
  std::atomic<long> next_to_fetch{0};
  long next_to_emit = 0;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    while (!stop.load()) {
      long idx = next_to_fetch.fetch_add(1);
      if (idx >= long(rgb_paths.size())) return;
      Frame fr;
      fr.index = idx;
      fr.gray = decode_png(rgb_paths[idx], 1.0f, raw);
      fr.depth = decode_png(depth_paths[idx], depth_scale, raw);
      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [&] {
        return stop.load() || ready.size() < capacity ||
               fr.index == next_to_emit;
      });
      if (stop.load()) return;
      ready.push_back(std::move(fr));
      cv_ready.notify_all();
    }
  }

  bool next(Frame* out) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_to_emit >= long(rgb_paths.size())) return false;
    cv_ready.wait(lk, [&] {
      if (stop.load()) return true;
      for (auto& fr : ready)
        if (fr.index == next_to_emit) return true;
      return false;
    });
    if (stop.load()) return false;
    for (auto it = ready.begin(); it != ready.end(); ++it) {
      if (it->index == next_to_emit) {
        *out = std::move(*it);
        ready.erase(it);
        next_to_emit++;
        cv_full.notify_all();
        return true;
      }
    }
    return false;
  }

  ~Loader() {
    stop.store(true);
    cv_full.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

}  // namespace

extern "C" {

void* vslam_loader_open(const char** rgb, const char** depth, int n,
                        int n_threads, int capacity, float depth_scale) {
  auto* l = new Loader();
  l->rgb_paths.assign(rgb, rgb + n);
  l->depth_paths.assign(depth, depth + n);
  l->depth_scale = depth_scale;
  l->capacity = capacity > 0 ? capacity : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; i++) l->workers.emplace_back(&Loader::worker, l);
  return l;
}

// Copies the next frame into caller buffers (each sized max_pixels floats).
// Returns 0 on success, -1 at end of stream, -2 on decode failure, -3 if a
// buffer is too small. height/width report the gray image geometry.
int vslam_loader_next(void* h, float* gray, float* depth, int* height,
                      int* width, int max_pixels) {
  auto* l = static_cast<Loader*>(h);
  Frame fr;
  if (!l->next(&fr)) return -1;
  if (!fr.gray.ok || !fr.depth.ok) return -2;
  if (fr.gray.h * fr.gray.w > max_pixels ||
      fr.depth.h * fr.depth.w > max_pixels)
    return -3;
  memcpy(gray, fr.gray.data.data(), fr.gray.data.size() * sizeof(float));
  memcpy(depth, fr.depth.data.data(), fr.depth.data.size() * sizeof(float));
  *height = fr.gray.h;
  *width = fr.gray.w;
  return 0;
}

void vslam_loader_close(void* h) { delete static_cast<Loader*>(h); }

void* vslam_loader_open_raw(const char** rgb, const char** depth, int n,
                            int n_threads, int capacity) {
  auto* l = new Loader();
  l->rgb_paths.assign(rgb, rgb + n);
  l->depth_paths.assign(depth, depth + n);
  l->raw = true;
  l->capacity = capacity > 0 ? capacity : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; i++) l->workers.emplace_back(&Loader::worker, l);
  return l;
}

// Raw-transport pop: u8 gray + u16 depth counts (native PNG dtypes).
// Returns 0 ok, -1 eof, -2 decode failure, -3 buffer too small, -4 if the
// depth image was not 16-bit (raw mode expects TUM-style u16 depth).
int vslam_loader_next_raw(void* h, uint8_t* gray, uint16_t* depth,
                          int* height, int* width, int max_pixels) {
  auto* l = static_cast<Loader*>(h);
  Frame fr;
  if (!l->next(&fr)) return -1;
  if (!fr.gray.ok || !fr.depth.ok) return -2;
  if (fr.gray.h * fr.gray.w > max_pixels ||
      fr.depth.h * fr.depth.w > max_pixels)
    return -3;
  if (fr.gray.is16 || !fr.depth.is16) return -4;
  memcpy(gray, fr.gray.u8.data(), fr.gray.u8.size());
  memcpy(depth, fr.depth.u16.data(), fr.depth.u16.size() * sizeof(uint16_t));
  *height = fr.gray.h;
  *width = fr.gray.w;
  return 0;
}

int vslam_decode_png_f32(const char* path, float* out, int* h, int* w,
                         int max_pixels, float scale16) {
  Image img = decode_png(path, scale16);
  if (!img.ok) return -2;
  if (img.h * img.w > max_pixels) return -3;
  memcpy(out, img.data.data(), img.data.size() * sizeof(float));
  *h = img.h;
  *w = img.w;
  return 0;
}

}  // extern "C"
