// Native .klg log decoder.
//
// Role of the reference's RawLogReader (src/utils/RawLogReader.cpp:52-133):
// zlib depth inflation + JPEG colour decode, which dominate host-side CPU
// in offline replay. This implementation indexes the file once for random
// access and decodes batches of frames across a thread pool, feeding the
// batched TPU dispatch path without serialising with it.
//
// C ABI (consumed from Python via ctypes — no pybind11 in this image):
//   klg_open(path, w, h) -> handle (NULL on error)
//   klg_num_frames(handle)
//   klg_timestamps(handle, int64* out)
//   klg_decode_batch(handle, start, count, uint16* depth, uint8* rgb,
//                    int64* timestamps, int threads) -> frames decoded
//   klg_close(handle)
//
// Build: make -C native   (links -lz -ljpeg)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <zlib.h>

namespace {

struct FrameIndex {
  int64_t timestamp;
  long depth_off;
  int32_t depth_size;
  long rgb_off;
  int32_t rgb_size;
};

struct KlgFile {
  FILE* f = nullptr;
  int width = 0;
  int height = 0;
  std::vector<FrameIndex> index;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG buffer to tightly-packed RGB; returns false on failure.
bool decode_jpeg(const uint8_t* buf, size_t len, uint8_t* out, int w, int h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != w || (int)cinfo.output_height != h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

extern "C" {

void* klg_open(const char* path, int width, int height) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  int32_t n = 0;
  if (std::fread(&n, 4, 1, f) != 1) {
    std::fclose(f);
    return nullptr;
  }
  KlgFile* k = new KlgFile;
  k->f = f;
  k->width = width;
  k->height = height;
  k->index.reserve(n > 0 ? n : 0);
  for (int32_t i = 0; i < n; ++i) {
    FrameIndex fi;
    int32_t sizes[2];
    if (std::fread(&fi.timestamp, 8, 1, f) != 1) break;
    if (std::fread(sizes, 4, 2, f) != 2) break;
    fi.depth_size = sizes[0];
    fi.rgb_size = sizes[1];
    fi.depth_off = std::ftell(f);
    fi.rgb_off = fi.depth_off + fi.depth_size;
    if (std::fseek(f, fi.depth_size + fi.rgb_size, SEEK_CUR) != 0) break;
    k->index.push_back(fi);
  }
  return k;
}

int klg_num_frames(void* handle) {
  return handle ? (int)static_cast<KlgFile*>(handle)->index.size() : 0;
}

void klg_timestamps(void* handle, int64_t* out) {
  KlgFile* k = static_cast<KlgFile*>(handle);
  for (size_t i = 0; i < k->index.size(); ++i) out[i] = k->index[i].timestamp;
}

// Decodes frames [start, start+count) into caller buffers:
//   depth: count*h*w uint16 (mm), rgb: count*h*w*3 uint8.
// Returns the number of frames decoded (short at EOF / on error).
int klg_decode_batch(void* handle, int start, int count, uint16_t* depth,
                     uint8_t* rgb, int64_t* timestamps, int threads) {
  KlgFile* k = static_cast<KlgFile*>(handle);
  if (!k) return 0;
  const int total = (int)k->index.size();
  if (start < 0 || start >= total) return 0;
  count = std::min(count, total - start);
  const size_t npx = size_t(k->width) * k->height;

  // serial file reads (cheap), parallel decode (expensive)
  std::vector<std::vector<uint8_t>> dbufs(count), cbufs(count);
  for (int i = 0; i < count; ++i) {
    const FrameIndex& fi = k->index[start + i];
    timestamps[i] = fi.timestamp;
    dbufs[i].resize(fi.depth_size);
    std::fseek(k->f, fi.depth_off, SEEK_SET);
    if (std::fread(dbufs[i].data(), 1, fi.depth_size, k->f) !=
        (size_t)fi.depth_size)
      return i;
    if (fi.rgb_size > 0) {
      cbufs[i].resize(fi.rgb_size);
      if (std::fread(cbufs[i].data(), 1, fi.rgb_size, k->f) !=
          (size_t)fi.rgb_size)
        return i;
    }
  }

  if (threads < 1) threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> ok(count, 1);
  auto work = [&](int tid) {
    for (int i = tid; i < count; i += threads) {
      uint16_t* dout = depth + size_t(i) * npx;
      uLongf dlen = npx * 2;
      if (uncompress(reinterpret_cast<Bytef*>(dout), &dlen, dbufs[i].data(),
                     dbufs[i].size()) != Z_OK ||
          dlen != npx * 2) {
        std::memset(dout, 0, npx * 2);
        ok[i] = 0;
      }
      uint8_t* cout = rgb + size_t(i) * npx * 3;
      if (!cbufs[i].empty()) {
        if (!decode_jpeg(cbufs[i].data(), cbufs[i].size(), cout, k->width,
                         k->height))
          std::memset(cout, 0, npx * 3);
      } else {
        std::memset(cout, 0, npx * 3);
      }
    }
  };
  for (int t = 0; t < threads; ++t) pool.emplace_back(work, t);
  for (auto& t : pool) t.join();
  return count;
}

void klg_close(void* handle) {
  KlgFile* k = static_cast<KlgFile*>(handle);
  if (k) {
    if (k->f) std::fclose(k->f);
    delete k;
  }
}

}  // extern "C"
