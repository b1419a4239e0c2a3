// vstvideo — native MJPG/AVI demux + thread-pool JPEG decode.
//
// The streaming inference path (ReCoNet/utilities.py:179-236 use case) is
// host-decode-bound at high fps: OpenCV's VideoCapture decodes MJPG frames
// one at a time on one thread.  This library parses the AVI (RIFF) container
// directly, indexes every video frame chunk, and decodes batches of JPEG
// frames across a thread pool with libjpeg — each worker pread()s its own
// chunk, so decode scales with cores and overlaps the TPU compute drain.
// Exposed through ctypes (vst_tpu/data/video_native.py) with a cv2 fallback.
//
// Build:  make -C native   (produces libvstvideo.so; skipped when
//         jpeglib.h is absent)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <memory>
#include <mutex>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>

namespace {

struct FrameRef {
  int64_t offset;
  int64_t size;
};

struct Video {
  int fd = -1;
  int64_t height = 0;
  int64_t width = 0;
  std::vector<FrameRef> frames;
  ~Video() {
    if (fd >= 0) ::close(fd);
  }
};

// shared_ptr so vstvideo_close during an in-flight vstvideo_read_batch
// (e.g. Python __del__ on another thread) defers destruction until the
// last reader drops its reference instead of use-after-free.
std::mutex g_mu;
std::unordered_map<int64_t, std::shared_ptr<Video>> g_videos;
int64_t g_next_handle = 1;

bool read_at(int fd, int64_t off, void* buf, int64_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::pread(fd, p, static_cast<size_t>(n), off);
    if (r <= 0) return false;
    p += r;
    off += r;
    n -= r;
  }
  return true;
}

uint32_t le32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

// Walk a RIFF chunk range, collecting stream-0 video frame chunks
// ('00dc'/'00db') from 'movi' lists.  AVI chunks are 2-byte aligned.
bool parse_chunks(int fd, int64_t begin, int64_t end,
                  std::vector<FrameRef>* frames) {
  int64_t pos = begin;
  uint8_t hdr[12];
  while (pos + 8 <= end) {
    if (!read_at(fd, pos, hdr, 8)) return false;
    const uint32_t size = le32(hdr + 4);
    if (std::memcmp(hdr, "LIST", 4) == 0 || std::memcmp(hdr, "RIFF", 4) == 0) {
      if (pos + 12 > end || !read_at(fd, pos + 8, hdr + 8, 4)) return false;
      // recurse into every list; only movi lists contain frame chunks but
      // hdrl recursion is harmless and keeps the parser trivial
      if (!parse_chunks(fd, pos + 12,
                        std::min<int64_t>(end, pos + 8 + size), frames))
        return false;
    } else if ((std::memcmp(hdr, "00dc", 4) == 0 ||
                std::memcmp(hdr, "00db", 4) == 0) &&
               size > 0) {
      if (pos + 8 + static_cast<int64_t>(size) > end)
        return false;  // truncated payload (partial copy): not a frame
      frames->push_back({pos + 8, static_cast<int64_t>(size)});
    }
    pos += 8 + size + (size & 1);
  }
  return true;
}

// ------------------------------------------------------------------ libjpeg

struct JpegError {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegError*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

void jpeg_silent_emit(j_common_ptr, int) {}

// JPEG Annex K standard Huffman tables: MJPG frames commonly omit DHT
// segments (the tables are implied); libjpeg then needs them installed by
// hand, exactly as OpenCV/ffmpeg do internally.
void set_huff(j_decompress_ptr cinfo, JHUFF_TBL** tblptr,
              const uint8_t* bits, const uint8_t* vals, int nvals) {
  if (*tblptr == nullptr)
    *tblptr = jpeg_alloc_huff_table(reinterpret_cast<j_common_ptr>(cinfo));
  std::memcpy((*tblptr)->bits, bits, 17);
  std::memcpy((*tblptr)->huffval, vals, nvals);
}

void ensure_huff_tables(j_decompress_ptr c) {
  static const uint8_t dc_lum_bits[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1,
                                          1, 0, 0, 0, 0, 0, 0, 0};
  static const uint8_t dc_lum_val[] = {0, 1, 2, 3, 4,  5,
                                       6, 7, 8, 9, 10, 11};
  static const uint8_t dc_chr_bits[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1,
                                          1, 1, 1, 0, 0, 0, 0, 0};
  static const uint8_t dc_chr_val[] = {0, 1, 2, 3, 4,  5,
                                       6, 7, 8, 9, 10, 11};
  static const uint8_t ac_lum_bits[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3,
                                          5, 5, 4, 4, 0, 0, 1, 0x7d};
  static const uint8_t ac_lum_val[] = {
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};
  static const uint8_t ac_chr_bits[17] = {0, 0, 2, 1, 2, 4, 4, 3, 4,
                                          7, 5, 4, 4, 0, 1, 2, 0x77};
  static const uint8_t ac_chr_val[] = {
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
      0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
      0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
      0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
      0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
      0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};
  if (c->dc_huff_tbl_ptrs[0] == nullptr || c->ac_huff_tbl_ptrs[0] == nullptr) {
    set_huff(c, &c->dc_huff_tbl_ptrs[0], dc_lum_bits, dc_lum_val,
             sizeof(dc_lum_val));
    set_huff(c, &c->dc_huff_tbl_ptrs[1], dc_chr_bits, dc_chr_val,
             sizeof(dc_chr_val));
    set_huff(c, &c->ac_huff_tbl_ptrs[0], ac_lum_bits, ac_lum_val,
             sizeof(ac_lum_val));
    set_huff(c, &c->ac_huff_tbl_ptrs[1], ac_chr_bits, ac_chr_val,
             sizeof(ac_chr_val));
  }
}

// Decode one JPEG blob to tightly-packed RGB rows.  When h/w are zero they
// are treated as "discover" (header-only probing fills them in).
int decode_jpeg(const uint8_t* data, int64_t size, uint8_t* out, int64_t* h,
                int64_t* w, bool header_only) {
  jpeg_decompress_struct cinfo;
  JpegError err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = jpeg_error_exit;
  err.pub.emit_message = jpeg_silent_emit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  if (header_only) {
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  ensure_huff_tables(&cinfo);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int64_t>(cinfo.output_height) != *h ||
      static_cast<int64_t>(cinfo.output_width) != *w ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<int64_t>(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

// Open an MJPG AVI: index every frame chunk, probe dimensions from the first
// frame's JPEG header.  Returns a handle (>0) or a negative error code.
int64_t vstvideo_open(const char* path, int64_t* n_frames, int64_t* height,
                      int64_t* width) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  uint8_t hdr[12];
  if (!read_at(fd, 0, hdr, 12) || std::memcmp(hdr, "RIFF", 4) != 0 ||
      std::memcmp(hdr + 8, "AVI ", 4) != 0) {
    ::close(fd);
    return -2;
  }
  struct stat st;
  const int64_t file_size = (::fstat(fd, &st) == 0) ? st.st_size : INT64_MAX;
  auto video = std::make_shared<Video>();
  video->fd = fd;
  const int64_t riff_end =
      std::min<int64_t>(8 + le32(hdr + 4), file_size);
  bool ok = parse_chunks(fd, 12, riff_end, &video->frames);
  // Files over ~1 GB (ffmpeg/OpenCV writers) continue as OpenDML
  // 'RIFF....AVIX' extension segments after the first RIFF; their movi
  // lists hold the remaining frames.  Walk segments until EOF.
  int64_t pos = riff_end + (riff_end & 1);
  while (ok && pos + 12 <= file_size) {
    if (!read_at(fd, pos, hdr, 12) || std::memcmp(hdr, "RIFF", 4) != 0 ||
        std::memcmp(hdr + 8, "AVIX", 4) != 0)
      break;  // trailing junk is not an error; stop indexing here
    const int64_t seg_end =
        std::min<int64_t>(pos + 8 + le32(hdr + 4), file_size);
    if (!parse_chunks(fd, pos + 12, seg_end, &video->frames)) {
      // truncated/corrupt EXTENSION segment (partial copy, killed
      // writer): every frame indexed up to the bad chunk parsed fully —
      // serve those rather than rejecting the whole file.
      break;
    }
    pos = seg_end + (seg_end & 1);
  }
  // A truncated MAIN segment (partial copy, killed writer) gets the same
  // treatment as a truncated AVIX extension: every frame indexed before
  // the bad chunk parsed fully — serve that prefix rather than rejecting
  // a file whose complete frames are readable.  (When !ok the AVIX scan
  // above was skipped: damage mid-segment makes later offsets garbage.)
  if (video->frames.empty()) return -3;  // shared_ptr closes fd
  std::vector<uint8_t> first(video->frames[0].size);
  if (!read_at(fd, video->frames[0].offset, first.data(), first.size()))
    return -4;
  if (decode_jpeg(first.data(), first.size(), nullptr, &video->height,
                  &video->width, /*header_only=*/true) != 0)
    return -5;
  *n_frames = static_cast<int64_t>(video->frames.size());
  *height = video->height;
  *width = video->width;
  std::lock_guard<std::mutex> lock(g_mu);
  const int64_t handle = g_next_handle++;
  g_videos[handle] = video;
  return handle;
}

// Decode frames [start, start+count) into out (count, H, W, 3) RGB uint8,
// fanned across num_threads workers.  Returns 0 on success.
int vstvideo_read_batch(int64_t handle, int64_t start, int64_t count,
                        uint8_t* out, int num_threads) {
  std::shared_ptr<Video> video;  // keeps the fd alive across a racing close
  {
    std::lock_guard<std::mutex> lock(g_mu);
    auto it = g_videos.find(handle);
    if (it == g_videos.end()) return 1;
    video = it->second;
  }
  if (start < 0 || count < 0 ||
      start + count > static_cast<int64_t>(video->frames.size()))
    return 2;
  const int64_t frame_bytes = video->height * video->width * 3;
  std::atomic<int64_t> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    std::vector<uint8_t> buf;
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= count || failed.load()) return;
      const FrameRef& ref = video->frames[start + i];
      buf.resize(ref.size);
      int64_t h = video->height, w = video->width;
      if (!read_at(video->fd, ref.offset, buf.data(), ref.size) ||
          decode_jpeg(buf.data(), ref.size, out + i * frame_bytes, &h, &w,
                      false) != 0) {
        failed.store(1);
        return;
      }
    }
  };
  const int n = std::max(1, std::min<int>(num_threads,
                                          static_cast<int>(count)));
  std::vector<std::thread> pool;
  pool.reserve(n);
  for (int i = 0; i < n; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failed.load() ? 3 : 0;
}

void vstvideo_close(int64_t handle) {
  std::shared_ptr<Video> victim;  // destroy outside the lock
  std::lock_guard<std::mutex> lock(g_mu);
  auto it = g_videos.find(handle);
  if (it != g_videos.end()) {
    victim = std::move(it->second);
    g_videos.erase(it);
  }
}

}  // extern "C"
