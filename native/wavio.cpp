// jen1_tpu native audio I/O: fast PCM WAV decode + batched window loader.
//
// The reference's data path decodes audio in Python workers through
// torchaudio (dataset/dataloader.py:86); this library is the framework's
// native-runtime equivalent: zero-copy chunk decode straight into
// caller-provided float32 buffers (which the Python side hands to
// jax.device_put), plus a multi-window batch fill so one FFI call per batch
// replaces per-item Python work on the single-core host.
//
// Formats: RIFF/WAVE, PCM 8/16/24/32-bit int and 32-bit float, arbitrary
// channel counts. Resampling stays in Python (linear interp on the
// decimated window only).
//
// Build: g++ -O3 -shared -fPIC -o libjen1wavio.so wavio.cpp
// ABI: plain C, used from Python via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  uint16_t format = 0;  // 1 = PCM int, 3 = IEEE float
  uint64_t data_offset = 0;
  uint64_t num_frames = 0;
};

bool read_header(FILE* f, WavInfo* info) {
  char tag[4];
  uint32_t size;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4) != 0) return false;
  if (fread(&size, 4, 1, f) != 1) return false;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (fread(tag, 1, 4, f) == 4 && fread(&size, 4, 1, f) == 1) {
    if (memcmp(tag, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t take = size < sizeof(buf) ? size : sizeof(buf);
      if (fread(buf, 1, take, f) != take) return false;
      if (size > take && fseek(f, size - take, SEEK_CUR) != 0) return false;
      info->format = *reinterpret_cast<uint16_t*>(buf + 0);
      info->channels = *reinterpret_cast<uint16_t*>(buf + 2);
      info->sample_rate = *reinterpret_cast<uint32_t*>(buf + 4);
      info->bits = *reinterpret_cast<uint16_t*>(buf + 14);
      if (info->format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        info->format = *reinterpret_cast<uint16_t*>(buf + 24);
      }
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      info->data_offset = static_cast<uint64_t>(ftell(f));
      uint32_t bytes_per_frame = info->channels * (info->bits / 8);
      if (!have_fmt || bytes_per_frame == 0) return false;
      info->num_frames = size / bytes_per_frame;
      return true;
    } else {
      if (fseek(f, (size + 1) & ~1u, SEEK_CUR) != 0) return false;
    }
  }
  return false;
}

inline float decode_sample(const uint8_t* p, uint16_t bits, uint16_t format) {
  if (format == 3 && bits == 32) {
    float v;
    memcpy(&v, p, 4);
    return v;
  }
  switch (bits) {
    case 16: {
      int16_t v;
      memcpy(&v, p, 2);
      return static_cast<float>(v) / 32768.0f;
    }
    case 24: {
      int32_t v = (p[0] | (p[1] << 8) | (p[2] << 16));
      if (v & 0x800000) v -= 0x1000000;
      return static_cast<float>(v) / 8388608.0f;
    }
    case 32: {
      int32_t v;
      memcpy(&v, p, 4);
      return static_cast<float>(v) / 2147483648.0f;
    }
    case 8:
      return (static_cast<float>(*p) - 128.0f) / 128.0f;
    default:
      return 0.0f;
  }
}

}  // namespace

extern "C" {

// Probe: returns 0 on success; fills sr/channels/frames.
int jen1_wav_info(const char* path, int32_t* sample_rate, int32_t* channels,
                  int64_t* num_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = read_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *sample_rate = static_cast<int32_t>(info.sample_rate);
  *channels = static_cast<int32_t>(info.channels);
  *num_frames = static_cast<int64_t>(info.num_frames);
  return 0;
}

// Decode [start_frame, start_frame + out_frames) into out (frames x channels,
// float32, row-major). Frames past EOF are zero-filled. Returns frames read
// from the file, or < 0 on error.
int64_t jen1_wav_read(const char* path, int64_t start_frame,
                      int64_t out_frames, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!read_header(f, &info)) {
    fclose(f);
    return -2;
  }
  const uint32_t bpf = info.channels * (info.bits / 8);
  if (start_frame > static_cast<int64_t>(info.num_frames))
    start_frame = static_cast<int64_t>(info.num_frames);
  int64_t avail = static_cast<int64_t>(info.num_frames) - start_frame;
  int64_t todo = out_frames < avail ? out_frames : avail;
  if (todo < 0) todo = 0;

  memset(out, 0, sizeof(float) * out_frames * info.channels);
  if (todo > 0) {
    if (fseek(f, static_cast<long>(info.data_offset + start_frame * bpf),
              SEEK_SET) != 0) {
      fclose(f);
      return -3;
    }
    const int64_t CHUNK = 1 << 16;  // frames per read
    uint8_t* buf = new uint8_t[CHUNK * bpf];
    int64_t done = 0;
    const uint32_t step = info.bits / 8;
    while (done < todo) {
      int64_t n = todo - done < CHUNK ? todo - done : CHUNK;
      if (fread(buf, bpf, n, f) != static_cast<size_t>(n)) break;
      float* dst = out + done * info.channels;
      const uint8_t* src = buf;
      for (int64_t i = 0; i < n * info.channels; ++i) {
        dst[i] = decode_sample(src, info.bits, info.format);
        src += step;
      }
      done += n;
    }
    delete[] buf;
    todo = done;
  }
  fclose(f);
  return todo;
}

// Batch fill: decode `batch` windows (possibly from different files) into one
// contiguous (batch x frames x channels) float32 buffer. paths is an array of
// C strings; starts is per-window start frame. Returns 0 on success, else the
// (negative) error of the first failing window minus 100*index.
int64_t jen1_wav_read_batch(const char** paths, const int64_t* starts,
                            int64_t frames, int32_t channels, int64_t batch,
                            float* out) {
  for (int64_t b = 0; b < batch; ++b) {
    int64_t r = jen1_wav_read(paths[b], starts[b], frames,
                              out + b * frames * channels);
    if (r < 0) return r - 100 * b;
  }
  return 0;
}

}  // extern "C"
