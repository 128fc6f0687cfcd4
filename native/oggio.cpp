// Native Ogg/Vorbis ingestion for the jen1_tpu data loader.
//
// Together with wavio/flacio/mp3io this closes the compressed-corpus
// capability of the torch reference, which ingests anything
// torchaudio/ffmpeg decodes (reference dataset/dataloader.py:41,86).
//
// Strategy (same as mp3io.cpp): dlopen the system libvorbisfile at RUNTIME
// and decode through its stable C ABI — no dev headers or link-time
// dependency. The few struct fields read (vorbis_info head) have been
// ABI-frozen since libvorbis 1.0. OggVorbis_File itself is treated as an
// opaque caller-allocated buffer, overallocated well past its real size
// (~944 bytes on LP64; we hand the library 8 KiB).
//
// Exposed C ABI (mirrors wavio/flacio/mp3io):
//   jen1_ogg_available()                        -> 1 if decoder usable
//   jen1_ogg_info(path, *sr, *ch, *frames)      -> 0 on success
//   jen1_ogg_read(path, start, num, out)        -> frames written (>=0) or
//                                                  negative error; out is
//                                                  (num, ch) f32 interleaved,
//                                                  zero-padded past EOF.
//
// Sample accuracy: ov_pcm_seek uses the Ogg page granule positions —
// sample-exact by spec (Vorbis granulepos counts PCM frames), including
// initial-offset and end trimming.

#include <dlfcn.h>
#include <stdint.h>
#include <string.h>

#include <cstdlib>

namespace {

// head of struct vorbis_info (libvorbis, ABI-frozen since 1.0)
struct VorbisInfoHead {
  int version;
  int channels;
  long rate;
};

typedef void OggVorbis_File;  // opaque; caller allocates an oversized buffer
constexpr size_t kVfSize = 8192;

struct VorbisFileLib {
  void* dso = nullptr;
  int (*fopen)(const char*, OggVorbis_File*) = nullptr;
  int (*clear)(OggVorbis_File*) = nullptr;
  VorbisInfoHead* (*info)(OggVorbis_File*, int) = nullptr;
  int64_t (*pcm_total)(OggVorbis_File*, int) = nullptr;
  int (*pcm_seek)(OggVorbis_File*, int64_t) = nullptr;
  long (*read_float)(OggVorbis_File*, float***, int, int*) = nullptr;
  bool ok = false;
};

const VorbisFileLib& lib() {
  static VorbisFileLib m = [] {
    VorbisFileLib r;
    const char* names[] = {"libvorbisfile.so.3", "libvorbisfile.so"};
    for (const char* n : names) {
      // RTLD_GLOBAL not needed: libvorbisfile's DT_NEEDED pulls in
      // libvorbis/libogg itself.
      r.dso = dlopen(n, RTLD_NOW | RTLD_LOCAL);
      if (r.dso) break;
    }
    if (!r.dso) return r;
    r.fopen = (int (*)(const char*, OggVorbis_File*))dlsym(r.dso, "ov_fopen");
    r.clear = (int (*)(OggVorbis_File*))dlsym(r.dso, "ov_clear");
    r.info = (VorbisInfoHead * (*)(OggVorbis_File*, int))
        dlsym(r.dso, "ov_info");
    r.pcm_total = (int64_t(*)(OggVorbis_File*, int))dlsym(r.dso,
                                                          "ov_pcm_total");
    r.pcm_seek = (int (*)(OggVorbis_File*, int64_t))dlsym(r.dso,
                                                          "ov_pcm_seek");
    r.read_float = (long (*)(OggVorbis_File*, float***, int, int*))dlsym(
        r.dso, "ov_read_float");
    r.ok = r.fopen && r.clear && r.info && r.pcm_total && r.pcm_seek &&
           r.read_float;
    return r;
  }();
  return m;
}

struct Handle {
  unsigned char buf[kVfSize];
  bool opened = false;
  long rate = 0;
  int channels = 0;
  int64_t frames = 0;

  OggVorbis_File* vf() { return (OggVorbis_File*)buf; }
  ~Handle() {
    if (opened) lib().clear(vf());
  }
};

// Open + read stream info (whole-file logical stream, link -1). 0 on success.
int open_info(const char* path, Handle* h) {
  const VorbisFileLib& m = lib();
  if (!m.ok) return -100;  // libvorbisfile unavailable
  memset(h->buf, 0, sizeof(h->buf));
  if (m.fopen(path, h->vf()) != 0) return -102;
  h->opened = true;
  VorbisInfoHead* vi = m.info(h->vf(), -1);
  if (!vi || vi->channels <= 0 || vi->rate <= 0) return -104;
  h->rate = vi->rate;
  h->channels = vi->channels;
  h->frames = m.pcm_total(h->vf(), -1);
  if (h->frames < 0) h->frames = 0;  // unseekable/chained: report unknown
  return 0;
}

}  // namespace

extern "C" {

int jen1_ogg_available() { return lib().ok ? 1 : 0; }

int jen1_ogg_info(const char* path, int32_t* sr, int32_t* ch,
                  int64_t* frames) {
  Handle h;
  int rc = open_info(path, &h);
  if (rc != 0) return rc;
  *sr = (int32_t)h.rate;
  *ch = (int32_t)h.channels;
  *frames = h.frames;
  return 0;
}

// Decode `num` frames starting at `start` into out (num * channels floats,
// interleaved (num, channels) row-major). Frames past EOF are zero-filled.
// Returns the number of real (non-pad) frames written, or a negative error.
int64_t jen1_ogg_read(const char* path, int64_t start, int64_t num,
                      float* out) {
  const VorbisFileLib& m = lib();
  Handle h;
  int rc = open_info(path, &h);
  if (rc != 0) return rc;
  const int ch = h.channels;
  if (num < 0) return -106;
  memset(out, 0, (size_t)num * ch * sizeof(float));
  if (start < 0) start = 0;
  if (start >= h.frames || num == 0) return 0;
  if (m.pcm_seek(h.vf(), start) != 0) return -107;

  int64_t got = 0;
  int bitstream = 0;
  while (got < num) {
    float** pcm = nullptr;
    int want = (int)((num - got) > 4096 ? 4096 : (num - got));
    long n = m.read_float(h.vf(), &pcm, want, &bitstream);
    if (n == 0) break;  // EOF
    if (n < 0) return -109;  // hole/bad link in the stream
    // ov_read_float may switch logical bitstream links mid-read; a real
    // rate/channel change would corrupt interleaving, so reject it.
    VorbisInfoHead* vi = m.info(h.vf(), -1);
    if (!vi || vi->channels != ch || vi->rate != h.rate) return -108;
    for (int c = 0; c < ch; ++c) {
      const float* src = pcm[c];
      float* dst = out + (size_t)got * ch + c;
      for (long i = 0; i < n; ++i) dst[(size_t)i * ch] = src[i];
    }
    got += n;
  }
  return got;
}

}  // extern "C"
