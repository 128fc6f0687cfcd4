// jen1_tpu native audio I/O: from-scratch FLAC decoder.
//
// Closes the multi-format ingestion gap vs the reference, which decodes
// anything torchaudio/ffmpeg handles inside Python workers
// (dataset/dataloader.py:41,86): lossless music corpora are shipped as FLAC
// at least as often as WAV, and this image has no soundfile/ffmpeg, so the
// framework decodes FLAC natively. Same plain-C ABI + windowed-read contract
// as wavio.cpp (ctypes binding in jen1_tpu/data/native_io.py).
//
// Coverage (FLAC format, RFC 9639): STREAMINFO + all metadata blocks,
// fixed & variable blocking, subframes CONSTANT / VERBATIM / FIXED(0-4) /
// LPC(1-32), Rice + Rice2 partitioned residuals incl. escape partitions,
// wasted bits, stereo decorrelation left/side right/side mid/side,
// 8/12/16/20/24/32-bit samples. CRCs are not verified (trusted local
// corpora; resync is not needed for sequential decode).
//
// Windowed reads decode sequentially from the first frame and skip output
// until start_frame (frames are not byte-addressable without decoding;
// SEEKTABLE granularity doesn't pay off at dataset window sizes).
//
// Build: g++ -O3 -shared -fPIC -o libjen1flacio.so flacio.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <vector>

namespace {

struct BitReader {
  FILE* f;
  uint64_t bitbuf = 0;  // holds up to 57 bits, MSB-aligned semantics below
  int nbits = 0;        // valid low bits in bitbuf
  bool eof = false;

  explicit BitReader(FILE* file) : f(file) {}

  bool fill() {
    int c = fgetc(f);
    if (c == EOF) {
      eof = true;
      return false;
    }
    bitbuf = (bitbuf << 8) | static_cast<uint8_t>(c);
    nbits += 8;
    return true;
  }

  // Read n (<= 32) bits MSB-first as unsigned.
  uint32_t read(int n) {
    while (nbits < n) {
      if (!fill()) return 0;
    }
    nbits -= n;
    uint32_t v = static_cast<uint32_t>((bitbuf >> nbits) &
                                       ((n == 32) ? 0xFFFFFFFFull
                                                  : ((1ull << n) - 1)));
    return v;
  }

  int32_t read_signed(int n) {
    uint32_t v = read(n);
    if (n < 32 && (v & (1u << (n - 1)))) {
      return static_cast<int32_t>(v) - (1 << n);
    }
    return static_cast<int32_t>(v);
  }

  // Count 0 bits until the terminating 1 bit (FLAC unary).
  uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      while (nbits > 0) {
        int bit = (bitbuf >> (nbits - 1)) & 1;
        --nbits;
        if (bit) return q;
        ++q;
      }
      if (!fill()) return q;
    }
  }

  void align() { nbits -= nbits % 8; }
};

struct FlacInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits = 0;
  uint64_t total_samples = 0;
  long first_frame_offset = 0;
};

bool read_streaminfo(FILE* f, FlacInfo* info) {
  char magic[4];
  if (fread(magic, 1, 4, f) != 4 || memcmp(magic, "fLaC", 4) != 0)
    return false;
  bool have_si = false;
  for (;;) {
    uint8_t hdr[4];
    if (fread(hdr, 1, 4, f) != 4) return false;
    bool last = hdr[0] & 0x80;
    int type = hdr[0] & 0x7F;
    uint32_t len = (hdr[1] << 16) | (hdr[2] << 8) | hdr[3];
    if (type == 0) {  // STREAMINFO
      uint8_t b[34];
      if (len < 34 || fread(b, 1, 34, f) != 34) return false;
      if (len > 34 && fseek(f, len - 34, SEEK_CUR) != 0) return false;
      info->sample_rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4);
      info->channels = ((b[12] >> 1) & 0x7) + 1;
      info->bits = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
      info->total_samples = (static_cast<uint64_t>(b[13] & 0xF) << 32) |
                            (static_cast<uint64_t>(b[14]) << 24) |
                            (b[15] << 16) | (b[16] << 8) | b[17];
      have_si = true;
    } else {
      if (fseek(f, len, SEEK_CUR) != 0) return false;
    }
    if (last) break;
  }
  info->first_frame_offset = ftell(f);
  return have_si && info->sample_rate > 0;
}

// Decodes one partitioned-Rice residual section into res[0..blocksize-order).
bool read_residual(BitReader* br, uint32_t blocksize, uint32_t order,
                   int32_t* res) {
  uint32_t method = br->read(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = br->read(4);
  uint32_t partitions = 1u << porder;
  if (blocksize % partitions != 0) return false;
  uint32_t psize = blocksize >> porder;
  if (psize <= order && partitions == 1) return false;
  uint32_t idx = 0;
  for (uint32_t p = 0; p < partitions; ++p) {
    uint32_t count = psize - (p == 0 ? order : 0);
    uint32_t param = br->read(plen);
    if (param == escape) {
      int raw = static_cast<int>(br->read(5));
      for (uint32_t i = 0; i < count; ++i)
        res[idx++] = raw == 0 ? 0 : br->read_signed(raw);
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q = br->read_unary();
        uint32_t low = param == 0 ? 0 : br->read(param);
        uint32_t v = (q << param) | low;
        res[idx++] = static_cast<int32_t>((v >> 1) ^ (~(v & 1) + 1));
      }
    }
    if (br->eof) return false;
  }
  return true;
}

bool read_subframe(BitReader* br, uint32_t blocksize, int bps,
                   int64_t* out) {
  if (br->read(1) != 0) return false;  // reserved padding bit
  uint32_t type = br->read(6);
  int wasted = 0;
  if (br->read(1)) wasted = static_cast<int>(br->read_unary()) + 1;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  std::vector<int32_t> res(blocksize);
  if (type == 0) {  // CONSTANT
    int64_t v = bps == 33 ? (static_cast<int64_t>(br->read_signed(1)) << 32) |
                                br->read(32)
                          : br->read_signed(bps);
    for (uint32_t i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < blocksize; ++i) out[i] = br->read_signed(bps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    uint32_t order = type & 0x07;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) out[i] = br->read_signed(bps);
    if (!read_residual(br, blocksize, order, res.data())) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      switch (order) {
        case 0: pred = 0; break;
        case 1: pred = out[i - 1]; break;
        case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
        case 3: pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                 out[i - 4];
          break;
      }
      out[i] = pred + res[i - order];
    }
  } else if (type & 0x20) {  // LPC
    uint32_t order = (type & 0x1F) + 1;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; ++i) out[i] = br->read_signed(bps);
    uint32_t prec = br->read(4);
    if (prec == 0xF) return false;
    ++prec;
    int shift = br->read_signed(5);
    if (shift < 0) return false;
    int32_t coef[32];
    for (uint32_t i = 0; i < order; ++i) coef[i] = br->read_signed(prec);
    if (!read_residual(br, blocksize, order, res.data())) return false;
    for (uint32_t i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j)
        acc += static_cast<int64_t>(coef[j]) * out[i - 1 - j];
      out[i] = (acc >> shift) + res[i - order];
    }
  } else {
    return false;
  }
  if (wasted) {
    for (uint32_t i = 0; i < blocksize; ++i) out[i] <<= wasted;
  }
  return !br->eof;
}

// Reads the UTF-8-style coded frame/sample number (up to 36 bits).
bool read_coded_number(BitReader* br, uint64_t* out) {
  uint32_t b0 = br->read(8);
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) { v = b0; extra = 0; }
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else { return false; }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = br->read(8);
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return !br->eof;
}

// Decodes one frame. Returns frame blocksize (>0), 0 on clean EOF, <0 on
// corrupt data. chan[] gets per-channel int64 samples at full scale.
int decode_frame(BitReader* br, const FlacInfo& info,
                 std::vector<std::vector<int64_t>>* chan) {
  // Frame header: 14-bit sync + reserved + blocking strategy.
  uint32_t sync = br->read(14);
  if (br->eof) return 0;
  if (sync != 0x3FFE) return -1;
  br->read(1);  // reserved
  br->read(1);  // blocking strategy (number semantics only)
  uint32_t bs_code = br->read(4);
  uint32_t sr_code = br->read(4);
  uint32_t ch_asgn = br->read(4);
  uint32_t ss_code = br->read(3);
  br->read(1);  // reserved
  uint64_t num;
  if (!read_coded_number(br, &num)) return -2;

  uint32_t blocksize;
  if (bs_code == 1) blocksize = 192;
  else if (bs_code >= 2 && bs_code <= 5) blocksize = 576u << (bs_code - 2);
  else if (bs_code == 6) blocksize = br->read(8) + 1;
  else if (bs_code == 7) blocksize = br->read(16) + 1;
  else if (bs_code >= 8) blocksize = 256u << (bs_code - 8);
  else return -3;

  if (sr_code == 12) br->read(8);
  else if (sr_code == 13 || sr_code == 14) br->read(16);

  static const int kBits[8] = {0, 8, 12, 0, 16, 20, 24, 32};
  int bps = ss_code == 0 ? static_cast<int>(info.bits) : kBits[ss_code];
  if (bps == 0) return -4;

  br->read(8);  // header CRC-8 (not verified)
  if (br->eof) return -5;

  uint32_t nch = ch_asgn < 8 ? ch_asgn + 1 : 2;
  if (nch != info.channels) return -6;
  chan->resize(nch);
  for (uint32_t c = 0; c < nch; ++c) {
    (*chan)[c].resize(blocksize);
    int sub_bps = bps;
    // Side channels carry one extra bit.
    if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
        (ch_asgn == 10 && c == 1))
      ++sub_bps;
    if (!read_subframe(br, blocksize, sub_bps, (*chan)[c].data())) return -7;
  }
  br->align();
  br->read(16);  // frame CRC-16 (not verified)
  if (br->eof && blocksize == 0) return -8;

  // Undo stereo decorrelation in place.
  if (ch_asgn == 8) {  // left/side
    for (uint32_t i = 0; i < blocksize; ++i)
      (*chan)[1][i] = (*chan)[0][i] - (*chan)[1][i];
  } else if (ch_asgn == 9) {  // right/side: ch0 = side, ch1 = right
    for (uint32_t i = 0; i < blocksize; ++i)
      (*chan)[0][i] = (*chan)[1][i] + (*chan)[0][i];
  } else if (ch_asgn == 10) {  // mid/side
    for (uint32_t i = 0; i < blocksize; ++i) {
      int64_t mid = (*chan)[0][i];
      int64_t side = (*chan)[1][i];
      mid = (mid << 1) | (side & 1);
      (*chan)[0][i] = (mid + side) >> 1;
      (*chan)[1][i] = (mid - side) >> 1;
    }
  }
  return static_cast<int>(blocksize);
}

}  // namespace

extern "C" {

// Probe: returns 0 on success; fills sr/channels/frames. Mirrors
// jen1_wav_info (wavio.cpp).
int jen1_flac_info(const char* path, int32_t* sample_rate, int32_t* channels,
                   int64_t* num_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  FlacInfo info;
  bool ok = read_streaminfo(f, &info);
  fclose(f);
  if (!ok) return -2;
  *sample_rate = static_cast<int32_t>(info.sample_rate);
  *channels = static_cast<int32_t>(info.channels);
  *num_frames = static_cast<int64_t>(info.total_samples);
  return 0;
}

// Decode [start_frame, start_frame + out_frames) into out (frames x
// channels, float32 in [-1, 1), row-major). Frames past EOF are
// zero-filled. Returns frames written from the file, or < 0 on error.
// Mirrors jen1_wav_read's contract.
int64_t jen1_flac_read(const char* path, int64_t start_frame,
                       int64_t out_frames, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  FlacInfo info;
  if (!read_streaminfo(f, &info)) {
    fclose(f);
    return -2;
  }
  memset(out, 0, sizeof(float) * out_frames * info.channels);
  const float scale = 1.0f / static_cast<float>(1ll << (info.bits - 1));
  BitReader br(f);
  std::vector<std::vector<int64_t>> chan;
  int64_t pos = 0;      // absolute sample index at the start of this frame
  int64_t written = 0;  // frames emitted into out
  while (written < out_frames) {
    int bs = decode_frame(&br, info, &chan);
    if (bs == 0) break;  // clean EOF
    if (bs < 0) {
      fclose(f);
      return -100 + bs;
    }
    int64_t lo = start_frame > pos ? start_frame : pos;
    int64_t hi = pos + bs;
    int64_t want_hi = start_frame + out_frames;
    if (hi > want_hi) hi = want_hi;
    for (int64_t i = lo; i < hi; ++i) {
      float* dst = out + (i - start_frame) * info.channels;
      for (uint32_t c = 0; c < info.channels; ++c)
        dst[c] = static_cast<float>(chan[c][i - pos]) * scale;
    }
    if (hi > lo) written = hi - start_frame;
    pos += bs;
    if (pos >= start_frame + out_frames) break;
  }
  fclose(f);
  return written > 0 ? written : 0;
}

}  // extern "C"
