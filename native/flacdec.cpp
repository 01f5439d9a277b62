// Native FLAC decoder for the occm_tpu IO runtime.
//
// Decode-only, covering the subset real ASVspoof FLACs use (and more):
// 8/12/16/20/24-bit, 1-8 channels, CONSTANT/VERBATIM/FIXED/LPC subframes,
// rice + rice2 residual partitions with escapes, left/right/mid-side
// stereo decorrelation, wasted bits, UTF-8 frame numbers.
//
// Integrity + access features (round 2):
// - CRC-8 (frame header) and CRC-16 (whole frame) verification, on by
//   default, toggled via ocm_set_flac_crc(int). The Python reference
//   decoder in occm_tpu/io/flac.py does the same and is the oracle.
// - SEEKTABLE metadata parsing.
// - Streaming decode handle (ocm_flac_open / ocm_flac_read /
//   ocm_flac_close): frame-at-a-time, constant memory per read.
// - Ranged read (ocm_read_flac_range): seeks via the SEEKTABLE when
//   present, else skips frames from the start.
//
// Exposed through wavio.cpp's ocm_* C ABI plus the extern "C" block at the
// bottom of this file.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>

namespace flacdec {

// ------------------------------------------------------------------ CRC

static bool g_verify_crc = true;

static uint8_t crc8(const uint8_t* data, size_t len) {
  uint8_t crc = 0;  // poly x^8 + x^2 + x + 1 (0x07), init 0
  for (size_t i = 0; i < len; i++) {
    crc ^= data[i];
    for (int b = 0; b < 8; b++)
      crc = (uint8_t)((crc & 0x80) ? (crc << 1) ^ 0x07 : crc << 1);
  }
  return crc;
}

static uint16_t crc16(const uint8_t* data, size_t len) {
  uint16_t crc = 0;  // poly x^16 + x^15 + x^2 + 1 (0x8005), init 0
  for (size_t i = 0; i < len; i++) {
    crc ^= (uint16_t)data[i] << 8;
    for (int b = 0; b < 8; b++)
      crc = (uint16_t)((crc & 0x8000) ? (crc << 1) ^ 0x8005 : crc << 1);
  }
  return crc;
}

// ------------------------------------------------------------ bit reader

struct BitReader {
  const uint8_t* data;
  size_t len;
  size_t byte = 0;
  int bit = 0;
  bool ok = true;

  BitReader(const uint8_t* d, size_t n) : data(d), len(n) {}

  inline uint64_t read(int n) {
    uint64_t out = 0;
    while (n > 0) {
      if (byte >= len) {
        ok = false;
        return 0;
      }
      int avail = 8 - bit;
      int take = n < avail ? n : avail;
      uint8_t cur = data[byte];
      out = (out << take) | ((cur >> (avail - take)) & ((1u << take) - 1));
      bit += take;
      if (bit == 8) {
        bit = 0;
        byte++;
      }
      n -= take;
    }
    return out;
  }

  inline int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n > 0 && (v >> (n - 1)) & 1) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }

  inline uint32_t read_unary() {
    uint32_t q = 0;
    while (ok && read(1) == 0) q++;
    return q;
  }

  inline uint64_t read_utf8() {
    uint64_t b0 = read(8);
    if (b0 < 0x80) return b0;
    int n = 0;
    uint32_t mask = 0x80;
    while (b0 & mask) {
      n++;
      mask >>= 1;
    }
    uint64_t v = b0 & (mask - 1);
    for (int i = 0; i < n - 1; i++) v = (v << 6) | (read(8) & 0x3F);
    return v;
  }

  inline void align() {
    if (bit) {
      bit = 0;
      byte++;
    }
  }
};

static const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -8,
                                    -16, 256,  512,  1024, 2048, 4096, 8192,
                                    16384, 32768};
static const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

static bool read_residual(BitReader& br, int block_size, int order,
                          std::vector<int64_t>* out) {
  int method = (int)br.read(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = (1u << plen) - 1;
  int po = (int)br.read(4);
  int n_parts = 1 << po;
  int part_len = block_size >> po;
  out->clear();
  out->reserve(block_size - order);
  for (int p = 0; p < n_parts; p++) {
    int count = part_len - (p == 0 ? order : 0);
    uint32_t param = (uint32_t)br.read(plen);
    if (param == escape) {
      int bits = (int)br.read(5);
      for (int i = 0; i < count; i++)
        out->push_back(bits ? br.read_signed(bits) : 0);
    } else {
      for (int i = 0; i < count; i++) {
        uint64_t q = br.read_unary();
        uint64_t r = param ? br.read(param) : 0;
        uint64_t v = (q << param) | r;
        out->push_back((int64_t)(v >> 1) ^ -(int64_t)(v & 1));
      }
    }
    if (!br.ok) return false;
  }
  return true;
}

static const int kFixedCoeffs[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

static bool decode_subframe(BitReader& br, int block_size, int bps,
                            std::vector<int64_t>* x) {
  if (br.read(1) != 0) return false;
  int sftype = (int)br.read(6);
  int wasted = 0;
  if (br.read(1)) {
    wasted = 1 + (int)br.read_unary();
    bps -= wasted;
  }
  x->assign(block_size, 0);

  if (sftype == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; i++) (*x)[i] = v;
  } else if (sftype == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) (*x)[i] = br.read_signed(bps);
  } else if (sftype >= 8 && sftype <= 12) {  // FIXED
    int order = sftype - 8;
    for (int i = 0; i < order; i++) (*x)[i] = br.read_signed(bps);
    std::vector<int64_t> res;
    if (!read_residual(br, block_size, order, &res)) return false;
    const int* c = kFixedCoeffs[order];
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += c[j] * (*x)[i - 1 - j];
      (*x)[i] = res[i - order] + pred;
    }
  } else if (sftype >= 32) {  // LPC
    int order = sftype - 31;
    for (int i = 0; i < order; i++) (*x)[i] = br.read_signed(bps);
    int precision = (int)br.read(4) + 1;
    if (precision == 16) return false;
    int shift = (int)br.read_signed(5);
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; i++) coefs[i] = br.read_signed(precision);
    std::vector<int64_t> res;
    if (!read_residual(br, block_size, order, &res)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coefs[j] * (*x)[i - 1 - j];
      (*x)[i] = res[i - order] + (acc >> shift);
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < block_size; i++) (*x)[i] <<= wasted;
  return br.ok;
}

// --------------------------------------------------------- decoder state

struct SeekPoint {
  uint64_t sample;
  uint64_t offset;  // byte offset relative to the first frame
};

struct Decoder {
  std::vector<uint8_t> buf;   // owned file contents (streaming handle)
  const uint8_t* data = nullptr;
  size_t len = 0;
  size_t pos = 0;             // next frame byte offset
  size_t first_frame = 0;     // byte offset of the first audio frame
  int sr = 0, channels = 0, bps = 0;
  uint64_t total = 0;         // 0 = unknown
  uint64_t n_decoded = 0;     // samples decoded so far
  std::vector<SeekPoint> seektable;
  std::vector<std::vector<int64_t>> sub;
};

// Parse "fLaC" + metadata blocks. Returns 0 on success.
static int open_stream(const uint8_t* data, size_t len, Decoder* d) {
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return 1;
  d->data = data;
  d->len = len;
  size_t pos = 4;
  for (;;) {
    if (pos + 4 > len) return 2;
    uint8_t hdr = data[pos];
    int btype = hdr & 0x7F;
    bool last = hdr & 0x80;
    uint32_t length = ((uint32_t)data[pos + 1] << 16) |
                      ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    if (btype == 0 && length >= 34) {  // STREAMINFO
      BitReader br(data + pos + 4, length);
      br.read(16);
      br.read(16);
      br.read(24);
      br.read(24);
      d->sr = (int)br.read(20);
      d->channels = (int)br.read(3) + 1;
      d->bps = (int)br.read(5) + 1;
      d->total = br.read(36);
    } else if (btype == 3) {  // SEEKTABLE: 18-byte points
      size_t n = length / 18;
      const uint8_t* p = data + pos + 4;
      for (size_t i = 0; i < n; i++, p += 18) {
        uint64_t sample = 0, off = 0;
        for (int b = 0; b < 8; b++) sample = (sample << 8) | p[b];
        for (int b = 0; b < 8; b++) off = (off << 8) | p[8 + b];
        if (sample == 0xFFFFFFFFFFFFFFFFull) continue;  // placeholder
        d->seektable.push_back({sample, off});
      }
    }
    pos += 4 + length;
    if (last) break;
  }
  if (d->sr == 0 || d->channels == 0) return 3;
  d->first_frame = pos;
  d->pos = pos;
  d->sub.resize((size_t)d->channels);
  return 0;
}

// Decode one frame's samples (channel-averaged mono floats) into *out.
// Returns 0 ok, 1 clean EOF, negative error.
static int decode_frame(Decoder* d, std::vector<float>* out) {
  const uint8_t* data = d->data;
  size_t len = d->len;
  if (d->pos + 2 > len) return 1;
  if (d->total && d->n_decoded >= d->total) return 1;

  size_t frame_start = d->pos;
  BitReader br(data, len);
  br.byte = d->pos;
  if (br.read(14) != 0x3FFE) return 1;  // no more frames / padding
  br.read(1);
  br.read(1);
  int bs_code = (int)br.read(4);
  int sr_code = (int)br.read(4);
  int ch_code = (int)br.read(4);
  int ss_code = (int)br.read(3);
  br.read(1);
  br.read_utf8();
  int block_size;
  if (bs_code == 6)
    block_size = (int)br.read(8) + 1;
  else if (bs_code == 7)
    block_size = (int)br.read(16) + 1;
  else
    block_size = kBlockSizes[bs_code];
  if (block_size <= 0) return -4;
  if (sr_code == 12)
    br.read(8);
  else if (sr_code == 13 || sr_code == 14)
    br.read(16);
  size_t hdr_end = br.byte;  // byte-aligned here by format construction
  uint8_t hdr_crc = (uint8_t)br.read(8);
  if (g_verify_crc &&
      crc8(data + frame_start, hdr_end - frame_start) != hdr_crc)
    return -9;

  int frame_bps = kSampleSizes[ss_code];
  if (frame_bps == 0) frame_bps = d->bps;

  std::vector<std::vector<int64_t>>& sub = d->sub;
  int n_ch;
  if (ch_code < 8) {
    n_ch = ch_code + 1;
    if (n_ch != d->channels) return -5;
    for (int c = 0; c < n_ch; c++)
      if (!decode_subframe(br, block_size, frame_bps, &sub[(size_t)c]))
        return -6;
  } else if (ch_code <= 10) {
    n_ch = 2;
    if (d->channels != 2) return -5;
    if (ch_code == 8) {  // left/side
      if (!decode_subframe(br, block_size, frame_bps, &sub[0])) return -6;
      if (!decode_subframe(br, block_size, frame_bps + 1, &sub[1])) return -6;
      for (int i = 0; i < block_size; i++) sub[1][i] = sub[0][i] - sub[1][i];
    } else if (ch_code == 9) {  // right/side
      if (!decode_subframe(br, block_size, frame_bps + 1, &sub[0])) return -6;
      if (!decode_subframe(br, block_size, frame_bps, &sub[1])) return -6;
      for (int i = 0; i < block_size; i++) sub[0][i] = sub[0][i] + sub[1][i];
    } else {  // mid/side
      if (!decode_subframe(br, block_size, frame_bps, &sub[0])) return -6;
      if (!decode_subframe(br, block_size, frame_bps + 1, &sub[1])) return -6;
      for (int i = 0; i < block_size; i++) {
        int64_t mid = (sub[0][i] << 1) | (sub[1][i] & 1);
        int64_t side = sub[1][i];
        sub[0][i] = (mid + side) >> 1;
        sub[1][i] = (mid - side) >> 1;
      }
    }
  } else {
    return -7;
  }
  br.align();
  size_t body_end = br.byte;
  uint16_t frame_crc = (uint16_t)br.read(16);
  if (!br.ok) return -8;
  if (g_verify_crc &&
      crc16(data + frame_start, body_end - frame_start) != frame_crc)
    return -10;
  d->pos = br.byte;

  const float scale = 1.0f / (float)((int64_t)1 << (d->bps - 1));
  const float inv_ch = 1.0f / (float)d->channels;
  int take = block_size;
  if (d->total && d->n_decoded + (uint64_t)take > d->total)
    take = (int)(d->total - d->n_decoded);
  out->clear();
  out->reserve((size_t)take);
  for (int i = 0; i < take; i++) {
    float acc = 0.f;
    for (int c = 0; c < d->channels; c++) acc += (float)sub[(size_t)c][i];
    out->push_back(acc * inv_ch * scale);
  }
  d->n_decoded += (uint64_t)block_size;
  return 0;
}

// Decode a whole stream to channel-averaged mono float32 (public entry
// used by wavio.cpp's magic-byte dispatch). Returns 0 on success.
int decode(const uint8_t* data, size_t len, std::vector<float>* out,
           int* sample_rate) {
  Decoder d;
  int rc = open_stream(data, len, &d);
  if (rc) return rc;
  *sample_rate = d.sr;
  out->clear();
  if (d.total) out->reserve((size_t)d.total);
  std::vector<float> frame;
  for (;;) {
    rc = decode_frame(&d, &frame);
    if (rc == 1) break;
    if (rc < 0) return -rc;  // positive error codes for the ABI
    out->insert(out->end(), frame.begin(), frame.end());
  }
  return 0;
}

// ------------------------------------------------- streaming + seeking

struct StreamHandle {
  Decoder dec;
  std::vector<float> pending;
  size_t pending_off = 0;
  int err = 0;
};

static int read_whole_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    return 2;
  }
  out->resize((size_t)n);
  size_t got = fread(out->data(), 1, (size_t)n, f);
  fclose(f);
  return got == (size_t)n ? 0 : 3;
}

// Position a freshly opened decoder so the NEXT decoded sample is
// `target` (or the nearest preceding frame boundary; *skip is set to the
// number of leading samples the caller must drop). Uses the SEEKTABLE
// when available.
static int seek_to(Decoder* d, uint64_t target, uint64_t* skip) {
  uint64_t base_sample = 0, base_off = 0;
  for (const SeekPoint& sp : d->seektable) {
    if (sp.sample <= target && sp.sample >= base_sample) {
      base_sample = sp.sample;
      base_off = sp.offset;
    }
  }
  d->pos = d->first_frame + (size_t)base_off;
  d->n_decoded = base_sample;
  // skip whole frames until the target falls inside the next frame
  std::vector<float> frame;
  for (;;) {
    if (d->n_decoded >= target) break;
    size_t save_pos = d->pos;
    uint64_t save_n = d->n_decoded;
    int rc = decode_frame(d, &frame);
    if (rc == 1) break;
    if (rc < 0) return rc;
    if (d->n_decoded > target) {  // target inside this frame: rewind
      d->pos = save_pos;
      d->n_decoded = save_n;
      break;
    }
  }
  *skip = target - d->n_decoded;
  return 0;
}

}  // namespace flacdec

// ------------------------------------------------------------- C ABI

extern "C" {

void ocm_set_flac_crc(int enable) { flacdec::g_verify_crc = enable != 0; }

int ocm_flac_seek_points(const char* path, int64_t* samples,
                         int64_t* offsets, int max_points) {
  std::vector<uint8_t> buf;
  if (flacdec::read_whole_file(path, &buf)) return -1;
  flacdec::Decoder d;
  if (flacdec::open_stream(buf.data(), buf.size(), &d)) return -2;
  int n = (int)d.seektable.size();
  if (n > max_points) n = max_points;
  for (int i = 0; i < n; i++) {
    samples[i] = (int64_t)d.seektable[(size_t)i].sample;
    offsets[i] = (int64_t)d.seektable[(size_t)i].offset;
  }
  return (int)d.seektable.size();
}

// Decode samples [start, start+max_count) to out; *got = samples written.
int ocm_read_flac_range(const char* path, int64_t start, int64_t max_count,
                        float* out, int64_t* got, int* sr) {
  *got = 0;
  std::vector<uint8_t> buf;
  if (flacdec::read_whole_file(path, &buf)) return 1;
  flacdec::Decoder d;
  int rc = flacdec::open_stream(buf.data(), buf.size(), &d);
  if (rc) return rc;
  *sr = d.sr;
  uint64_t skip = 0;
  rc = flacdec::seek_to(&d, (uint64_t)(start < 0 ? 0 : start), &skip);
  if (rc < 0) return -rc;
  std::vector<float> frame;
  int64_t written = 0;
  while (written < max_count) {
    rc = flacdec::decode_frame(&d, &frame);
    if (rc == 1) break;
    if (rc < 0) return -rc;
    size_t off = (size_t)(skip < frame.size() ? skip : (uint64_t)frame.size());
    skip -= off;
    for (size_t i = off; i < frame.size() && written < max_count; i++)
      out[written++] = frame[i];
  }
  *got = written;
  return 0;
}

// Streaming handle: open once, read sequential chunks, close.
void* ocm_flac_open(const char* path, int* sr, int64_t* total) {
  auto* h = new flacdec::StreamHandle();
  if (flacdec::read_whole_file(path, &h->dec.buf) ||
      flacdec::open_stream(h->dec.buf.data(), h->dec.buf.size(), &h->dec)) {
    delete h;
    return nullptr;
  }
  *sr = h->dec.sr;
  *total = (int64_t)h->dec.total;  // 0 = unknown
  return h;
}

// Returns samples written (0 = EOF), negative = decode error.
int64_t ocm_flac_read(void* handle, float* out, int64_t max_count) {
  auto* h = (flacdec::StreamHandle*)handle;
  if (h->err) return h->err;
  int64_t written = 0;
  while (written < max_count) {
    if (h->pending_off < h->pending.size()) {
      size_t n = h->pending.size() - h->pending_off;
      if ((int64_t)n > max_count - written) n = (size_t)(max_count - written);
      memcpy(out + written, h->pending.data() + h->pending_off,
             n * sizeof(float));
      h->pending_off += n;
      written += (int64_t)n;
      continue;
    }
    int rc = flacdec::decode_frame(&h->dec, &h->pending);
    if (rc != 0) {             // EOF or error: drop any stale frame data
      h->pending.clear();
      h->pending_off = 0;
      if (rc == 1) break;      // EOF
      h->err = rc;
      return written > 0 ? written : rc;
    }
    h->pending_off = 0;
  }
  return written;
}

void ocm_flac_close(void* handle) {
  delete (flacdec::StreamHandle*)handle;
}

}  // extern "C"
