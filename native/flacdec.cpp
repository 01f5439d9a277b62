// Native FLAC decoder for the occm_tpu IO runtime.
//
// Decode-only, covering the subset real ASVspoof FLACs use (and more):
// 8/12/16/20/24-bit, 1-8 channels, CONSTANT/VERBATIM/FIXED/LPC subframes,
// rice + rice2 residual partitions with escapes, left/right/mid-side
// stereo decorrelation, wasted bits, UTF-8 frame numbers. CRCs are parsed
// but not verified on the hot path (the Python reference decoder in
// occm_tpu/io/flac.py verifies both CRC-8 and CRC-16 and is the
// correctness oracle in tests).
//
// Exposed through wavio.cpp's ocm_* C ABI (see ocm_read_flac /
// ocm_read_audio there).

#include <cstdint>
#include <cstring>
#include <vector>

namespace flacdec {

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

// Decode a whole stream to interleaved-mono float32 (channels averaged).
// Returns 0 on success.
int decode(const uint8_t* data, size_t len, std::vector<float>* out,
           int* sample_rate) {
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return 1;
  size_t pos = 4;
  int sr = 0, channels = 0, bps = 0;
  uint64_t total = 0;
  // metadata
  for (;;) {
    if (pos + 4 > len) return 2;
    uint8_t hdr = data[pos];
    int btype = hdr & 0x7F;
    bool last = hdr & 0x80;
    uint32_t length = ((uint32_t)data[pos + 1] << 16) |
                      ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    if (btype == 0 && length >= 34) {
      BitReader br(data + pos + 4, length);
      br.read(16);
      br.read(16);
      br.read(24);
      br.read(24);
      sr = (int)br.read(20);
      channels = (int)br.read(3) + 1;
      bps = (int)br.read(5) + 1;
      total = br.read(36);
    }
    pos += 4 + length;
    if (last) break;
  }
  if (sr == 0 || channels == 0) return 3;
  *sample_rate = sr;

  out->clear();
  if (total) out->reserve((size_t)total);
  const float scale = 1.0f / (float)((int64_t)1 << (bps - 1));
  const float inv_ch = 1.0f / (float)channels;

  std::vector<std::vector<int64_t>> sub((size_t)channels);
  uint64_t n_decoded = 0;
  while (pos + 2 <= len && (total == 0 || n_decoded < total)) {
    BitReader br(data, len);
    br.byte = pos;
    if (br.read(14) != 0x3FFE) break;
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
    if (block_size <= 0) return 4;
    if (sr_code == 12)
      br.read(8);
    else if (sr_code == 13 || sr_code == 14)
      br.read(16);
    br.read(8);  // header CRC (unverified)

    int frame_bps = kSampleSizes[ss_code];
    if (frame_bps == 0) frame_bps = bps;

    int n_ch;
    if (ch_code < 8) {
      n_ch = ch_code + 1;
      if (n_ch != channels) return 5;
      for (int c = 0; c < n_ch; c++)
        if (!decode_subframe(br, block_size, frame_bps, &sub[(size_t)c]))
          return 6;
    } else if (ch_code <= 10) {
      n_ch = 2;
      if (channels != 2) return 5;
      if (ch_code == 8) {  // left/side
        if (!decode_subframe(br, block_size, frame_bps, &sub[0])) return 6;
        if (!decode_subframe(br, block_size, frame_bps + 1, &sub[1]))
          return 6;
        for (int i = 0; i < block_size; i++) sub[1][i] = sub[0][i] - sub[1][i];
      } else if (ch_code == 9) {  // right/side
        if (!decode_subframe(br, block_size, frame_bps + 1, &sub[0])) return 6;
        if (!decode_subframe(br, block_size, frame_bps, &sub[1])) return 6;
        for (int i = 0; i < block_size; i++) sub[0][i] = sub[0][i] + sub[1][i];
      } else {  // mid/side
        if (!decode_subframe(br, block_size, frame_bps, &sub[0])) return 6;
        if (!decode_subframe(br, block_size, frame_bps + 1, &sub[1]))
          return 6;
        for (int i = 0; i < block_size; i++) {
          int64_t mid = (sub[0][i] << 1) | (sub[1][i] & 1);
          int64_t side = sub[1][i];
          sub[0][i] = (mid + side) >> 1;
          sub[1][i] = (mid - side) >> 1;
        }
      }
    } else {
      return 7;
    }
    br.align();
    br.read(16);  // frame CRC (unverified)
    if (!br.ok) return 8;
    pos = br.byte;

    int take = block_size;
    if (total && n_decoded + (uint64_t)take > total)
      take = (int)(total - n_decoded);
    for (int i = 0; i < take; i++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++) acc += (float)sub[(size_t)c][i];
      out->push_back(acc * inv_ch * scale);
    }
    n_decoded += (uint64_t)block_size;
  }
  return 0;
}

}  // namespace flacdec
