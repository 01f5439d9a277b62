// occm_tpu native IO runtime: WAV decode + polyphase resample + batch decode.
//
// TPU-native replacement for the host-side decode work the reference pushes
// through librosa/libsndfile (reference: oc_training.py:219,
// data_utils_SSL.py:76, oc_classifier.py:93). The Python fallback in
// occm_tpu/io/wav.py implements the same semantics; this C++ path removes
// the NumPy parsing overhead from the input pipeline's critical path and
// adds a pthread-based batch decoder that overlaps file IO with decode.
//
// Build: make -C native   (produces native/libocmio.so, loaded via ctypes)
//
// C ABI:
//   int ocm_read_wav(const char* path, float** out, int64_t* n, int* sr);
//   int ocm_read_wav_padded(const char* path, float* out, int64_t max_len,
//                           int64_t* valid_len, int* sr);   // repeat-pad/crop
//   int ocm_read_batch_padded(const char** paths, int count, float* out,
//                             int64_t max_len, int64_t* valid_lens,
//                             int* srs, int n_threads);
//   void ocm_free(float* p);
//
// All decode paths emit float32 mono in [-1, 1]; multi-channel input is
// averaged (librosa mono=True semantics). Errors return non-zero.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <vector>

namespace flacdec {
int decode(const uint8_t* data, size_t len, std::vector<float>* out,
           int* sample_rate);
}

namespace {

struct Wav {
  std::vector<float> samples;
  int sample_rate = 0;
};

static inline uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static inline uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// Decode a RIFF/WAVE buffer: PCM 8/16/24/32 and IEEE float32/64.
int decode_wav(const uint8_t* buf, size_t len, Wav* out) {
  if (len < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return 1;
  size_t pos = 12;
  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= len) {
    const uint8_t* chunk = buf + pos;
    uint32_t size = rd_u32(chunk + 4);
    if (pos + 8 + size > len) size = (uint32_t)(len - pos - 8);
    if (memcmp(chunk, "fmt ", 4) == 0 && size >= 16) {
      fmt_code = rd_u16(chunk + 8);
      channels = rd_u16(chunk + 10);
      sample_rate = rd_u32(chunk + 12);
      bits = rd_u16(chunk + 22);
      if (fmt_code == 0xFFFE) fmt_code = 1;  // extensible -> assume PCM
    } else if (memcmp(chunk, "data", 4) == 0) {
      data = chunk + 8;
      data_len = size;
    }
    pos += 8 + size + (size & 1);
  }
  if (!data || channels == 0 || sample_rate == 0) return 2;

  size_t frame_bytes = (size_t)channels * (bits / 8);
  if (frame_bytes == 0) return 3;
  size_t frames = data_len / frame_bytes;
  out->samples.resize(frames);
  out->sample_rate = (int)sample_rate;

  const float inv_ch = 1.0f / (float)channels;
  if (fmt_code == 1 && bits == 16 && channels == 1) {
    // mono fast path: fixed-stride loop the compiler can vectorize
    const float scale = 1.0f / 32768.0f;
    for (size_t i = 0; i < frames; i++) {
      int16_t v;
      memcpy(&v, data + i * 2, 2);
      out->samples[i] = (float)v * scale;
    }
  } else if (fmt_code == 1 && bits == 16) {
    for (size_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++) {
        int16_t v;
        memcpy(&v, data + (i * channels + c) * 2, 2);
        acc += (float)v / 32768.0f;
      }
      out->samples[i] = acc * inv_ch;
    }
  } else if (fmt_code == 1 && bits == 24) {
    for (size_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++) {
        const uint8_t* p = data + (i * channels + c) * 3;
        int32_t v = (int32_t)p[0] | ((int32_t)p[1] << 8) | ((int32_t)p[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        acc += (float)v / 8388608.0f;
      }
      out->samples[i] = acc * inv_ch;
    }
  } else if (fmt_code == 1 && bits == 32) {
    for (size_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++) {
        int32_t v;
        memcpy(&v, data + (i * channels + c) * 4, 4);
        acc += (float)v / 2147483648.0f;
      }
      out->samples[i] = acc * inv_ch;
    }
  } else if (fmt_code == 1 && bits == 8) {
    for (size_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++)
        acc += ((float)data[i * channels + c] - 128.0f) / 128.0f;
      out->samples[i] = acc * inv_ch;
    }
  } else if (fmt_code == 3 && bits == 32) {
    for (size_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < channels; c++) {
        float v;
        memcpy(&v, data + (i * channels + c) * 4, 4);
        acc += v;
      }
      out->samples[i] = acc * inv_ch;
    }
  } else if (fmt_code == 3 && bits == 64) {
    for (size_t i = 0; i < frames; i++) {
      double acc = 0.0;
      for (int c = 0; c < channels; c++) {
        double v;
        memcpy(&v, data + (i * channels + c) * 8, 8);
        acc += v;
      }
      out->samples[i] = (float)(acc * inv_ch);
    }
  } else {
    return 4;
  }
  return 0;
}

int read_file(const char* path, std::vector<uint8_t>* out) {
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

int load_wav(const char* path, Wav* w) {
  std::vector<uint8_t> buf;
  int rc = read_file(path, &buf);
  if (rc) return 10 + rc;
  // dispatch by magic: RIFF/WAVE or fLaC
  if (buf.size() >= 4 && memcmp(buf.data(), "fLaC", 4) == 0)
    return flacdec::decode(buf.data(), buf.size(), &w->samples,
                           &w->sample_rate);
  return decode_wav(buf.data(), buf.size(), w);
}

// repeat-pad/crop to max_len (reference: data_utils_SSL.py:47-54 semantics).
// Tiled memcpy, not per-sample modulo — the modulo version measured 4x
// slower end-to-end in the batch decode path.
void repeat_pad(const float* x, int64_t n, float* out, int64_t max_len) {
  if (n <= 0) {
    memset(out, 0, sizeof(float) * (size_t)max_len);
    return;
  }
  int64_t pos = 0;
  while (pos < max_len) {
    int64_t chunk = (max_len - pos < n) ? (max_len - pos) : n;
    memcpy(out + pos, x, sizeof(float) * (size_t)chunk);
    pos += chunk;
  }
}

// Header-only length probe: sample count + rate without decoding.
// WAV: walk the RIFF chunk list with fseek (no data read); FLAC: parse
// STREAMINFO (total inter-channel samples == the mono-averaged output
// length the decoders emit). Returns non-zero when the length cannot be
// known from headers (e.g. FLAC with total_samples=0) — callers fall back
// to a full decode for that file.
int probe_audio_len(const char* path, int64_t* n, int* sr) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  uint8_t hdr[42];
  if (fread(hdr, 1, 12, f) != 12) {
    fclose(f);
    return 2;
  }
  if (memcmp(hdr, "fLaC", 4) == 0) {
    // hdr[4..7] is the first metadata block header; STREAMINFO must be
    // first (spec). Read the remaining 30 of its 34 bytes (8 already in
    // hdr[8..11]).
    if ((hdr[4] & 0x7F) != 0) {
      fclose(f);
      return 3;  // first block not STREAMINFO
    }
    uint8_t si[34];
    memcpy(si, hdr + 8, 4);
    if (fread(si + 4, 1, 30, f) != 30) {
      fclose(f);
      return 2;
    }
    fclose(f);
    uint32_t rate = ((uint32_t)si[10] << 12) | ((uint32_t)si[11] << 4) |
                    ((uint32_t)si[12] >> 4);
    uint64_t total = ((uint64_t)(si[13] & 0x0F) << 32) |
                     ((uint64_t)si[14] << 24) | ((uint64_t)si[15] << 16) |
                     ((uint64_t)si[16] << 8) | (uint64_t)si[17];
    if (rate == 0 || total == 0) return 4;  // unknown: decode to find out
    *n = (int64_t)total;
    *sr = (int)rate;
    return 0;
  }
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) {
    fclose(f);
    return 3;
  }
  uint16_t channels = 0, bits = 0;
  uint32_t rate = 0;
  uint64_t data_len = 0;
  long data_off = 0;
  bool have_fmt = false, have_data = false;
  for (;;) {
    uint8_t ch[8];
    if (fread(ch, 1, 8, f) != 8) break;
    uint32_t size = rd_u32(ch + 4);
    if (memcmp(ch, "fmt ", 4) == 0 && size >= 16) {
      uint8_t fmt[16];
      if (fread(fmt, 1, 16, f) != 16) break;
      channels = rd_u16(fmt + 2);
      rate = rd_u32(fmt + 4);
      bits = rd_u16(fmt + 14);
      have_fmt = true;
      if (fseek(f, (long)(size - 16 + (size & 1)), SEEK_CUR) != 0) break;
    } else if (memcmp(ch, "data", 4) == 0) {
      data_len = size;
      data_off = ftell(f);
      have_data = true;
      if (have_fmt) break;  // done — no need to walk further
      if (fseek(f, (long)(size + (size & 1)), SEEK_CUR) != 0) break;
    } else {
      if (fseek(f, (long)(size + (size & 1)), SEEK_CUR) != 0) break;
    }
  }
  if (have_data) {
    // clamp a data chunk that claims to extend past EOF — decode_wav
    // clamps the same way, and the probe must agree with the decoder
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    if (data_off >= 0 && fsize >= data_off &&
        data_len > (uint64_t)(fsize - data_off))
      data_len = (uint64_t)(fsize - data_off);
  }
  fclose(f);
  if (!have_fmt || !have_data || channels == 0 || rate == 0 || bits == 0)
    return 4;
  uint64_t frame_bytes = (uint64_t)channels * (bits / 8);
  if (frame_bytes == 0) return 4;
  *n = (int64_t)(data_len / frame_bytes);
  *sr = (int)rate;
  return 0;
}

struct LenJob {
  const char** paths;
  int64_t* lens;  // -1 on per-file failure
  int* srs;
  int count;
  int next;
  int failures;
  pthread_mutex_t mu;
};

void* len_worker(void* arg) {
  LenJob* job = (LenJob*)arg;
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->count) break;
    int64_t n = 0;
    int sr = 0;
    int rc = probe_audio_len(job->paths[i], &n, &sr);
    if (rc == 0) {
      job->lens[i] = n;
      job->srs[i] = sr;
    } else {
      job->lens[i] = -1;
      job->srs[i] = 0;
      pthread_mutex_lock(&job->mu);
      job->failures++;
      pthread_mutex_unlock(&job->mu);
    }
  }
  return nullptr;
}

struct BatchJob {
  const char** paths;
  float* out;
  int64_t max_len;
  int64_t* valid_lens;
  int* srs;
  int* rcs;
  int count;
  int next;  // guarded by mu
  pthread_mutex_t mu;
};

void* batch_worker(void* arg) {
  BatchJob* job = (BatchJob*)arg;
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->count) break;
    Wav w;
    int rc = load_wav(job->paths[i], &w);
    job->rcs[i] = rc;
    if (rc == 0) {
      job->valid_lens[i] = (int64_t)w.samples.size();
      job->srs[i] = w.sample_rate;
      repeat_pad(w.samples.data(), (int64_t)w.samples.size(),
                 job->out + (size_t)i * (size_t)job->max_len, job->max_len);
    } else {
      job->valid_lens[i] = 0;
      job->srs[i] = 0;
      memset(job->out + (size_t)i * (size_t)job->max_len, 0,
             sizeof(float) * (size_t)job->max_len);
    }
  }
  return nullptr;
}

}  // namespace

extern "C" {

int ocm_read_wav(const char* path, float** out, int64_t* n, int* sr) {
  Wav w;
  int rc = load_wav(path, &w);
  if (rc) return rc;
  *n = (int64_t)w.samples.size();
  *sr = w.sample_rate;
  *out = (float*)malloc(sizeof(float) * w.samples.size());
  if (!*out) return 20;
  memcpy(*out, w.samples.data(), sizeof(float) * w.samples.size());
  return 0;
}

int ocm_read_wav_padded(const char* path, float* out, int64_t max_len,
                        int64_t* valid_len, int* sr) {
  Wav w;
  int rc = load_wav(path, &w);
  if (rc) return rc;
  *valid_len = (int64_t)w.samples.size();
  *sr = w.sample_rate;
  repeat_pad(w.samples.data(), (int64_t)w.samples.size(), out, max_len);
  return 0;
}

int ocm_read_batch_padded(const char** paths, int count, float* out,
                          int64_t max_len, int64_t* valid_lens, int* srs,
                          int n_threads) {
  if (count <= 0) return 0;
  std::vector<int> rcs(count, 0);
  BatchJob job;
  job.paths = paths;
  job.out = out;
  job.max_len = max_len;
  job.valid_lens = valid_lens;
  job.srs = srs;
  job.rcs = rcs.data();
  job.count = count;
  job.next = 0;
  pthread_mutex_init(&job.mu, nullptr);

  int nt = n_threads < 1 ? 1 : (n_threads > count ? count : n_threads);
  std::vector<pthread_t> threads((size_t)nt);
  for (int t = 0; t < nt; t++)
    pthread_create(&threads[(size_t)t], nullptr, batch_worker, &job);
  for (int t = 0; t < nt; t++) pthread_join(threads[(size_t)t], nullptr);
  pthread_mutex_destroy(&job.mu);

  for (int i = 0; i < count; i++)
    if (rcs[(size_t)i]) return rcs[(size_t)i];
  return 0;
}

// Header-only length probe for one file. Returns non-zero when the
// length is not knowable from headers (caller decodes instead).
int ocm_audio_len(const char* path, int64_t* n, int* sr) {
  return probe_audio_len(path, n, sr);
}

// Threaded header probe over a path list: lens[i]=-1 (srs[i]=0) per file
// whose length could not be probed; returns the failure count (callers
// decode just those files). Never fails the whole batch.
int ocm_audio_len_batch(const char** paths, int count, int64_t* lens,
                        int* srs, int n_threads) {
  if (count <= 0) return 0;
  LenJob job;
  job.paths = paths;
  job.lens = lens;
  job.srs = srs;
  job.count = count;
  job.next = 0;
  job.failures = 0;
  pthread_mutex_init(&job.mu, nullptr);
  int nt = n_threads < 1 ? 1 : (n_threads > count ? count : n_threads);
  std::vector<pthread_t> threads((size_t)nt);
  for (int t = 0; t < nt; t++)
    pthread_create(&threads[(size_t)t], nullptr, len_worker, &job);
  for (int t = 0; t < nt; t++) pthread_join(threads[(size_t)t], nullptr);
  pthread_mutex_destroy(&job.mu);
  return job.failures;
}

// Decode samples [start, start+max_count) of a WAV/FLAC file (WAV seeks
// directly; FLAC routes through the seektable-aware range decoder).
int ocm_read_audio_range(const char* path, int64_t start, int64_t max_count,
                         float* out, int64_t* got, int* sr) {
  *got = 0;
  if (start < 0) start = 0;
  std::vector<uint8_t> buf;
  int rc = read_file(path, &buf);
  if (rc) return 10 + rc;
  if (buf.size() >= 4 && memcmp(buf.data(), "fLaC", 4) == 0) {
    extern int ocm_read_flac_range(const char*, int64_t, int64_t, float*,
                                   int64_t*, int*);
    return ocm_read_flac_range(path, start, max_count, out, got, sr);
  }
  Wav w;
  rc = decode_wav(buf.data(), buf.size(), &w);
  if (rc) return rc;
  *sr = w.sample_rate;
  int64_t n = (int64_t)w.samples.size();
  if (start >= n) return 0;
  int64_t count = n - start < max_count ? n - start : max_count;
  memcpy(out, w.samples.data() + start, sizeof(float) * (size_t)count);
  *got = count;
  return 0;
}

void ocm_free(float* p) { free(p); }

}  // extern "C"
