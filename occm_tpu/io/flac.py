"""Native FLAC decode (pure-Python reference + test encoder).

ASVspoof audio ships as FLAC and the reference leans on librosa/libsndfile
to read it (reference: oc_classifier.py:89-93, data_utils_SSL.py:76). This
framework owns the decoder: the C++ fast path lives in native/flacdec.cpp
(via occm_tpu.io.native); this module is the bit-exact reference
implementation and fallback, plus a minimal encoder used to build test
vectors (no system FLAC tooling exists in this image).

Decoder coverage: 8/12/16/20/24-bit, 1-8 channels, all subframe types
(CONSTANT, VERBATIM, FIXED 0-4, LPC 1-32), rice/rice2 residual partitions
with escape codes, left/right/mid-side decorrelation, wasted bits, UTF-8
frame numbers, CRC-8/CRC-16 verification.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}

_SAMPLE_RATES = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000,
                 5: 16000, 6: 22050, 7: 24000, 8: 32000, 9: 44100,
                 10: 48000, 11: 96000}

_SAMPLE_SIZES = {0: None, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def tell_byte(self) -> int:
        return self.byte

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_utf8(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        mask = 0x80
        while b0 & mask:
            n += 1
            mask >>= 1
        v = b0 & (mask - 1)
        for _ in range(n - 1):
            v = (v << 6) | (self.read(8) & 0x3F)
        return v


def _read_residual(br: _BitReader, block_size: int, order: int) -> List[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    out: List[int] = []
    n_parts = 1 << po
    part_len = block_size >> po
    for p in range(n_parts):
        count = part_len - (order if p == 0 else 0)
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(bits) if bits else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("invalid subframe padding bit")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted

    if sftype == 0:  # CONSTANT
        v = br.read_signed(bps)
        x = np.full(block_size, v, dtype=np.int64)
    elif sftype == 1:  # VERBATIM
        x = np.array([br.read_signed(bps) for _ in range(block_size)],
                     dtype=np.int64)
    elif 8 <= sftype <= 12:  # FIXED
        order = sftype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        coeffs = FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * x[i - 1 - j]
            x[i] = res[i - order] + pred
    elif sftype >= 32:  # LPC
        order = sftype - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid qlp precision")
        shift = br.read_signed(5)
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coefs[j] * x[i - 1 - j]
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {sftype}")

    if wasted:
        x = x << wasted
    return x


def decode_flac(data: bytes) -> Tuple[np.ndarray, int, int]:
    """Decode a FLAC stream. Returns (samples [n, channels] int32, sr, bps)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = channels = bps = None
    total = None
    # metadata blocks
    while True:
        hdr = data[pos]
        btype = hdr & 0x7F
        last = hdr & 0x80
        length = int.from_bytes(data[pos + 1: pos + 4], "big")
        body = data[pos + 4: pos + 4 + length]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)  # min block
            br.read(16)  # max block
            br.read(24)
            br.read(24)
            sr = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + length
        if last:
            break
    if sr is None:
        raise ValueError("missing STREAMINFO")

    chans: List[List[np.ndarray]] = [[] for _ in range(channels)]
    n_decoded = 0
    while pos < len(data) and (total is None or n_decoded < total or total == 0):
        if pos + 2 > len(data):
            break
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            break
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        br.read_utf8()
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        hdr_end = br.tell_byte() + (1 if br.bit else 0)
        crc8 = br.read(8)
        if _crc8(data[pos:hdr_end]) != crc8:
            raise ValueError("frame header CRC mismatch")

        frame_bps = _SAMPLE_SIZES[ss_code] or bps

        if ch_code < 8:
            n_ch = ch_code + 1
            sub = []
            for c in range(n_ch):
                sub.append(_decode_subframe(br, block_size, frame_bps))
            outs = sub
        else:
            # stereo decorrelation; side channel carries one extra bit
            if ch_code == 8:    # left/side
                left = _decode_subframe(br, block_size, frame_bps)
                side = _decode_subframe(br, block_size, frame_bps + 1)
                outs = [left, left - side]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, block_size, frame_bps + 1)
                right = _decode_subframe(br, block_size, frame_bps)
                outs = [side + right, right]
            elif ch_code == 10:  # mid/side
                mid = _decode_subframe(br, block_size, frame_bps)
                side = _decode_subframe(br, block_size, frame_bps + 1)
                m2 = (mid << 1) | (side & 1)
                outs = [(m2 + side) >> 1, (m2 - side) >> 1]
            else:
                raise ValueError("reserved channel assignment")
            n_ch = 2
        br.align()
        crc16 = br.read(16)
        frame_end = br.tell_byte()
        if _crc16(data[pos:frame_end - 2]) != crc16:
            raise ValueError("frame CRC16 mismatch")
        pos = frame_end

        for c in range(n_ch):
            chans[c].append(outs[c])
        n_decoded += block_size

    arrays = [np.concatenate(c) if c else np.zeros(0, np.int64)
              for c in chans]
    n = min(a.shape[0] for a in arrays)
    if total:
        n = min(n, total)
    out = np.stack([a[:n] for a in arrays], axis=1).astype(np.int32)
    return out, sr, bps


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode FLAC to float32 mono in [-1, 1] (librosa semantics)."""
    with open(path, "rb") as f:
        samples, sr, bps = decode_flac(f.read())
    x = samples.astype(np.float32) / float(1 << (bps - 1))
    if x.shape[1] > 1:
        x = x.mean(axis=1)
    else:
        x = x[:, 0]
    return np.ascontiguousarray(x), sr


# --------------------------------------------------------------- encoder
# Minimal encoder for test vectors / tooling: 16-bit, fixed 4096 blocking,
# constant / verbatim / fixed-order subframes with single-partition rice.

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_coded(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1):
        nbytes += 1
    prefix = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(prefix | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _best_rice_param(res: List[int], plen: int) -> int:
    best, best_bits = 0, None
    for p in range(min(30, (1 << plen) - 1)):
        bits = 0
        for r in res:
            z = (abs(r) << 1) - (1 if r < 0 else 0)
            bits += (z >> p) + 1 + p
            if bits > 1 << 30:
                break
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def encode_flac_mono16(x: np.ndarray, sr: int, block_size: int = 4096,
                       subframe: str = "fixed2", seek_every: int = 0) -> bytes:
    """Encode int16 mono to FLAC (test vectors; not a production encoder).

    subframe: constant-aware; 'verbatim', 'fixed0'..'fixed4'.
    seek_every: if > 0, write a SEEKTABLE metadata block with a point at
    every Nth frame (spec 18-byte entries: sample, byte offset relative to
    the first frame, frame sample count).
    """
    x = np.asarray(x, np.int64)
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(0, 3)       # channels-1
    si.write(15, 5)      # bps-1
    si.write(len(x) & ((1 << 36) - 1), 36)
    si.align()
    body = si.bytes() + b"\x00" * 16  # md5 zeros

    frames: list = []  # (start_sample, n_samples, frame_bytes)
    sample_pos = 0
    frame_idx = 0
    for start in range(0, len(x), block_size):
        blk = x[start: start + block_size]
        n = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)          # fixed blocking
        bs_code = 7             # explicit 16-bit block size
        bw.write(bs_code, 4)
        sr_code = {8000: 4, 16000: 5, 44100: 9, 48000: 10}.get(sr, 13)
        bw.write(sr_code, 4)
        bw.write(0, 4)          # 1 channel
        bw.write(4, 3)          # 16 bps
        bw.write(0, 1)
        for b in _utf8_coded(frame_idx):
            bw.write(b, 8)
        bw.write(n - 1, 16)
        if sr_code == 13:
            bw.write(sr, 16)
        bw.align()
        hdr = bw.bytes()
        hdr += bytes([_crc8(hdr)])

        sw = _BitWriter()
        if subframe == "constant" or (np.all(blk == blk[0]) and n > 0):
            sw.write(0, 1)
            sw.write(0, 6)
            sw.write(0, 1)
            sw.write_signed(int(blk[0]), 16)
        elif subframe == "verbatim":
            sw.write(0, 1)
            sw.write(1, 6)
            sw.write(0, 1)
            for v in blk:
                sw.write_signed(int(v), 16)
        else:
            order = int(subframe[-1])
            order = min(order, n)
            sw.write(0, 1)
            sw.write(8 + order, 6)
            sw.write(0, 1)
            for v in blk[:order]:
                sw.write_signed(int(v), 16)
            coeffs = FIXED_COEFFS[order]
            res = []
            for i in range(order, n):
                pred = sum(c * int(blk[i - 1 - j])
                           for j, c in enumerate(coeffs))
                res.append(int(blk[i]) - pred)
            sw.write(0, 2)   # rice 4-bit
            sw.write(0, 4)   # partition order 0
            param = _best_rice_param(res, 4) if res else 0
            if param >= 15:
                param = 14
            sw.write(param, 4)
            for r in res:
                z = (abs(r) << 1) - (1 if r < 0 else 0)
                sw.write_unary(z >> param)
                if param:
                    sw.write(z & ((1 << param) - 1), param)
        sw.align()
        frame = hdr + sw.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        frames.append((sample_pos, n, frame))
        sample_pos += n
        frame_idx += 1

    meta = [(0, body)]
    if seek_every > 0:
        st = bytearray()
        offset = 0
        for i, (spos, n, fr) in enumerate(frames):
            if i % seek_every == 0:
                st += spos.to_bytes(8, "big")
                st += offset.to_bytes(8, "big")
                st += n.to_bytes(2, "big")
            offset += len(fr)
        meta.append((3, bytes(st)))
    for i, (btype, b) in enumerate(meta):
        last = 0x80 if i == len(meta) - 1 else 0x00
        out += bytes([last | btype]) + len(b).to_bytes(3, "big") + b
    for _, _, fr in frames:
        out += fr
    return bytes(out)


def write_flac(path: str, x: np.ndarray, sr: int, **kwargs) -> None:
    """float32 [-1,1] mono -> 16-bit FLAC file (testing/tooling)."""
    pcm = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int64)
    with open(path, "wb") as f:
        f.write(encode_flac_mono16(pcm, sr, **kwargs))
