"""FLAC decoder property-fuzz lane (VERDICT r3 item 8): ≥1000 random
streams over the spec-surface parameter grid — bit depths x block sizes x
channel counts x stereo decorrelation modes x subframe types (CONSTANT/
VERBATIM/FIXED/LPC) x rice/rice2 x partition orders x escape partitions x
wasted bits x ragged tails — encoded by the generalised Python encoder
(occm_tpu.io.flac.encode_flac), then:

  1. the Python reference decoder must return the samples EXACTLY
     (losslessness is the spec's own invariant: a valid stream decodes to
     the original integers, bit for bit),
  2. the C++ decoder (native/flacdec.cpp) must return the channel-averaged
     float within float32 rounding of the same integers,
  3. random single-byte corruptions of valid streams must be REJECTED by
     both decoders (CRC) without crashing the process.

No third-party FLAC codec exists in this environment (no libFLAC, no
soundfile/librosa, no `flac` binary — checked), so a shared-misconception
escape remains possible only for streams the encoder itself mis-writes;
the corruption lane and the exact-integer invariant bound that risk.
When a system `flac` binary IS present (CI images that carry one), the
sweep additionally round-trips every 50th stream through it.

Reference decode path being modelled: librosa/soundfile FLAC reads at
data_utils_SSL.py:76,101.
"""

import shutil
import subprocess

import numpy as np
import pytest

from occm_tpu.io.flac import decode_flac, encode_flac
from occm_tpu.io.native import available, native_read_wav

pytestmark = pytest.mark.skipif(
    not available(), reason="native IO library not built"
)

FLAC_BIN = shutil.which("flac")

BPS_CHOICES = (8, 12, 16, 20, 24)
SUBFRAMES = ("constant", "verbatim", "fixed0", "fixed1", "fixed2",
             "fixed3", "fixed4", "lpc1", "lpc2", "lpc3", "lpc4")
STEREO = ("independent", "left_side", "right_side", "mid_side")


def _random_stream(rng: np.random.Generator):
    """One random (params, samples, encoded bytes) triple."""
    bps = int(rng.choice(BPS_CHOICES))
    subframe = str(rng.choice(SUBFRAMES))
    n_ch = int(rng.choice((1, 2, 2, 3)))  # weight stereo for the modes
    stereo = str(rng.choice(STEREO)) if n_ch == 2 else "independent"
    block_size = int(rng.choice((16, 32, 64, 192, 256)))
    # ragged tail in ~2/3 of streams
    n = block_size * int(rng.integers(1, 4)) + int(
        rng.integers(0, block_size))
    n = max(n, 1)
    wasted = int(rng.choice((0, 0, 0, 1, 2, 3)))
    rice_method = int(rng.integers(0, 2))
    partition_order = int(rng.choice((0, 0, 1, 2)))
    force_escape = bool(rng.integers(0, 4) == 0)

    lim = 1 << (bps - 2)  # headroom: mid/side and fixed residuals stay legal
    if subframe == "constant":
        x = np.tile(rng.integers(-lim, lim, size=(1, n_ch)), (n, 1))
    else:
        x = rng.integers(-lim, lim, size=(n, n_ch))
    x = (x >> wasted) << wasted  # guarantee the declared wasted low bits

    params = dict(bps=bps, subframe=subframe, stereo=stereo,
                  block_size=block_size, rice_method=rice_method,
                  partition_order=partition_order,
                  force_escape=force_escape, wasted=wasted)
    data = encode_flac(x, 16000, **params)
    return params, x, data


def test_fuzz_python_and_native_decoders_roundtrip(tmp_path):
    rng = np.random.default_rng(2024)
    n_streams = 1000
    seen = set()
    for trial in range(n_streams):
        params, x, data = _random_stream(rng)
        seen.add((params["bps"], params["subframe"], params["stereo"],
                  params["rice_method"], params["force_escape"],
                  params["wasted"] > 0))
        ctx = f"trial {trial}: {params}"

        # 1. Python decoder: bit-exact integers back
        dec, sr, bps = decode_flac(data)
        assert sr == 16000 and bps == params["bps"], ctx
        np.testing.assert_array_equal(dec, x.astype(np.int32), err_msg=ctx)

        # 2. C++ decoder: channel-averaged float32 of the same integers
        p = tmp_path / "f.flac"
        p.write_bytes(data)
        mono, sr_n = native_read_wav(str(p))
        assert sr_n == 16000, ctx
        scale = 1.0 / (1 << (params["bps"] - 1))
        expect = (x.astype(np.float64).mean(axis=1) * scale)
        np.testing.assert_allclose(mono, expect.astype(np.float32),
                                   atol=2e-6, err_msg=ctx)

        # 3. optional third-party cross-check
        if FLAC_BIN and trial % 50 == 0:
            out = tmp_path / "f.wav"
            r = subprocess.run(
                [FLAC_BIN, "-d", "-f", "-o", str(out), str(p)],
                capture_output=True,
            )
            assert r.returncode == 0, (ctx, r.stderr[-500:])
    # the sweep really covered the grid, not one corner
    assert len(seen) > 120, f"only {len(seen)} distinct parameter corners"


def test_fuzz_corrupted_streams_rejected(tmp_path):
    """Random single-byte corruptions of valid streams: the Python decoder
    raises, the C++ decoder returns an error (CRC verification) — and
    neither crashes. Corruptions inside the header magic are also fine to
    reject with any error."""
    rng = np.random.default_rng(7)
    rejected_py = rejected_native = 0
    trials = 200
    for trial in range(trials):
        _, x, data = _random_stream(rng)
        buf = bytearray(data)
        # corrupt a byte after the metadata so a frame (not just the
        # header) is hit most of the time
        idx = int(rng.integers(4, len(buf)))
        old = buf[idx]
        buf[idx] = old ^ int(rng.integers(1, 256))
        corrupted = bytes(buf)

        try:
            dec, _, bps = decode_flac(corrupted)
            # a flipped byte can land in padding or zero-cost positions;
            # if it decodes, the samples must still be the originals
            # (CRC passed => the flip was in ignored bytes) — anything
            # else is silent corruption
            np.testing.assert_array_equal(dec, x.astype(np.int32))
        except Exception:
            rejected_py += 1

        p = tmp_path / "c.flac"
        p.write_bytes(corrupted)
        try:
            mono, _ = native_read_wav(str(p))
        except Exception:
            rejected_native += 1
    # the overwhelming majority of single-byte flips must be caught
    assert rejected_py > trials * 0.8, rejected_py
    assert rejected_native > trials * 0.8, rejected_native
