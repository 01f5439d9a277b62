"""FLAC decoder tests: Python reference decoder + native C++ decoder
against encoder-generated vectors (no system FLAC tooling in this image)."""

import numpy as np
import pytest

from occm_tpu.io.flac import (
    decode_flac,
    encode_flac_mono16,
    read_flac,
    write_flac,
)
from occm_tpu.io.native import available, native_read_wav
from occm_tpu.io.wav import load_audio


def _signal(n=12000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.normal(size=n)
    return (np.clip(x, -1, 1) * 32767).astype(np.int64)


@pytest.mark.parametrize(
    "subframe", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]
)
def test_python_roundtrip(subframe):
    pcm = _signal()
    data = encode_flac_mono16(pcm, 16000, block_size=1000, subframe=subframe)
    dec, sr, bps = decode_flac(data)
    assert (sr, bps) == (16000, 16)
    np.testing.assert_array_equal(dec[:, 0], pcm)


def test_constant_subframe_and_ragged_tail():
    pcm = np.full(2500, 1234, np.int64)  # non-multiple of block size
    data = encode_flac_mono16(pcm, 16000, block_size=1000,
                              subframe="constant")
    dec, sr, _ = decode_flac(data)
    np.testing.assert_array_equal(dec[:, 0], pcm)


def test_read_flac_float_mono():
    pcm = _signal(5000, seed=1)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.flac")
        with open(p, "wb") as f:
            f.write(encode_flac_mono16(pcm, 16000, subframe="fixed2"))
        x, sr = read_flac(p)
        assert sr == 16000
        np.testing.assert_allclose(x, pcm / 32768.0, atol=1e-7)

        # load_audio dispatches on magic regardless of extension
        x2, sr2 = load_audio(p)
        np.testing.assert_allclose(x2, x, atol=1e-6)


@pytest.mark.skipif(not available(), reason="native library not built")
def test_native_flac_matches_python(tmp_path):
    pcm = _signal(20000, seed=2)
    p = tmp_path / "y.flac"
    with open(p, "wb") as f:
        f.write(encode_flac_mono16(pcm, 16000, block_size=4096,
                                   subframe="fixed3"))
    ref, sr_ref = read_flac(str(p))
    ours, sr = native_read_wav(str(p))  # dispatches on fLaC magic
    assert sr == sr_ref == 16000
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_write_flac_helper(tmp_path):
    x = np.sin(2 * np.pi * 300 * np.arange(4000) / 16000).astype(np.float32)
    p = tmp_path / "z.flac"
    write_flac(str(p), 0.5 * x, 16000)
    y, sr = read_flac(str(p))
    assert sr == 16000
    np.testing.assert_allclose(y, 0.5 * x, atol=1e-3)


def test_encoder_seektable_and_native_seek_points(tmp_path):
    from occm_tpu.io import native

    if not native.available():
        pytest.skip("native IO library not built")
    pcm = _signal(20000)
    path = str(tmp_path / "st.flac")
    with open(path, "wb") as f:
        f.write(encode_flac_mono16(pcm, 16000, block_size=1000,
                                   subframe="fixed1", seek_every=5))
    samples, offsets = native.flac_seek_points(path)
    # 20 frames, a point every 5 -> 4 points at samples 0,5000,10000,15000
    np.testing.assert_array_equal(samples, [0, 5000, 10000, 15000])
    assert offsets[0] == 0 and np.all(np.diff(offsets) > 0)
    # the file still decodes identically with the extra metadata block
    wave, sr = native.native_read_wav(path)
    np.testing.assert_allclose(wave, pcm.astype(np.float32) / 32768.0,
                               atol=1.5e-4)


def test_native_flac_range_read_with_and_without_seektable(tmp_path):
    from occm_tpu.io import native

    if not native.available():
        pytest.skip("native IO library not built")
    pcm = _signal(20000, seed=3)
    full = pcm.astype(np.float32) / 32768.0
    for seek_every in (0, 4):
        path = str(tmp_path / f"r{seek_every}.flac")
        with open(path, "wb") as f:
            f.write(encode_flac_mono16(pcm, 16000, block_size=1000,
                                       subframe="fixed2",
                                       seek_every=seek_every))
        for start, count in [(0, 500), (7321, 2000), (19500, 1000)]:
            got, sr = native.native_read_flac_range(path, start, count)
            assert sr == 16000
            want = full[start:start + count]
            np.testing.assert_allclose(got, want, atol=1.5e-4)


def test_native_flac_stream_matches_full_decode(tmp_path):
    from occm_tpu.io import native

    if not native.available():
        pytest.skip("native IO library not built")
    pcm = _signal(15000, seed=5)
    path = str(tmp_path / "s.flac")
    with open(path, "wb") as f:
        f.write(encode_flac_mono16(pcm, 16000, block_size=777,
                                   subframe="fixed2"))
    with native.FlacStream(path) as st:
        assert st.sample_rate == 16000
        assert st.total_samples == 15000
        chunks = []
        while True:
            c = st.read(1234)
            if c.size == 0:
                break
            chunks.append(c)
    wave = np.concatenate(chunks)
    np.testing.assert_allclose(wave, pcm.astype(np.float32) / 32768.0,
                               atol=1.5e-4)


def test_native_flac_crc_verification_rejects_corruption(tmp_path):
    from occm_tpu.io import native

    if not native.available():
        pytest.skip("native IO library not built")
    pcm = _signal(6000, seed=7)
    data = bytearray(encode_flac_mono16(pcm, 16000, block_size=1000,
                                        subframe="verbatim"))
    # flip a bit in the middle of the last frame's audio payload
    data[-40] ^= 0x10
    path = str(tmp_path / "bad.flac")
    with open(path, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(IOError):
        native.native_read_wav(path)
    # with verification off the corrupt frame decodes (garbage) fine
    native.set_flac_crc_verify(False)
    try:
        wave, _ = native.native_read_wav(path)
        assert wave.shape == (6000,)
    finally:
        native.set_flac_crc_verify(True)
