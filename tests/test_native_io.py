"""Native C++ WAV decoder parity tests against the pure-NumPy reader."""

import numpy as np
import pytest

from occm_tpu.audio import pad_numpy
from occm_tpu.io import wav as wavmod
from occm_tpu.io.native import (
    available,
    native_read_batch_padded,
    native_read_wav,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native library not built (make -C native)"
)


@pytest.fixture
def wav_files(tmp_path):
    rng = np.random.default_rng(0)
    paths, waves = [], []
    for i, n in enumerate([1000, 3000, 70000]):
        x = (rng.normal(size=n) * 0.3).clip(-1, 1).astype(np.float32)
        p = tmp_path / f"f{i}.wav"
        wavmod.write_wav(str(p), x, 16000)
        paths.append(str(p))
        waves.append(x)
    return paths, waves


def test_native_matches_python_reader(wav_files):
    paths, _ = wav_files
    for p in paths:
        ours, sr1 = native_read_wav(p)
        ref, sr2 = wavmod.read_wav(p)
        assert sr1 == sr2 == 16000
        np.testing.assert_array_equal(ours, ref)


def test_native_batch_padded_repeat_semantics(wav_files):
    paths, _ = wav_files
    max_len = 64600
    out, valid, srs = native_read_batch_padded(paths, max_len, n_threads=3)
    assert out.shape == (3, max_len)
    for i, p in enumerate(paths):
        ref, _ = wavmod.read_wav(p)
        assert valid[i] == len(ref)
        assert srs[i] == 16000
        np.testing.assert_array_equal(out[i], pad_numpy(ref, max_len))


def test_load_audio_prefers_native(wav_files, monkeypatch):
    paths, _ = wav_files
    wave, sr = wavmod.load_audio(paths[0])
    ref, _ = wavmod.read_wav(paths[0])
    np.testing.assert_array_equal(wave, ref)
    assert sr == 16000


def test_native_audio_range_wav_and_flac(tmp_path):
    from occm_tpu.io import native
    from occm_tpu.io.flac import write_flac

    if not native.available():
        import pytest
        pytest.skip("native IO library not built")
    import numpy as np
    from occm_tpu.io.wav import write_wav

    rng = np.random.default_rng(0)
    wave = (0.2 * rng.normal(size=12000)).astype(np.float32)
    wav_p = str(tmp_path / "a.wav")
    flac_p = str(tmp_path / "a.flac")
    write_wav(wav_p, wave, 16000)
    write_flac(flac_p, wave, 16000)
    for p, atol in [(wav_p, 2e-4), (flac_p, 2e-4)]:
        got, sr = native.native_read_audio_range(p, 3000, 4000)
        assert sr == 16000 and got.shape == (4000,)
        np.testing.assert_allclose(got, wave[3000:7000], atol=atol)
        # past-the-end is clipped, not an error
        tail, _ = native.native_read_audio_range(p, 11000, 4000)
        assert tail.shape == (1000,)
