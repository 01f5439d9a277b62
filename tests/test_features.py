"""DSP feature bank property tests (reference: utils.py — C15)."""

import numpy as np
import pytest

import jax.numpy as jnp

from occm_tpu.audio.features import (
    extract_bfcc,
    extract_cqcc,
    extract_cwt,
    extract_lfcc,
    extract_lpc,
    extract_lpcc,
    extract_mel,
    extract_mfcc,
    extract_ssqcwt,
    frame_signal,
    mvn,
    normalize_dataset,
    pad_to_dense_1d,
    pad_to_dense_2d,
    stft_mag,
)

SR = 16000


@pytest.fixture
def tone():
    t = np.arange(SR) / SR  # 1 s
    return jnp.asarray(
        (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    )


def test_frame_counts(tone):
    frames = frame_signal(tone, 480, 240)
    assert frames.shape == ((SR - 480) // 240 + 1, 480)


def test_stft_peak_at_tone(tone):
    mag = stft_mag(tone, SR)
    peak_bin = int(np.argmax(np.asarray(mag).mean(axis=0)))
    freq = peak_bin * SR / 2048
    assert abs(freq - 1000) < 30


def test_mel_spectrogram_peak(tone):
    mels = extract_mel(tone, SR, n_filts=64)
    assert mels.shape[1] == 64
    # 1 kHz = mel 999.99/ (range 0..2840 for 8k) -> filter ~ around 1/3
    peak = int(np.argmax(np.asarray(mels).mean(axis=0)))
    assert 10 < peak < 40


@pytest.mark.parametrize("fn", [extract_lfcc, extract_mfcc, extract_bfcc])
def test_cepstra_shapes_and_mvn(fn, tone):
    ceps = np.asarray(fn(tone, SR, n_ceps=13))
    assert ceps.shape[1] == 13
    # MVN: zero mean, unit variance per coefficient
    np.testing.assert_allclose(ceps.mean(axis=0), 0, atol=5e-3)
    np.testing.assert_allclose(ceps.std(axis=0), 1, atol=5e-2)


def test_cqcc_shape(tone):
    ceps = np.asarray(extract_cqcc(tone, SR, n_ceps=13))
    assert ceps.shape[1] == 13
    assert np.all(np.isfinite(ceps))


def test_lpc_recovers_ar2_pole():
    # AR(2) process with known coefficients: x[n] = 1.3 x[n-1] - 0.4 x[n-2] + e
    rng = np.random.default_rng(0)
    e = rng.normal(size=SR).astype(np.float32) * 0.1
    x = np.zeros(SR, np.float32)
    for n in range(2, SR):
        x[n] = 1.3 * x[n - 1] - 0.4 * x[n - 2] + e[n]
    a = np.asarray(extract_lpc(jnp.asarray(x), SR, order=4))
    med = np.median(a, axis=0)
    assert med[0] == pytest.approx(1.0)
    # prediction polynomial A(z) = 1 - 1.3 z^-1 + 0.4 z^-2
    assert med[1] == pytest.approx(-1.3, abs=0.1)
    assert med[2] == pytest.approx(0.4, abs=0.1)


def test_lpcc_finite(tone):
    c = np.asarray(extract_lpcc(tone, SR, order=10))
    assert c.shape[1] == 11
    assert np.all(np.isfinite(c))


def test_cwt_scale_localisation():
    # 500 Hz tone: CWT magnitude peaks near scale s = w0*sr/(2*pi*f)
    t = np.arange(4000) / SR
    x = jnp.asarray(np.sin(2 * np.pi * 500 * t).astype(np.float32))
    widths = np.arange(1, 80)
    W = np.abs(np.asarray(extract_cwt(x, SR, widths=widths)))
    peak_scale = widths[int(np.argmax(W.mean(axis=1)))]
    expected = 5.0 * SR / (2 * np.pi * 500)  # ~25.5
    assert abs(peak_scale - expected) <= 4


def test_ssqcwt_shape_and_energy():
    t = np.arange(2000) / SR
    x = jnp.asarray(np.sin(2 * np.pi * 400 * t).astype(np.float32))
    S = np.asarray(extract_ssqcwt(x, SR, widths=np.arange(1, 60)))
    assert S.shape == (59, 2000)
    assert np.all(np.isfinite(S)) and S.sum() > 0


def test_dense_helpers_and_normalize():
    Z = pad_to_dense_1d([np.ones(2), np.ones(4) * 3])
    assert Z.shape == (2, 4)
    np.testing.assert_array_equal(Z[0], [1, 1, 0, 0])

    Z2 = pad_to_dense_2d([np.ones((3, 2)), np.ones((3, 5))])
    assert Z2.shape == (2, 3, 5)

    d = normalize_dataset(jnp.asarray(np.random.default_rng(0).normal(
        2.0, 3.0, (100,)).astype(np.float32)))
    assert float(jnp.mean(d)) == pytest.approx(0.0, abs=1e-5)
    assert float(jnp.std(d)) == pytest.approx(1.0, abs=1e-4)


def test_mvn():
    x = jnp.asarray(np.random.default_rng(1).normal(5, 2, (50, 7))
                    .astype(np.float32))
    z = np.asarray(mvn(x))
    np.testing.assert_allclose(z.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(z.std(axis=0), 1, atol=1e-3)
