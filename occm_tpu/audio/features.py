"""DSP feature bank in pure JAX (reference: utils.py — C15, legacy path).

The reference wraps spafe/pywt/ssqueezepy (C/Fortran inside) for
LFCC/MFCC/BFCC/CQCC/LPC(C)/mel/CWT/SSQ-CWT extraction with a 30 ms / 15 ms
Hamming sliding window, pre-emphasis 0.97, nfft 2048 and MVN normalisation
(reference: utils.py:21-188). None of these feed the shipped entry points
(SURVEY.md §2 C15), so the contract here is capability (same feature
families, same framing conventions, jittable + vmappable on device), not
bit-parity with spafe.

Also includes the dense-padding helpers and dataset z-normalisation
(reference: utils.py:190-248).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- framing

def pre_emphasis(x: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    return jnp.concatenate([x[:1], x[1:] - coeff * x[:-1]])


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[T] -> [n_frames, frame_len] (drops the ragged tail)."""
    n_frames = max((x.shape[0] - frame_len) // hop + 1, 0)
    idx = (
        jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    )
    return x[idx]


def hamming(n: int) -> jnp.ndarray:
    return 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / (n - 1))


def stft_mag(x: jnp.ndarray, fs: int, win_s: float = 0.03,
             hop_s: float = 0.015, nfft: int = 2048,
             pre_emph: float = 0.97) -> jnp.ndarray:
    """|STFT| with the reference framing conventions -> [frames, nfft//2+1]."""
    if pre_emph:
        x = pre_emphasis(x, pre_emph)
    frame_len = int(round(win_s * fs))
    hop = int(round(hop_s * fs))
    frames = frame_signal(x, frame_len, hop) * hamming(frame_len)[None, :]
    return jnp.abs(jnp.fft.rfft(frames, nfft, axis=-1))


# ----------------------------------------------------------- filterbanks

def _hz_to_mel(f):
    return 2595.0 * jnp.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _hz_to_bark(f):
    return 6.0 * jnp.arcsinh(f / 600.0)


def _bark_to_hz(b):
    return 600.0 * jnp.sinh(b / 6.0)


def _triangular_fb(n_filts: int, nfft: int, fs: int, low: float, high: float,
                   scale: str) -> jnp.ndarray:
    """[n_filts, nfft//2+1] triangular filters on a warped axis."""
    if scale == "mel":
        fwd, inv = _hz_to_mel, _mel_to_hz
    elif scale == "bark":
        fwd, inv = _hz_to_bark, _bark_to_hz
    else:  # linear
        fwd = inv = lambda f: f
    pts = inv(jnp.linspace(fwd(jnp.float32(low)), fwd(jnp.float32(high)),
                           n_filts + 2))
    bins = jnp.fft.rfftfreq(nfft, 1.0 / fs)
    left = pts[:-2][:, None]
    centre = pts[1:-1][:, None]
    right = pts[2:][:, None]
    up = (bins[None, :] - left) / jnp.maximum(centre - left, 1e-8)
    down = (right - bins[None, :]) / jnp.maximum(right - centre, 1e-8)
    return jnp.clip(jnp.minimum(up, down), 0.0, 1.0)


def _dct_ii(x: jnp.ndarray, n_out: Optional[int] = None) -> jnp.ndarray:
    """Orthonormal DCT-II along the last axis."""
    n = x.shape[-1]
    k = jnp.arange(n_out if n_out else n)[:, None]
    m = jnp.arange(n)[None, :]
    basis = jnp.cos(jnp.pi * k * (2 * m + 1) / (2 * n))
    scale = jnp.where(k == 0, jnp.sqrt(1.0 / n), jnp.sqrt(2.0 / n))
    return x @ (basis * scale).T


def mvn(feats: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-coefficient mean-variance normalisation (spafe normalize='mvn')."""
    mu = jnp.mean(feats, axis=0, keepdims=True)
    sd = jnp.std(feats, axis=0, keepdims=True)
    return (feats - mu) / jnp.maximum(sd, eps)


def _cepstra(x, fs, n_filts, scale, n_ceps, nfft, low, high, normalize,
             pre_emph):
    mag = stft_mag(x, fs, nfft=nfft, pre_emph=pre_emph)
    fb = _triangular_fb(n_filts, nfft, fs, low, high, scale)
    energies = jnp.maximum(mag**2 @ fb.T, 1e-10)
    ceps = _dct_ii(jnp.log(energies), n_ceps)
    return mvn(ceps) if normalize else ceps


def extract_lfcc(y, sr, n_filts: int = 128, n_ceps: int = 13,
                 nfft: int = 2048, low: float = 0.0, high: float = 8000.0,
                 normalize: bool = True, pre_emph: float = 0.97):
    """Linear-frequency cepstra (reference: utils.py:127-138 config)."""
    return _cepstra(y, sr, n_filts, "linear", n_ceps, nfft, low, high,
                    normalize, pre_emph)


def extract_mfcc(y, sr, n_filts: int = 1024, n_ceps: int = 13,
                 nfft: int = 2048, low: float = 0.0, high: float = 8000.0,
                 normalize: bool = True, pre_emph: float = 0.97):
    """Mel-frequency cepstra (reference: utils.py:55-66 calls spafe with
    nfilts=1024, nfft=2048 — defaults mirror that call)."""
    return _cepstra(y, sr, n_filts, "mel", n_ceps, nfft, low, high,
                    normalize, pre_emph)


def extract_bfcc(y, sr, n_filts: int = 1024, n_ceps: int = 13,
                 nfft: int = 2048, low: float = 0.0, high: float = 8000.0,
                 normalize: bool = True, pre_emph: float = 0.97):
    """Bark-frequency cepstra (reference: utils.py:21-32 config)."""
    return _cepstra(y, sr, n_filts, "bark", n_ceps, nfft, low, high,
                    normalize, pre_emph)


def extract_mel(y, sr, n_filts: int = 1024, nfft: int = 2048,
                low: float = 0.0, high: float = 8000.0,
                pre_emph: float = 0.97):
    """Mel spectrogram (reference: utils.py:68-78)."""
    mag = stft_mag(y, sr, nfft=nfft, pre_emph=pre_emph)
    fb = _triangular_fb(n_filts, nfft, sr, low, high, "mel")
    return mag**2 @ fb.T


# ------------------------------------------------------------------- LPC

def extract_lpc(y, sr, order: int = 13, win_s: float = 0.03,
                hop_s: float = 0.015) -> jnp.ndarray:
    """Frame-wise LPC via Levinson-Durbin (reference: utils.py:165-172).

    Returns [frames, order+1] with a0 = 1.
    """
    frame_len = int(round(win_s * sr))
    hop = int(round(hop_s * sr))
    frames = frame_signal(y, frame_len, hop) * hamming(frame_len)[None, :]

    def autocorr(f):
        fpad = jnp.concatenate([f, jnp.zeros_like(f)])
        spec = jnp.abs(jnp.fft.rfft(fpad)) ** 2
        r = jnp.fft.irfft(spec)[: order + 1]
        return r

    def levinson(r):
        a = jnp.zeros(order + 1).at[0].set(1.0)
        err = jnp.maximum(r[0], 1e-10)

        def body(i, carry):
            a, err = carry
            # acc = sum_{j=1..i-1} a[j] * r[i-j]
            rev = jnp.where(
                (jnp.arange(order + 1) >= 1) & (jnp.arange(order + 1) <= i - 1),
                a * r[jnp.clip(i - jnp.arange(order + 1), 0, order)],
                0.0,
            )
            k = -(r[i] + jnp.sum(rev)) / err
            # a_new[j] = a[j] + k * a[i-j]
            a_flip = a[jnp.clip(i - jnp.arange(order + 1), 0, order)]
            mask = (jnp.arange(order + 1) >= 1) & (jnp.arange(order + 1) <= i)
            a = jnp.where(mask, a + k * a_flip, a)
            a = a.at[i].set(k)
            err = err * (1.0 - k * k)
            return a, jnp.maximum(err, 1e-10)

        a, err = jax.lax.fori_loop(1, order + 1, body, (a, err))
        return a

    return jax.vmap(lambda f: levinson(autocorr(f)))(frames)


def extract_lpcc(y, sr, order: int = 13, **kwargs) -> jnp.ndarray:
    """LPC cepstra from LPC coefficients (reference: utils.py:47-53)."""
    a = extract_lpc(y, sr, order=order, **kwargs)  # [F, order+1]

    def lpc_to_cep(ai):
        c = jnp.zeros(order + 1)

        def body(n, c):
            # c[n] = -a[n] - sum_{k=1..n-1} (k/n) c[k] a[n-k]
            k = jnp.arange(order + 1)
            inner = jnp.where(
                (k >= 1) & (k <= n - 1),
                (k / n) * c * ai[jnp.clip(n - k, 0, order)],
                0.0,
            )
            return c.at[n].set(-ai[n] - jnp.sum(inner))

        return jax.lax.fori_loop(1, order + 1, body, c)

    return jax.vmap(lpc_to_cep)(a)


# ------------------------------------------------------------------ CQCC

def extract_cqcc(y, sr, n_bins: int = 96, bins_per_octave: int = 12,
                 fmin: float = 15.625, n_ceps: int = 13, hop_s: float = 0.015,
                 normalize: bool = True) -> jnp.ndarray:
    """Constant-Q cepstral coefficients (reference: utils.py:34-45).

    FFT-based CQT: per-bin windowed complex kernels on the rfft grid,
    log power, DCT — the standard CQCC recipe.
    """
    hop = int(round(hop_s * sr))
    nfft = 2048
    mag = stft_mag(y, sr, win_s=nfft / sr, hop_s=hop_s, nfft=nfft,
                   pre_emph=0.97)
    freqs = np.fft.rfftfreq(nfft, 1.0 / sr)
    centres = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    # gaussian-ish constant-Q bands on the linear grid
    bw = centres / q
    fb = np.exp(
        -0.5 * ((freqs[None, :] - centres[:, None]) / (bw[:, None] / 2)) ** 2
    )
    fb /= np.maximum(fb.sum(axis=1, keepdims=True), 1e-8)
    energies = jnp.maximum(mag**2 @ jnp.asarray(fb, mag.dtype).T, 1e-10)
    ceps = _dct_ii(jnp.log(energies), n_ceps)
    return mvn(ceps) if normalize else ceps


# ------------------------------------------------------------------- CWT

def extract_cwt(y, sr: int = 16000, widths: Optional[np.ndarray] = None,
                w0: float = 5.0) -> jnp.ndarray:
    """Morlet continuous wavelet transform (reference: utils.py:84-96):
    FFT-based convolution with scaled morlet atoms -> [n_scales, T]."""
    if widths is None:
        widths = np.arange(1, 301, 1)
    n = y.shape[0]
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    yf = jnp.fft.fft(y, nfft)
    omega = jnp.fft.fftfreq(nfft) * 2 * jnp.pi  # rad/sample

    scales = jnp.asarray(widths, jnp.float32)
    # morlet in frequency domain: pi^-1/4 sqrt(2) exp(-(s*w - w0)^2 / 2), w>0
    sw = scales[:, None] * omega[None, :]
    kernel = (
        (jnp.pi ** -0.25)
        * jnp.sqrt(2 * jnp.pi * scales[:, None])
        * jnp.exp(-0.5 * (sw - w0) ** 2)
        * (omega[None, :] > 0)
    )
    out = jnp.fft.ifft(yf[None, :] * kernel, axis=-1)[:, :n]
    return out


def extract_ssqcwt(y, sr: int = 16000, widths: Optional[np.ndarray] = None,
                   w0: float = 5.0, n_freq_bins: Optional[int] = None
                   ) -> jnp.ndarray:
    """Synchrosqueezed CWT (reference: utils.py:80-82,113-115):
    reassign CWT energy to the instantaneous-frequency bin."""
    if widths is None:
        widths = np.arange(1, 301, 1)
    W = extract_cwt(y, sr, widths, w0)  # [S, T]
    n = y.shape[0]
    # instantaneous frequency via the phase derivative (central diff)
    phase = jnp.angle(W)
    dphase = (jnp.roll(phase, -1, axis=1) - jnp.roll(phase, 1, axis=1)) / 2.0
    dphase = (dphase + jnp.pi) % (2 * jnp.pi) - jnp.pi
    inst_freq = jnp.abs(dphase) / (2 * jnp.pi)  # cycles/sample

    n_bins = n_freq_bins or len(widths)
    fmax = 0.5
    bin_idx = jnp.clip(
        (inst_freq / fmax * (n_bins - 1)).astype(jnp.int32), 0, n_bins - 1
    )
    mag = jnp.abs(W)

    def squeeze_col(bins_col, mag_col):
        return jnp.zeros(n_bins).at[bins_col].add(mag_col)

    return jax.vmap(squeeze_col, in_axes=(1, 1), out_axes=1)(bin_idx, mag)


# --------------------------------------------------------- dense helpers

def pad_to_dense_1d(arrays) -> np.ndarray:
    """reference: utils.py:190-199 (+= semantics kept)."""
    maxlen = max(len(r) for r in arrays)
    out = np.zeros((len(arrays), maxlen))
    for i, row in enumerate(arrays):
        out[i, : len(row)] += row
    return out


def pad_to_dense_2d(arrays) -> np.ndarray:
    """reference: utils.py:217-229 (pad trailing columns)."""
    max_cols = max(a.shape[1] for a in arrays)
    rows = arrays[0].shape[0]
    out = np.zeros((len(arrays), rows, max_cols))
    for i, a in enumerate(arrays):
        out[i, :, : a.shape[1]] = a
    return out


def normalize_dataset(dataset: jnp.ndarray) -> jnp.ndarray:
    """Global z-normalisation (reference: utils.py:231-248 intent)."""
    mu = jnp.mean(dataset)
    sd = jnp.std(dataset)
    return (dataset - mu) / jnp.maximum(sd, 1e-8)
