"""RawBoost raw-waveform augmentation as fused on-device JAX ops.

Behavioural parity targets (reference: RawBoost.py, dispatcher
data_utils_SSL.py:111-173):

1. LnL convolutive noise (RawBoost.py:59-69): N_f random band-stop ("notch")
   FIR cascades applied to successive powers x^(i+1), summed, demeaned,
   peak-normalised.
2. ISD impulsive signal-dependent noise (RawBoost.py:73-84): a uniform
   n-subset of samples gets signal-proportional impulses.
3. SSI stationary coloured additive noise (RawBoost.py:89-97): white noise
   shaped by a random notch cascade, scaled to a random SNR.

The reference runs this per-utterance in NumPy/scipy on a dataloader worker —
the #1 host bottleneck (SURVEY.md §3.4). Here every step is expressed with
static shapes so the whole augmentation jits, vmaps over the batch, and fuses
into the device input pipeline:

- scipy.signal.firwin's variable tap count `c` becomes a fixed
  (maxCoeff+1)-tap buffer with a validity mask; the window and ideal response
  are computed for the traced `c`.
- the filter cascade (np.convolve chain, RawBoost.py:43) keeps a fixed
  nBands*(maxCoeff+1) buffer; real support is tracked as a traced scalar.
- scipy.signal.freqz(b)'s 512-point response (RawBoost.py:46) is the first
  512 bins of a 1024-point FFT — identical sampling.
- lfilter + centre-crop (RawBoost.py:51-56) becomes FFT convolution plus a
  dynamic slice at the traced group delay.
- np.random draws become explicit jax.random keys (deterministic,
  splittable — fixes the reference's unseeded global RNG).

All waveform statistics (mean, peak, norms) honour a traced valid `length`, so
augmenting zero-padded fixed-shape buffers matches augmenting the unpadded
variable-length signal.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from occm_tpu.config import RawBoostConfig

_FFT_FREQZ = 1024  # 2 * 512 -> scipy freqz default worN=512 grid


def _valid_mask(n: int, length, dtype=jnp.float32):
    return (jnp.arange(n) < length).astype(dtype)


def norm_wav(x: jnp.ndarray, always: bool, length=None) -> jnp.ndarray:
    """Peak normalisation (reference: RawBoost.py:20-25).

    always=True: divide by max |x|; else only when the peak exceeds 1.
    """
    if length is None:
        peak = jnp.max(jnp.abs(x))
    else:
        peak = jnp.max(jnp.abs(x) * _valid_mask(x.shape[0], length, x.dtype))
    peak = jnp.maximum(peak, jnp.finfo(x.dtype).tiny)
    if always:
        return x / peak
    return jnp.where(peak > 1.0, x / peak, x)


def _rand_range(key, lo, hi):
    """uniform in [lo, hi) computed as lo + (hi - lo) * u, which also matches
    np.random.uniform's behaviour when lo > hi (reference: RawBoost.py:14-18
    via the i==1 gain-bias flip at RawBoost.py:62-64)."""
    u = jax.random.uniform(key, ())
    return lo + (hi - lo) * u


def firwin_bandstop(c, f1, f2, fs: float, max_taps: int) -> jnp.ndarray:
    """Hamming-window band-stop FIR design, scipy.signal.firwin-compatible.

    The reference calls firwin(c, [f1, f2], window='hamming', fs=fs) with the
    default pass_zero=True (reference: RawBoost.py:43), i.e. a *notch*: the
    passbands are [0, f1] and [f2, Nyquist].

    c may be a traced odd tap count <= max_taps; taps beyond c are zero.
    Returns a [max_taps] buffer.
    """
    c = c.astype(jnp.float32) if hasattr(c, "astype") else jnp.float32(c)
    n = jnp.arange(max_taps, dtype=jnp.float32)
    mask = (n < c).astype(jnp.float32)
    alpha = 0.5 * (c - 1.0)
    m = n - alpha

    nyq = fs / 2.0
    f1n = f1 / nyq
    f2n = f2 / nyq

    # ideal response: passband [0,f1n] + passband [f2n,1]
    h = f1n * jnp.sinc(f1n * m) + jnp.sinc(m) - f2n * jnp.sinc(f2n * m)

    # symmetric Hamming window of length c on the first c taps
    win = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / jnp.maximum(c - 1.0, 1.0))
    h = h * win * mask

    # pass_zero=True -> unity gain at DC: divide by the tap sum
    s = jnp.sum(h)
    return h / s


def notch_from_draws(fcs, bws, cs, G, fs: float, max_taps: int,
                     bank_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic core of genNotchCoeffs (reference: RawBoost.py:28-48)
    given the random draws: centre freqs, bandwidths, (odd) tap counts and the
    gain G in dB.

    Returns (b[bank_len], support) where support = sum(cs) - (nBands-1) is the
    true coefficient count of the cascade.
    """
    n_bands = fcs.shape[0]
    b = jnp.zeros((bank_len,), jnp.float32).at[0].set(1.0)
    for i in range(n_bands):
        f1 = fcs[i] - bws[i] / 2.0
        f2 = fcs[i] + bws[i] / 2.0
        f1 = jnp.where(f1 <= 0.0, 1.0 / 1000.0, f1)
        f2 = jnp.where(f2 >= fs / 2.0, fs / 2.0 - 1.0 / 1000.0, f2)
        h = firwin_bandstop(cs[i], f1, f2, fs, max_taps)
        b = jnp.convolve(b, h, mode="full")[:bank_len]

    support = jnp.sum(cs) - (n_bands - 1)

    # freqz peak normalisation + dB gain (reference: RawBoost.py:45-47);
    # 512 points over [0, pi) == first half of a 1024-point FFT
    H = jnp.fft.fft(b, _FFT_FREQZ)[: _FFT_FREQZ // 2]
    b = (10.0 ** (G / 20.0)) * b / jnp.max(jnp.abs(H))
    return b, support


def gen_notch_coeffs(key, cfg: RawBoostConfig, min_g: float, max_g: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random notch-filter cascade (reference: RawBoost.py:28-48)."""
    max_taps = cfg.maxCoeff + 1
    bank_len = cfg.nBands * max_taps
    keys = jax.random.split(key, 3 * cfg.nBands + 1)

    fcs, bws, cs = [], [], []
    for i in range(cfg.nBands):
        fcs.append(_rand_range(keys[3 * i], cfg.minF, cfg.maxF))
        bws.append(_rand_range(keys[3 * i + 1], cfg.minBW, cfg.maxBW))
        c = jnp.floor(
            _rand_range(keys[3 * i + 2], cfg.minCoeff, cfg.maxCoeff)
        ).astype(jnp.int32)
        # force odd tap count (reference: RawBoost.py:35-36)
        c = jnp.where(c % 2 == 0, c + 1, c)
        cs.append(c)
    G = _rand_range(keys[-1], min_g, max_g)

    return notch_from_draws(
        jnp.stack(fcs), jnp.stack(bws), jnp.stack(cs), G,
        float(cfg.fs), max_taps, bank_len,
    )


def fir_filter_centered(x: jnp.ndarray, b: jnp.ndarray, support) -> jnp.ndarray:
    """Zero-phase-centred FIR application (reference: RawBoost.py:51-56).

    The reference pads x by N = len(b)+1, runs lfilter, then crops
    [N/2 : -N/2] — i.e. takes full_conv(x, b)[(support+1)//2 :][:len(x)].
    `support` (the true coefficient count) may be traced.
    """
    L = x.shape[0]
    full = jnp.convolve(x, b, mode="full")  # [L + bank_len - 1]
    offset = ((support + 1) // 2).astype(jnp.int32)
    # pad so the dynamic slice is always in range
    padded = jnp.pad(full, (0, b.shape[0]))
    return jax.lax.dynamic_slice(padded, (offset,), (L,))


def lnl_convolutive_noise(key, x: jnp.ndarray, cfg: RawBoostConfig,
                          length=None) -> jnp.ndarray:
    """Linear & non-linear convolutive noise (reference: RawBoost.py:59-69).

    Applies an independent random notch cascade to each power x^(i+1),
    i < N_f; from i == 1 onward the gain range is lowered by the
    LinNonLin bias (the reference mutates minG/maxG in the loop).
    """
    L = x.shape[0]
    mask = _valid_mask(L, length, x.dtype) if length is not None else None
    keys = jax.random.split(key, cfg.N_f)

    y = jnp.zeros_like(x)
    min_g, max_g = float(cfg.minG), float(cfg.maxG)
    for i in range(cfg.N_f):
        if i == 1:
            min_g = min_g - cfg.minBiasLinNonLin
            max_g = max_g - cfg.maxBiasLinNonLin
        b, support = gen_notch_coeffs(keys[i], cfg, min_g, max_g)
        xi = x ** (i + 1)
        if mask is not None:
            xi = xi * mask
        y = y + fir_filter_centered(xi, b, support)

    if mask is not None:
        y = y * mask
        n = jnp.maximum(length, 1).astype(x.dtype)
        y = (y - jnp.sum(y) / n) * mask
        return norm_wav(y, always=False, length=length)
    y = y - jnp.mean(y)
    return norm_wav(y, always=False)


def _n_smallest_mask(u: jnp.ndarray, n_sel) -> jnp.ndarray:
    """mask[i] = 1 iff u[i] is among the n_sel smallest entries of u
    (non-negative floats; ties broken by index, matching a stable argsort).

    Sort-free: positive IEEE-754 floats order like their bit patterns, so a
    31-step integer bisection finds m* = the smallest bit pattern with
    count(bits < m*) >= n_sel. Each step is one compare+reduce over u —
    O(31·L) bandwidth instead of an O(L log L) sort, which dominated the
    whole RawBoost pipeline on TPU (the [96, 64600] argsort alone cost more
    than every filter in the LnL cascade combined — measured r4,
    tools/bench_rawboost.py).
    """
    bits = jax.lax.bitcast_convert_type(u.astype(jnp.float32), jnp.int32)
    n_sel = jnp.asarray(n_sel, jnp.int32)

    def step(carry, _):
        lo, hi = carry
        mid = lo + ((hi - lo) >> 1)  # (lo+hi)/2 overflows int32 here
        ge = jnp.sum(bits < mid) >= n_sel
        return (jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)), None

    # u <= 2.0 (masked lanes use 2.0), so every pattern is < 0x40000001
    (m_star, _), _ = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(0x40000001)), None, length=31
    )
    v_bits = m_star - 1  # bit pattern of the boundary value
    below = bits < v_bits
    ties = bits == v_bits
    k_rem = n_sel - jnp.sum(below)
    sel = below | (ties & (jnp.cumsum(ties.astype(jnp.int32)) <= k_rem))
    return sel


def isd_additive_noise(key, x: jnp.ndarray, cfg: RawBoostConfig,
                       length=None) -> jnp.ndarray:
    """Impulsive signal-dependent noise (reference: RawBoost.py:73-84).

    A uniform subset of n = floor(L * beta / 100) samples receives
    r = g_sd * x * f_r with f_r a product of two centred uniforms. Subset
    selection reproduces `np.random.permutation(L)[:n]` via rank-of-uniform:
    sample u ~ U(0,1)^L and keep the n smallest (restricted to the valid
    region when `length` is given), found sort-free by `_n_smallest_mask`.
    """
    L = x.shape[0]
    k_beta, k_perm, k_f1, k_f2 = jax.random.split(key, 4)

    beta = _rand_range(k_beta, 0.0, float(cfg.P))
    n_valid = (
        jnp.asarray(L, jnp.float32) if length is None
        else length.astype(jnp.float32)
    )
    n_sel = jnp.floor(n_valid * beta / 100.0).astype(jnp.int32)

    u = jax.random.uniform(k_perm, (L,))
    if length is not None:
        u = jnp.where(jnp.arange(L) < length, u, 2.0)  # invalid ranks last
    selected = _n_smallest_mask(u, n_sel).astype(x.dtype)

    f_r = (2.0 * jax.random.uniform(k_f1, (L,)) - 1.0) * (
        2.0 * jax.random.uniform(k_f2, (L,)) - 1.0
    )
    y = x + selected * float(cfg.g_sd) * x * f_r
    return norm_wav(y, always=False, length=length)


def ssi_additive_noise(key, x: jnp.ndarray, cfg: RawBoostConfig,
                       length=None) -> jnp.ndarray:
    """Stationary signal-independent coloured noise at random SNR
    (reference: RawBoost.py:89-97). Note: no final peak normalisation."""
    L = x.shape[0]
    k_noise, k_b, k_snr = jax.random.split(key, 3)
    mask = _valid_mask(L, length, x.dtype) if length is not None else None

    noise = jax.random.normal(k_noise, (L,), x.dtype)
    if mask is not None:
        noise = noise * mask
    b, support = gen_notch_coeffs(
        k_b, cfg, float(cfg.minG), float(cfg.maxG)
    )
    noise = fir_filter_centered(noise, b, support)
    if mask is not None:
        noise = noise * mask
    noise = norm_wav(noise, always=True, length=length)

    snr = _rand_range(k_snr, float(cfg.SNRmin), float(cfg.SNRmax))
    noise_norm = jnp.sqrt(jnp.sum(noise * noise))
    x_norm = jnp.sqrt(jnp.sum(x * x)) if mask is None else jnp.sqrt(
        jnp.sum(x * x * mask)
    )
    noise = noise / jnp.maximum(noise_norm, 1e-20) * x_norm / (
        10.0 ** (0.05 * snr)
    )
    return x + noise


def process_rawboost(key, x: jnp.ndarray, cfg: RawBoostConfig,
                     length=None) -> jnp.ndarray:
    """Algorithm dispatcher 0-8 (reference: data_utils_SSL.py:111-173).

    `cfg.algo` is static, so each algo compiles to its own fused program.
    """
    algo = cfg.algo
    if algo == 1:
        return lnl_convolutive_noise(key, x, cfg, length)
    if algo == 2:
        return isd_additive_noise(key, x, cfg, length)
    if algo == 3:
        return ssi_additive_noise(key, x, cfg, length)
    if algo == 4:  # series 1+2+3
        k1, k2, k3 = jax.random.split(key, 3)
        x = lnl_convolutive_noise(k1, x, cfg, length)
        x = isd_additive_noise(k2, x, cfg, length)
        return ssi_additive_noise(k3, x, cfg, length)
    if algo == 5:  # series 1+2
        k1, k2 = jax.random.split(key, 2)
        x = lnl_convolutive_noise(k1, x, cfg, length)
        return isd_additive_noise(k2, x, cfg, length)
    if algo == 6:  # series 1+3
        k1, k2 = jax.random.split(key, 2)
        x = lnl_convolutive_noise(k1, x, cfg, length)
        return ssi_additive_noise(k2, x, cfg, length)
    if algo == 7:  # series 2+3
        k1, k2 = jax.random.split(key, 2)
        x = isd_additive_noise(k1, x, cfg, length)
        return ssi_additive_noise(k2, x, cfg, length)
    if algo == 8:  # parallel 1||2
        k1, k2 = jax.random.split(key, 2)
        y = lnl_convolutive_noise(k1, x, cfg, length) + isd_additive_noise(
            k2, x, cfg, length
        )
        return norm_wav(y, always=False, length=length)
    return x


@partial(jax.jit, static_argnames=("cfg",))
def batch_rawboost(key, x: jnp.ndarray, cfg: RawBoostConfig,
                   lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused batched RawBoost: x [B, T] (+ optional valid lengths [B]) with an
    independent key per utterance. One compiled program per (T, algo)."""
    keys = jax.random.split(key, x.shape[0])
    if lengths is None:
        return jax.vmap(lambda k, xi: process_rawboost(k, xi, cfg))(keys, x)
    return jax.vmap(lambda k, xi, li: process_rawboost(k, xi, cfg, li))(
        keys, x, lengths
    )
