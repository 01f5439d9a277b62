"""Formulations of the wav2vec2 relative positional conv (k=128, g=16).

The r3 full-step audit (DESIGN.md) measured this op at ~63 TF/s through
XLA's grouped-conv emitter — the 64-deep per-group contraction leaves half
the MXU lanes idle. Same math, three layouts (parity-tested against each
other in tests/test_xlsr_extras.py and tools/exp_pos_conv.py):

  grouped   lax grouped conv, feature_group_count=G (canonical)
  batched   groups folded into the batch dim via batch_group_count=G
  s2d       space-to-depth: T -> T/S positions x S-tap channel blocks, so
            each of the K/S+1 taps contracts S*(C/G) channels per group
            (512 for XLSR) instead of C/G (64) — the classic TPU stem-conv
            trick. ~6% more FLOPs, full lane occupancy. The kernel is
            regathered from the canonical [K, C/G, C] layout every call
            (it must be — the weights train), so the gather and its
            scatter-add VJP are part of the formulation's cost.

All take the canonical weight layout [K, C/G, C] (Flax nn.Conv grouped
layout), so the checkpoint tree is identical across impls. SamePad
cropping (fairseq drops the trailing output for even K) is done by the
caller. Reference compute being re-laid-out: the fairseq wav2vec2
`pos_conv` the reference loads through models/xlsr.py:29-30.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NWC", "WIO", "NWC"))


def pos_conv_grouped(x: jnp.ndarray, w: jnp.ndarray, groups: int
                     ) -> jnp.ndarray:
    """[B,T,C] x [K, C/G, C] -> [B,T',C] grouped conv, SAME-ish padding."""
    k = w.shape[0]
    pad = k // 2
    return lax.conv_general_dilated(
        x, w, (1,), ((pad, pad),), dimension_numbers=_DN,
        feature_group_count=groups)


def pos_conv_batched(x: jnp.ndarray, w: jnp.ndarray, groups: int
                     ) -> jnp.ndarray:
    """Groups folded into the batch dim (XLA batch_group_count): batch
    group g convolves channel block g against filter block g."""
    b, t, c = x.shape
    cp = c // groups
    k = w.shape[0]
    pad = k // 2
    xg = (x.reshape(b, t, groups, cp)
           .transpose(2, 0, 1, 3)
           .reshape(groups * b, t, cp))
    return lax.conv_general_dilated(
        xg, w, (1,), ((pad, pad),), dimension_numbers=_DN,
        batch_group_count=groups)


@functools.lru_cache(maxsize=None)
def _s2d_tap_index(k: int, s: int):
    """tap = s*m + j - r for (m, j, r); mask where outside [0, k)."""
    m_taps = (k - 1 + s - 1) // s + 1
    m = np.arange(m_taps)[:, None, None]
    j = np.arange(s)[None, :, None]
    r = np.arange(s)[None, None, :]
    tap = s * m + j - r
    valid = (tap >= 0) & (tap < k)
    return np.where(valid, tap, 0), valid, m_taps


def pos_conv_s2d(x: jnp.ndarray, w: jnp.ndarray, groups: int, s: int = 8
                 ) -> jnp.ndarray:
    """Space-to-depth formulation: out == pos_conv_grouped(x, w, groups)
    up to fp reassociation; the conv runs over T/s positions with
    s*(C/G)-deep per-group contraction."""
    b, t, c = x.shape
    cp = c // groups
    k = w.shape[0]
    pad = k // 2
    idx, valid, m_taps = _s2d_tap_index(k, s)
    sp = -(-t // s)                       # ceil(T/s) output blocks
    rpad = s * sp - t
    xp = jnp.pad(x, ((0, 0), (pad, pad + rpad), (0, 0)))
    ts = xp.shape[1] // s
    # u[b, s_pos, (g, j, ciw)] — group-major channels so
    # feature_group_count splits contiguously
    u = (xp.reshape(b, ts, s, groups, cp)
           .transpose(0, 1, 3, 2, 4)
           .reshape(b, ts, groups * s * cp))
    # W2[m, (j, ciw), (g, r, cow)] = w[s*m + j - r, ciw, g*cp + cow]
    wg = w[jnp.asarray(idx)]              # [M, s(j), s(r), cp, C]
    wg = jnp.where(jnp.asarray(valid)[..., None, None], wg, 0)
    w2 = (wg.reshape(m_taps, s, s, cp, groups, cp)
            .transpose(0, 1, 3, 4, 2, 5)
            .reshape(m_taps, s * cp, groups * s * cp))
    out = lax.conv_general_dilated(
        u, w2, (1,), "VALID", dimension_numbers=_DN,
        feature_group_count=groups)
    sout = out.shape[1]
    out = (out.reshape(b, sout, groups, s, cp)
              .transpose(0, 1, 3, 2, 4)
              .reshape(b, sout * s, c))
    # positions may differ from the grouped impl's t+1-(k%2) by the s2d
    # block rounding; all impls agree on the first t positions and the
    # model crops to t (SamePad) anyway
    return out[:, :t, :]


POS_CONV_IMPLS = {
    "grouped": pos_conv_grouped,
    "batched": pos_conv_batched,
    "s2d": pos_conv_s2d,
}
