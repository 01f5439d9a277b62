"""Standalone reproducer: the attention-backward emitter floor at the
bench shape (DESIGN.md r3 audit; VERDICT r3 weak #2 asked for a replayable
artifact a third party / Mosaic owner can run without this repo).

One attention dot chain at the XLSR-300M bench shape — BH=1536 pairs
(batch 96 x 16 heads), T=201 frames, D=64 head dim, bf16 operands, fp32
softmax — timed forward and forward+grad under plain jit, against the
machine rate of ONE large clean dot of comparable arithmetic. Also runs
T=256 (the padded shape class) so the odd-shape tiling penalty is
separable from per-small-dot overhead.

Expected on TPU v5e (r4 measurement recorded in DESIGN.md): the 4
backward dots ([201,201]x[201,64] class) run ~5x off the big-dot rate;
the gap is the emitter floor three kernel generations could not beat.

Usage: python tools/repro_attn_bwd.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    BH, D, R = 1536, 64, 8
    gen = np.random.default_rng(0)
    scales = jnp.asarray(np.linspace(0.9, 1.1, R).astype(np.float32))

    def bench(fn, *args):
        out = fn(*args, scales)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args, scales)
        np.asarray(out)  # host read: tunnel block_until_ready is async
        return (time.perf_counter() - t0) / (3 * R)

    def attention(q, k, v):
        # bf16 logits/softmax: the bench config's fast-numerics path
        # (norm_dtype="bfloat16"); the backward-dot floor is identical
        # under fp32 softmax, the forward is ~0.4 ms/layer slower there
        logits = jnp.einsum("zqd,zkd->zqk", q, k,
                            preferred_element_type=jnp.bfloat16) * (D ** -0.5)
        p = jax.nn.softmax(logits, -1).astype(q.dtype)
        return jnp.einsum("zqk,zkd->zqd", p, v)

    def run_shape(T):
        q0 = jnp.asarray(gen.normal(size=(BH, T, D)) * 0.1, jnp.bfloat16)
        k0 = jnp.asarray(gen.normal(size=(BH, T, D)) * 0.1, jnp.bfloat16)
        v0 = jnp.asarray(gen.normal(size=(BH, T, D)) * 0.1, jnp.bfloat16)

        @jax.jit
        def fwd(q, k, v, scales):
            def body(c, s):
                # cast the scale: a bf16 * fp32-scalar multiply promotes the
                # whole operand to fp32 and the MXU runs a 3-pass fp32 dot
                qs = q * s.astype(q.dtype)
                return c + attention(qs, k, v).astype(jnp.float32).mean(), None
            return lax.scan(body, 0.0, scales)[0]

        @jax.jit
        def fwd_bwd(q, k, v, scales):
            g = jax.grad(
                lambda qkv, s: attention(
                    qkv[0] * s.astype(q.dtype), qkv[1], qkv[2]
                ).astype(jnp.float32).mean()
            )
            def body(c, s):
                gq, gk, gv = g((q, k, v), s)
                return c + (gq.astype(jnp.float32).mean()
                            + gk.astype(jnp.float32).mean()
                            + gv.astype(jnp.float32).mean()), None
            return lax.scan(body, 0.0, scales)[0]

        f_fwd = 4 * BH * T * T * D          # 2 dots x 2 FLOP/MAC
        f_tot = 12 * BH * T * T * D         # + 4 backward dots
        t_f = bench(fwd, q0, k0, v0)
        t_t = bench(fwd_bwd, q0, k0, v0)
        print(f"RESULT T={T}: fwd {t_f * 1e3:.3f} ms ({f_fwd / t_f / 1e12:.1f}"
              f" TF/s)  fwd+grad {t_t * 1e3:.3f} ms"
              f" ({f_tot / t_t / 1e12:.1f} TF/s)"
              f"  bwd-only ~{(t_t - t_f) * 1e3:.3f} ms"
              f" ({(f_tot - f_fwd) / max(t_t - t_f, 1e-9) / 1e12:.1f} TF/s)")
        return (f_tot - f_fwd) / max(t_t - t_f, 1e-9) / 1e12

    # machine rate: one big clean dot, same dtype discipline. 8192^3: the
    # 4096^3 point still pays ~0.9 ms of fixed+HBM cost (74 vs 160 TF/s
    # measured) and under-states the roof
    M = 8192
    a = jnp.asarray(gen.normal(size=(M, M)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(gen.normal(size=(M, M)) * 0.1, jnp.bfloat16)

    @jax.jit
    def big(a, b, scales):
        def body(c, s):
            o = jnp.dot(a * s.astype(a.dtype), b,
                        preferred_element_type=jnp.float32)
            return c + o.mean(), None
        return lax.scan(body, 0.0, scales)[0]

    t_big = bench(big, a, b)
    rate_big = 2 * M ** 3 / t_big / 1e12
    print(f"RESULT big dot [{M},{M}]x[{M},{M}]: {t_big * 1e3:.3f} ms "
          f"({rate_big:.1f} TF/s) <- machine rate")
    for T in (201, 256):
        rate = run_shape(T)
        print(f"  -> T={T} backward dots at {rate / rate_big * 100:.0f}% "
              f"of machine rate")


if __name__ == "__main__":
    main()
