"""Per-bucket attention-impl auto-selection for full-length scoring.

The reference scores FULL-LENGTH audio (reference: oc_classifier.py:93-94
loads without truncation), so the scoring path sees transformer lengths
from T=201 (4 s) to T=2000+ (40 s DF clips). No single attention layout
wins across that range: the XLA einsum path wins the short shapes (the
r2-r4 ledger — per-dot issue overhead dominates 64-deep contractions),
while the Pallas kernels win once the PV contraction is >=512 deep
(whole-T kernel to T<=512, the r5 blocked online-softmax kernel above;
measured table in DESIGN.md §long-T, produced by tools/bench_longT.py).

``attention_impl="auto"`` resolves per bucket through this policy in
BucketedEmbedder / ScoringService / the scoring CLIs. The policy is a
pure function of the bucket's sample length so the choice is
deterministic and the scores for a given utterance depend only on its
bucket — byte-identical to running the chosen impl directly
(tests/test_impl_select.py).
"""

from __future__ import annotations

SR = 16000

#: Bucket sample-count at and above which "flash" (the Pallas kernel
#: family) replaces "xla" under EXACT numerics. Set from the measured
#: v5e sweep (tools/bench_longT.py, DESIGN.md r5 long-T table): xla wins
#: 4 s (597.8 vs 545.6 utt/s), flash wins 10 s (+12%), 20 s (+5%,
#: blocked kernel) and 40 s (+11%, blocked kernel); the crossover sits
#: between 4 and 10 s, so the threshold is the first bucket boundary
#: past 4 s.
AUTO_FLASH_MIN_SAMPLES = 5 * SR


def select_attention_impl(bucket_samples: int,
                          base_impl: str = "auto",
                          norm_dtype: str = "float32") -> str:
    """Resolve the attention impl for a bucket of `bucket_samples`.

    Any impl other than "auto" passes through unchanged (explicit user
    choice wins). `norm_dtype` is the scoring config's softmax/LN dtype:
    under fast numerics (norm_dtype="bfloat16", the --fast_numerics
    serving config) the XLA path's softmax also runs in bf16 while the
    Pallas kernels keep fp32 softmax internally — measured fast+int8
    sweep: xla wins EVERY bucket (40 s: 40.0 vs 33.2 utt/s), so auto
    resolves to xla throughout. The flash crossover applies to exact
    (fp32-softmax) scoring only."""
    if base_impl != "auto":
        return base_impl
    if norm_dtype == "bfloat16":
        return "xla"
    return "flash" if bucket_samples >= AUTO_FLASH_MIN_SAMPLES else "xla"
