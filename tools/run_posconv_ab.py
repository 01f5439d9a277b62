"""One-shot end-to-end A/B of pos_conv formulations on the TPU.

The r3 audit left pos_conv ~12 ms/step at 63 TF/s (grouped-conv emitter,
64-deep per-group contraction). Runs bench.run(8) sequentially in one
process for: grouped (default), batched, s2d.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import run

for impl in ["grouped", "batched", "s2d"]:
    try:
        utt, loss = run(8, pos_conv_impl=impl)
        print(f"RESULT pos_conv={impl}: {utt:.1f} utt/s (loss {loss:.4f})", flush=True)
    except Exception as e:
        print(f"RESULT pos_conv={impl}: FAILED {type(e).__name__}: {e}", flush=True)
