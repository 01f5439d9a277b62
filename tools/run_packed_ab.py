"""One-shot end-to-end A/B of packed attention widths on the TPU.

Runs bench.run(8) sequentially in one process (the TPU tunnel is
single-client) for: baseline xla attention, packed2, packed4, packed8.
Prints one line per config.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import run

for impl in [None, "packed2", "packed4", "packed8"]:
    kw = {} if impl is None else {"attention_impl": impl}
    try:
        utt, loss = run(8, **kw)
        print(f"RESULT {impl or 'xla-default'}: {utt:.1f} utt/s (loss {loss:.4f})", flush=True)
    except Exception as e:
        print(f"RESULT {impl or 'xla-default'}: FAILED {type(e).__name__}: {e}", flush=True)
