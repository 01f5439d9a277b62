"""Verify XLSR checkpoint-conversion parity against a torch oracle.

Usage (when the real checkpoint is available — fairseq `xlsr2_300m.pt`
or a torch-saved HuggingFace `wav2vec2-xls-r-300m` state dict, format
auto-detected):

    python tools/verify_xlsr_parity.py /path/to/xlsr2_300m.pt [seconds]

Loads the fairseq state dict with torch, runs a pure torch-functional
wav2vec2 forward (no fairseq dependency — the same semantics the converter
targets: conv extractor with per-block LayerNorm, feature LN + projection,
weight-normed positional conv with SamePad trim, pre-norm transformer,
final LN), converts the checkpoint with
occm_tpu.models.convert_xlsr.convert_fairseq_state_dict, runs the Flax
XLSREncoder, and reports the max absolute output difference. The tiny-config
version of this comparison runs in CI (tests/test_xlsr_convert.py).
"""

from __future__ import annotations

import sys

import numpy as np
import torch

from occm_tpu.models.torch_oracle import torch_wav2vec2_oracle  # noqa: F401


def main():  # pragma: no cover - needs the real checkpoint
    import dataclasses

    import jax
    import jax.numpy as jnp

    from occm_tpu.models import XLSREncoder
    from occm_tpu.models.convert_xlsr import convert_fairseq_state_dict

    pt_path = sys.argv[1]
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

    state = torch.load(pt_path, map_location="cpu", weights_only=False)
    sd = state.get("model", state)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    cfg = dataclasses.replace(
        XLSRConfig(), dtype="float32", remat=False
    )
    from occm_tpu.models.convert_xlsr import detect_format, hf_to_fairseq_names

    if detect_format(sd) == "hf":
        # HuggingFace wav2vec2-xls-r-300m layout: rename to fairseq keys,
        # then the oracle + converter run unchanged
        print("detected HuggingFace state-dict naming")
        sd = hf_to_fairseq_names(sd, cfg)
    params = convert_fairseq_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    wave = (rng.normal(size=(1, int(16000 * seconds))) * 0.1).astype(
        np.float32
    )

    oracle = torch_wav2vec2_oracle(sd, wave, cfg)
    ours = np.asarray(
        XLSREncoder(cfg).apply({"params": params}, jnp.asarray(wave))
    )
    diff = np.max(np.abs(ours - oracle))
    rel = diff / (np.max(np.abs(oracle)) + 1e-9)
    print(f"output shape {ours.shape}  max|diff| = {diff:.3e}  "
          f"rel = {rel:.3e}")
    assert diff < 1e-3, "conversion parity failure"
    print("PARITY OK")


if __name__ == "__main__":
    main()
