"""occm_tpu — a TPU-native (JAX / Flax / XLA / Pallas / pjit) framework for
one-class speech-deepfake (anti-spoofing) detection.

Built from scratch with the capability surface of the reference PyTorch
codebase (nguyenvulong/occm, mounted read-only at /root/reference):

- XLSR wav2vec2-300M self-supervised frontend (reference: models/xlsr.py)
- CNN / LCNN / SE-ResNet34 / AASIST graph-attention backends
  (reference: models/{cnn,lcnn,senet,sslassist}.py)
- one-class compactness + descriptiveness losses (reference: losses/custom_loss.py)
- RawBoost raw-waveform augmentation as fused on-device JAX/XLA ops
  (reference: RawBoost.py, data_utils_SSL.py:111-173)
- meta-batch one-class training (reference: oc_training.py)
- reference-embedding / threshold one-class scoring (reference: oc_classifier.py)
- bit-compatible EER / DET evaluation (reference: evaluate_metrics.py,
  evaluate.py, calculate_eer.py)

The compute path is JAX (jit/pjit over a `jax.sharding.Mesh`); the host runtime
(audio decode, prefetch) has native C++ components under `native/`.
"""

__version__ = "0.1.0"
