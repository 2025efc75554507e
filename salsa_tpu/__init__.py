"""SALSA-TPU: a TPU-native (JAX/XLA/Pallas) framework for polyphonic sound event
localization and detection (SELD).

Re-designed from scratch with the capabilities of the reference SALSA implementation
(thomeou/SALSA): spatial-cue-augmented log-spectrogram features (SALSA, SALSA-Lite,
SALSA-IPD, {lin,mel}spec{iv,gcc}), a CRNN model zoo (ResNet22 encoder + recurrent /
transformer decoders with SED+DOA heads), chunked long-audio datasets, DCASE 2020/2021
SELD metrics, and train/inference/evaluate entry points.

TPU-first design:
  * the whole feature extractor is a pure jittable function (waveform -> features) so
    it can be fused into the model's forward graph and run on-chip;
  * batched linear algebra (windowed covariance + principal eigenvector) instead of
    the reference's per-bin Python loops;
  * `lax.scan` for the strictly sequential noise-floor tracker;
  * data/model parallelism via `jax.sharding.Mesh` + NamedSharding, not host loops.
"""

__version__ = "0.1.0"

from salsa_tpu.utils.config import AttrDict, load_config  # noqa: F401
