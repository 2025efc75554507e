"""Generate golden feature fixtures (tests/golden/reference_features.npz) by running
the IMPORTED reference extractors (/root/reference, via tests/ref_import.py shims)
on a deterministic 1-s synthetic 4-channel clip.

The committed npz lets the golden-parity test (tests/test_golden_features.py) run
in environments where the reference repo is absent; regenerate with
`python scripts/make_goldens.py` whenever the fixture clip or feature set changes.

Covered: melspec, melspeciv, melspecgcc, linspeciv, linspecgcc (classic extractor
classes, reference dataset/feature_extraction.py), salsa foa/mic (MagStftExtractor
spec + extract_normalized_eigenvector composed exactly as the reference CLI does,
salsa_feature_extraction.py:351-377). salsa_lite/salsa_ipd are NOT here: their
logic is inline in the reference CLI function (not importable without file I/O);
they are covered by tests/test_features.py::test_salsa_lite_matches_numpy instead.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.ref_import import load_reference_module, _shim_stft  # noqa: E402
from tests.test_reference_parity import directional_audio, FS, NFFT, HOP  # noqa: E402


def main():
    ref_fe = load_reference_module("dataset.feature_extraction")
    ref_salsa = load_reference_module("dataset.salsa_feature_extraction")
    if ref_fe is None or ref_salsa is None:
        raise SystemExit("reference repo not available; cannot regenerate goldens")

    rng = np.random.default_rng(20260816)
    x = directional_audio(rng)
    out = {"audio": x, "fs": FS, "n_fft": NFFT, "hop": HOP}

    out["melspec"] = ref_fe.MelSpecExtractor(
        fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128).extract(x)
    out["melspeciv"] = ref_fe.MelSpecIvExtractor(
        fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128).extract(x)
    out["melspecgcc"] = ref_fe.MelSpecGccExtractor(
        fs=FS, n_fft=NFFT, hop_length=HOP, n_mels=128).extract(x)
    out["linspeciv"] = ref_fe.LinSpecIvExtractor(n_fft=NFFT, hop_length=HOP).extract(x)
    out["linspecgcc"] = ref_fe.LogSpecGccExtractor(n_fft=NFFT, hop_length=HOP).extract(x)

    # SALSA composition per reference extract_features (salsa_feature_extraction.py:
    # 298-304 bin derivation, :351-377 spec + eigenvector + zero-pad stacking)
    mag = ref_salsa.MagStftExtractor(n_fft=NFFT, hop_length=HOP)
    for fmt, fmax_doa in [("foa", 9000), ("mic", 4000)]:
        fmin_doa = 50
        lower_bin = max(1, int(np.floor(fmin_doa * NFFT / FS)))
        upper_bin = int(np.floor(fmax_doa * NFFT / FS))
        spec = mag.extract(x)  # (4, T, 200)
        X = np.stack([_shim_stft(x[c], n_fft=NFFT, hop_length=HOP, win_length=NFFT)
                      for c in range(4)], axis=-1)
        eig = ref_salsa.extract_normalized_eigenvector(
            X[lower_bin:upper_bin], condition_number=5.0, n_hopframes=3,
            is_tracking=True, audio_format=fmt, fs=FS, n_fft=NFFT,
            lower_bin=lower_bin)  # (3, bins, frames)
        padded = np.zeros((3, spec.shape[1], spec.shape[2]), dtype=np.float32)
        padded[:, :, : upper_bin - lower_bin] = eig.transpose(0, 2, 1)
        out[f"salsa_{fmt}"] = np.concatenate([spec, padded], axis=0)

    # Fixture #2: a 32 kHz source clip (non-native rate). The reference loads
    # every wav with librosa.load(sr=24000) — i.e. resample-then-extract. resampy
    # is absent here, so the resample step is shimmed with the same scipy
    # polyphase kernel utils/audio_io.py::resample uses (VERDICT r2 #7); what the
    # golden pins is the full read->resample->extract chain staying in lockstep
    # with the imported reference extractor on resampled input.
    from salsa_tpu.utils.audio_io import resample

    rng32 = np.random.default_rng(20260817)
    # scaled to peak < 1: this fixture round-trips through a 16-bit wav in the
    # test, and the synth tones sum past full scale unscaled
    x32 = (0.4 * directional_audio(rng32, fs=32000)).astype(np.float32)
    x32_at_fs = resample(x32, 32000, FS)
    out["audio_32k"] = x32
    out["audio_32k_fs"] = 32000
    mag = ref_salsa.MagStftExtractor(n_fft=NFFT, hop_length=HOP)
    lower_bin, upper_bin = 1, int(np.floor(9000 * NFFT / FS))
    spec = mag.extract(x32_at_fs)
    X = np.stack([_shim_stft(x32_at_fs[c], n_fft=NFFT, hop_length=HOP,
                             win_length=NFFT) for c in range(4)], axis=-1)
    eig = ref_salsa.extract_normalized_eigenvector(
        X[lower_bin:upper_bin], condition_number=5.0, n_hopframes=3,
        is_tracking=True, audio_format="foa", fs=FS, n_fft=NFFT,
        lower_bin=lower_bin)
    padded = np.zeros((3, spec.shape[1], spec.shape[2]), dtype=np.float32)
    padded[:, :, : upper_bin - lower_bin] = eig.transpose(0, 2, 1)
    out["salsa_foa_from_32k"] = np.concatenate([spec, padded], axis=0)

    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "golden", "reference_features.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    sizes = {k: getattr(v, "shape", v) for k, v in out.items()}
    print(f"wrote {dest} ({os.path.getsize(dest)/1e6:.2f} MB): {sizes}")


if __name__ == "__main__":
    main()
