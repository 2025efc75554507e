"""SALSA feature (FOA + MIC): multichannel log-linear spectrogram + normalized
principal eigenvector of the local spatial covariance matrix at each TF bin.

This is the reference's hottest code path — a Python double loop over ~4800 frames x
~191 bins with a 4x4 SVD per bin (salsa_feature_extraction.py:63-127). Here it is
re-designed TPU-first:

  * noise-floor tracking is the only true recurrence -> `lax.scan` over frames with a
    (floor, countdown) state vector per frequency bin;
  * the 7-frame windowed covariance is computed for ALL bins/frames at once via a
    cumulative-sum difference of per-frame outer products (no loops);
  * the principal eigenpair of each 4x4 Hermitian PSD matrix is computed batched:
      - method='eigh': jnp.linalg.eigh over the (bins*frames) batch (exact);
      - method='power': fixed-iteration power iteration + one deflation step for the
        second eigenvalue (VPU-only, no host sync, fastest on TPU);
  * the data-dependent validity mask (noise tracking AND coherence test) is applied
    densely after the fact — TPUs prefer computing everything and masking.

Semantics match the reference exactly up to eigensolver tolerance; the coherence test
compares the top two eigenvalues against `condition_number` just like the SVD-ordered
test in the reference.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from salsa_tpu.dsp.stft import stft, power_to_db, cabs2
from salsa_tpu.dsp.filterbank import high_freq_compression_matrix

SPEED_OF_SOUND = 343.0


@dataclass(frozen=True)
class SalsaParams:
    fs: int = 24000
    n_fft: int = 512
    hop_length: int = 300
    win_length: int | None = None
    fmin_doa: float = 50.0
    fmax_doa: float = 9000.0  # 9000 for FOA, 4000 for MIC
    audio_format: str = "foa"  # 'foa' | 'mic'
    condition_number: float = 5.0
    n_hopframes: int = 3
    is_tracking: bool = True
    compress_high_freq: bool = True
    eig_method: str = "power"  # 'power' | 'eigh' | 'pallas'
    power_iters: int = 20

    @property
    def lower_bin(self) -> int:
        return max(1, int(np.floor(self.fmin_doa * self.n_fft / self.fs)))

    @property
    def upper_bin(self) -> int:
        fmax_doa = min(self.fmax_doa, self.fs // 2)
        return int(np.floor(fmax_doa * self.n_fft / self.fs))

    @property
    def freq_dim(self) -> int:
        if self.compress_high_freq:
            return {512: 200, 256: 100}[self.n_fft]
        return self.n_fft // 2


# ---------------------------------------------------------------------------
# Noise-floor tracker (sequential over frames, vectorized over bins)
# ---------------------------------------------------------------------------

def tracker_init_state(magspec: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clip-start tracker state: floor = 0.5 * mean of the first 5 frames,
    countdown = 3 (reference salsa_feature_extraction.py:30,58)."""
    floor0 = 0.5 * jnp.mean(magspec[:, 0:5], axis=1)
    countdown0 = jnp.full(magspec.shape[0], 3, dtype=jnp.int32)
    return floor0, countdown0


def noise_floor_scan(
    magspec: jnp.ndarray,
    state0: tuple[jnp.ndarray, jnp.ndarray],
    snr_ratio: float = 1.5,
    collect_states: bool = False,
):
    """Up/down noise-floor tracker from an explicit initial state.

    magspec: (n_bins, n_frames) tracking magnitudes; state0 = (floor, countdown)
    per bin ENTERING the first frame. Returns (final_state, mask) — mask is the
    bool (n_bins, n_frames) "signal above noise" indicator. With collect_states,
    also returns the per-frame PRE-states (floor, countdown) of shape
    (n_frames, n_bins): the state the tracker held before consuming each frame —
    exactly what a mid-clip restart (fused chunked training) must resume from.
    Matches reference salsa_feature_extraction.py:28-93 (alpha=0.02,
    slow_scale=0.1, 3-frame countdown, floor clamped at 1e-6).
    """
    n_sig_frames = 3
    alpha = 0.02
    floor_up = 1.0 + alpha
    floor_up_slow = 1.0 + 0.1 * alpha
    floor_down = 1.0 - alpha

    def step(state, xf):
        floor, countdown = state
        above = xf > floor
        new_countdown = jnp.where(above, countdown - 1, n_sig_frames)
        neg = new_countdown < 0
        factor = jnp.where(
            above, jnp.where(neg, floor_up_slow, floor_up), floor_down
        )
        new_floor = jnp.maximum(floor * factor, 1e-6)
        sig = xf > snr_ratio * new_floor
        out = (sig, (floor, countdown)) if collect_states else sig
        return (new_floor, new_countdown), out

    # unroll amortizes the per-step scan overhead; the body is tiny (a few (bins,)
    # vector ops) so 16 steps fuse into one loop iteration nicely
    final, ys = lax.scan(step, state0, magspec.T, unroll=16)
    if collect_states:
        mask, pre_states = ys
        return final, mask.T, pre_states
    return final, ys.T  # mask: (n_bins, n_frames)


def noise_floor_mask(magspec: jnp.ndarray, snr_ratio: float = 1.5) -> jnp.ndarray:
    """Full-clip tracker mask (initial state derived from the first 5 frames)."""
    _, mask = noise_floor_scan(magspec, tracker_init_state(magspec), snr_ratio)
    return mask


def tracking_magspec(Xpad: jnp.ndarray, n_hopframes: int, n_frames: int) -> jnp.ndarray:
    """3-frame running-average magnitude of channel 0 (reference :49-55).

    Xpad: (n_bins, n_frames + 2*n_hopframes, n_chans) wrap-padded STFT.
    """
    acc = jnp.zeros(Xpad.shape[:1] + (n_frames,), dtype=jnp.float32)
    for i in range(3):
        seg = Xpad[:, n_hopframes - i : n_hopframes - i + n_frames, 0]
        acc = acc + jnp.abs(seg) ** 2
    return jnp.sqrt(acc / 3.0)


def tracking_magspec_planes(
    xr0: jnp.ndarray, xi0: jnp.ndarray, n_hopframes: int, n_frames: int
) -> jnp.ndarray:
    """tracking_magspec from channel-0 re/im planes (n_bins, n_frames + 2h).
    Rebuilds |.|^2 through lax.complex on the slices so the rounding is
    bit-identical to the complex-input path."""
    acc = jnp.zeros((xr0.shape[0], n_frames), dtype=jnp.float32)
    for i in range(3):
        sl = slice(n_hopframes - i, n_hopframes - i + n_frames)
        seg = lax.complex(xr0[:, sl], xi0[:, sl])
        acc = acc + jnp.abs(seg) ** 2
    return jnp.sqrt(acc / 3.0)


# ---------------------------------------------------------------------------
# Windowed spatial covariance, batched eigensolvers
# ---------------------------------------------------------------------------

def windowed_covariance(Xpad: jnp.ndarray, n_hopframes: int, n_frames: int) -> jnp.ndarray:
    """Sliding (2*n_hopframes+1)-frame covariance for every (bin, frame).

    Xpad: (n_bins, n_frames + 2h, n_chans) complex.
    Returns (n_bins, n_frames, n_chans, n_chans) with
    R[i,j] = mean_t X[t,i] * conj(X[t,j]) over the window — the same orientation as
    the reference's `X1.T @ X1.conj()` (salsa_feature_extraction.py:100).
    """
    h = n_hopframes
    win = 2 * h + 1
    # Direct 7-tap sliding sum: XLA fuses the shifted outer products so X is re-read
    # (29 MB for a 60 s clip) instead of materializing/cumsum-ing the (bins,T,C,C)
    # outer-product tensor (117 MB x several passes) — ~20x less HBM traffic than a
    # prefix-sum formulation.
    acc = None
    for k in range(win):
        seg = Xpad[:, k : k + n_frames]
        outer = seg[..., :, None] * jnp.conj(seg[..., None, :])
        acc = outer if acc is None else acc + outer
    return acc / win


def principal_eigs_eigh(R: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact batched Hermitian eigendecomposition. R: (..., C, C).
    Returns (lam0, lam1, v0): top two eigenvalues and the principal eigenvector."""
    w, v = jnp.linalg.eigh(R)  # ascending
    return w[..., -1], w[..., -2], v[..., :, -1]


def principal_eigs_power(R: jnp.ndarray, n_iters: int = 20) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched top-two eigenpairs via power iteration by REPEATED SQUARING.

    Instead of n_iters sequential matvecs (each re-reading the whole covariance
    tensor from HBM), square the trace-normalized matrix ceil(log2(n_iters)) times:
    P = (R/tr)^(2^s). One matvec with P then equals 2^s classic power iterations.
    The second eigenpair comes from one P-matvec orthogonalized against the first
    (convergence (lam2/lam1)^(2^s) — far beyond what the 5x coherence test needs).
    Eigenvalues are Rayleigh quotients with the ORIGINAL R, so the coherence ratio
    is exact up to eigenvector residual. Everything is (C,C)-batched VPU math with
    no data-dependent control flow.
    """
    C = R.shape[-1]
    n_sq = int(np.clip(np.ceil(np.log2(max(n_iters, 2))) - 1, 2, 4))

    # All the tiny (C,C) matmuls/matvecs below are written as broadcast
    # multiply+sum instead of einsum/dot_general: XLA pads batched 4x4 dots onto
    # 128x128 MXU tiles, exploding memory ~1000x; as VPU elementwise ops they
    # stream at HBM bandwidth.
    def matmat(A, B):  # (..., C, C) @ (..., C, C)
        return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)

    def matvec(A, b):  # (..., C, C) @ (..., C)
        return jnp.sum(A * b[..., None, :], axis=-1)

    def trace(A):
        return jnp.real(jnp.sum(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1))

    # trace-normalize so powers stay in float32 range: after scaling, lam0 in [1/C, 1]
    tr = trace(R)[..., None, None].astype(R.dtype)
    Rn = R / (tr + 1e-30)
    P = Rn
    for _ in range(n_sq):
        P = matmat(P, P)
        # renormalize by the running trace to avoid underflow of (lam0/tr)^(2^s)
        ptr = trace(P)[..., None, None].astype(R.dtype)
        P = P / (ptr + 1e-30)

    key = jax.random.PRNGKey(20211021)
    v0r = jax.random.normal(key, (2, 2, C))
    s0 = (v0r[0, 0] + 1j * v0r[0, 1]).astype(R.dtype)
    s1 = (v0r[1, 0] + 1j * v0r[1, 1]).astype(R.dtype)

    def rayleigh(A, w):
        return jnp.real(jnp.sum(jnp.conj(w) * matvec(A, w), axis=-1))

    v = matvec(P, jnp.broadcast_to(s0, P.shape[:-2] + (C,)))
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)
    # one refinement step with P cleans up start-vector bias
    v = matvec(P, v)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)
    lam0 = rayleigh(R, v)

    # Runner-up eigenvalue: classic power iterations on the trace-normalized matrix
    # with per-step re-orthogonalization against v. Squared powers would underflow
    # the (lam1/lam0)^(2^s) component below float32 rounding and leave u dominated
    # by projection noise; a few un-squared steps keep the u2 component alive (its
    # Rayleigh quotient can only UNDER-estimate lam1, which errs on the side the
    # 5x coherence test already accepts).
    u = jnp.broadcast_to(s1, v.shape)
    u = u - jnp.sum(jnp.conj(v) * u, axis=-1, keepdims=True) * v
    for _ in range(3):
        u = matvec(Rn, u)
        u = u - jnp.sum(jnp.conj(v) * u, axis=-1, keepdims=True) * v
        u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-30)
    lam1 = rayleigh(R, u)
    return lam0, lam1, v


# ---------------------------------------------------------------------------
# Full SALSA spatial feature
# ---------------------------------------------------------------------------

def eig_features_from_padded(
    Xpad: jnp.ndarray, sig_mask: jnp.ndarray, params: SalsaParams
) -> jnp.ndarray:
    """Masked principal-eigenvector features from a context-padded STFT band.

    Xpad: (n_bins_band, n_frames + 2*n_hopframes, n_chans) complex — the chunk's
    frames WITH their n_hopframes covariance context on both sides (full-clip
    callers wrap-pad; the fused chunked trainer supplies real neighbor frames).
    sig_mask: (n_bins_band, n_frames) noise-tracker output.
    Returns (n_chans-1, n_bins_band, n_frames) float features (zeros where invalid).
    """
    p = params
    n_bins, n_padded, n_chans = Xpad.shape
    h = p.n_hopframes
    n_frames = n_padded - 2 * h

    if p.eig_method == "pallas" and (not p.is_tracking or n_chans != 4):
        # the fused kernel is specialized to 4 channels with tracking; everything
        # else (arbitrary mic counts — the contrib/salsa_flexible capability) uses
        # the general batched XLA path
        import dataclasses

        p = dataclasses.replace(p, eig_method="power")

    if p.eig_method == "pallas":
        from salsa_tpu.features.salsa_pallas import salsa_spatial_pallas

        return salsa_spatial_pallas(
            Xpad, sig_mask, n_hop=h, audio_format=p.audio_format,
            condition_number=p.condition_number, lower_bin=p.lower_bin,
            fs=p.fs, n_fft=p.n_fft, x_prepadded=True,
            interpret=jax.default_backend() == "cpu",  # Mosaic needs real TPU
        )

    R = windowed_covariance(Xpad, h, n_frames)  # (bins, frames, C, C)
    if p.eig_method == "eigh":
        lam0, lam1, v = principal_eigs_eigh(R)
    elif p.eig_method == "power":
        lam0, lam1, v = principal_eigs_power(R, p.power_iters)
    else:
        raise ValueError(f"unknown eig_method '{p.eig_method}'")

    coherent = lam0 > lam1 * p.condition_number
    valid = sig_mask & coherent if p.is_tracking else sig_mask

    if p.audio_format == "foa":
        ratio = jnp.real(v[..., 1:] / v[..., 0:1])  # (bins, frames, 3)
        norm = jnp.sqrt(jnp.sum(ratio**2, axis=-1, keepdims=True))
        feat = ratio / jnp.maximum(norm, 1e-30)
    elif p.audio_format == "mic":
        delta = 2.0 * np.pi * p.fs / (p.n_fft * SPEED_OF_SOUND)
        phase = jnp.angle(v[..., 1:] * jnp.conj(v[..., 0:1]))
        bins = np.arange(p.lower_bin, p.lower_bin + n_bins, dtype=np.float32)
        feat = phase / (delta * bins[:, None, None])
    else:
        raise ValueError(f"unknown audio format '{p.audio_format}'")

    feat = jnp.where(valid[..., None], feat, 0.0)
    feat = jnp.nan_to_num(feat, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.transpose(feat, (2, 0, 1))  # (C-1, bins, frames)


def eig_features_from_planes(
    xr: jnp.ndarray, xi: jnp.ndarray, sig_mask: jnp.ndarray, params: SalsaParams
) -> jnp.ndarray:
    """eig_features_from_padded, but fed (C, n_bins_band, n_frames + 2h) re/im
    planes — the layout the Pallas kernel consumes natively (one pad copy instead
    of a C-minor complex transpose round-trip). Falls back to the general complex
    path for non-pallas eigensolvers / non-4-channel arrays."""
    p = params
    n_chans = xr.shape[0]
    if p.eig_method == "pallas" and p.is_tracking and n_chans == 4:
        from salsa_tpu.features.salsa_pallas import salsa_spatial_pallas_planes

        return salsa_spatial_pallas_planes(
            xr, xi, sig_mask, n_hop=p.n_hopframes, audio_format=p.audio_format,
            condition_number=p.condition_number, lower_bin=p.lower_bin,
            fs=p.fs, n_fft=p.n_fft,
            interpret=jax.default_backend() == "cpu")
    Xpad = jnp.transpose(lax.complex(xr, xi), (1, 2, 0))
    return eig_features_from_padded(Xpad, sig_mask, p)


def salsa_eigenvector_features(X: jnp.ndarray, params: SalsaParams) -> jnp.ndarray:
    """Normalized principal-eigenvector map for the DOA band (full clip).

    X: (n_bins_band, n_frames, n_chans) complex STFT slice [lower_bin, upper_bin).
    Returns (n_chans-1, n_bins_band, n_frames) float features (zeros where invalid).
    """
    p = params
    n_frames = X.shape[1]
    h = p.n_hopframes

    Xpad = jnp.concatenate([X[:, -h:], X, X[:, :h]], axis=1)  # wrap pad over frames

    mag = tracking_magspec(Xpad, h, n_frames)
    sig_mask = noise_floor_mask(mag)  # (bins, frames) bool
    if not p.is_tracking:
        sig_mask = jnp.ones_like(sig_mask, dtype=bool)
    return eig_features_from_padded(Xpad, sig_mask, p)


def extract_salsa(wave: jnp.ndarray, params: SalsaParams) -> jnp.ndarray:
    """(4, n_samples) -> (7, n_frames, freq_dim) SALSA feature.

    Channels 0-3: log-linear compressed spectrograms; channels 4-6: normalized
    principal eigenvectors (zero-padded above upper_bin), matching the layout written
    by the reference extractor (salsa_feature_extraction.py:355-377).
    """
    p = params
    X = stft(wave, n_fft=p.n_fft, hop_length=p.hop_length, win_length=p.win_length)
    # (4, T, bins)
    W = high_freq_compression_matrix(p.n_fft, p.compress_high_freq)
    power = cabs2(X)
    log_spec = power_to_db(jnp.einsum("ctb,fb->ctf", power, jnp.asarray(W)))

    # eig band as (C, bins_band, T) re/im planes: one 2-D transpose per plane from
    # the STFT's native (C, T, bins) — never materializes the C-minor complex band
    h = p.n_hopframes
    xr_b = jnp.transpose(jnp.real(X)[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
    xi_b = jnp.transpose(jnp.imag(X)[:, :, p.lower_bin : p.upper_bin], (0, 2, 1))
    xr_pad = jnp.concatenate([xr_b[:, :, -h:], xr_b, xr_b[:, :, :h]], axis=-1)
    xi_pad = jnp.concatenate([xi_b[:, :, -h:], xi_b, xi_b[:, :, :h]], axis=-1)
    n_t = X.shape[1]
    mag = tracking_magspec_planes(xr_pad[0], xi_pad[0], h, n_t)
    sig_mask = noise_floor_mask(mag)
    if not p.is_tracking:
        sig_mask = jnp.ones_like(sig_mask, dtype=bool)
    eig = eig_features_from_planes(xr_pad, xi_pad, sig_mask, p)  # (3, bins_band, T)
    eig = jnp.transpose(eig, (0, 2, 1))  # (3, T, bins_band)

    n_frames = X.shape[1]
    pad_width = p.freq_dim - (p.upper_bin - p.lower_bin)
    eig_full = jnp.pad(eig, ((0, 0), (0, 0), (0, pad_width)))

    return jnp.concatenate([log_spec, eig_full], axis=0)


extract_salsa_jit = jax.jit(extract_salsa, static_argnames=("params",))
