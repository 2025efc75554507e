"""Pallas TPU kernel: fused SALSA spatial feature (windowed covariance -> top-two
eigenpairs -> coherence test -> FOA/MIC normalization) in one VMEM-resident pass.

The XLA path (features/salsa.py) materializes the (bins, frames, C, C) covariance
tensor and several squared-power copies in HBM (~1 GB of traffic per clip). This
kernel tiles the (bins, frames) plane; each grid step DMAs an STFT tile plus its
128-frame lookahead halo from HBM into VMEM and writes only the final 3-channel
feature tile — total HBM traffic drops to reading X ~1.25x once plus the output.

The halo is fetched as a SECOND BlockSpec over the same plane arrays (main block
(C, BIN_TILE, T_TILE) at block t, halo block (C, BIN_TILE, 128) at lane-block
4t+4), concatenated in VMEM. This keeps the host-side prep to one fused
real/imag+transpose+pad copy per plane; the earlier design materialized an
overlapped `frame_signal` copy plus two block transposes in HBM, which TPU
profiling showed cost more than the kernel's entire eigensolver math.

Complex arithmetic uses explicit (re, im) f32 plane pairs (Pallas TPU has no complex
dtype); the 4x4 Hermitian algebra is fully unrolled Python codegen over the upper
triangle, so everything lowers to (BIN_TILE, T_TILE) VPU ops.

Numerics mirror features/salsa.py::principal_eigs_power (same squaring count, start
vectors, orthogonalization, Rayleigh quotients); equality is tested in
tests/test_salsa_pallas.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 4            # microphone / ambisonic channels
# tile sweep on TPU v5e (scripts/probe_salsa_kernel.py): 8x512 / 16x512 / 32x512 /
# 8x1024 / 16x1024 within 2.5% of each other; 16x1024 fastest
BIN_TILE = 16
T_TILE = 1024
N_SQUARINGS = 3
SPEED_OF_SOUND = 343.0


@functools.lru_cache(maxsize=1)
def _start_vectors():
    # identical constants to features/salsa.py::principal_eigs_power; evaluated
    # eagerly (ensure_compile_time_eval) so they are baked into the kernel
    with jax.ensure_compile_time_eval():
        key = jax.random.PRNGKey(20211021)
        v0r = np.asarray(jax.random.normal(key, (2, 2, C)))
    s0 = v0r[0, 0] + 1j * v0r[0, 1]
    s1 = v0r[1, 0] + 1j * v0r[1, 1]
    return s0.astype(np.complex64), s1.astype(np.complex64)


class _Cplx:
    """(re, im) plane pair with complex arithmetic."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    def __add__(self, o):
        return _Cplx(self.re + o.re, self.im + o.im)

    def __sub__(self, o):
        return _Cplx(self.re - o.re, self.im - o.im)

    def __mul__(self, o):
        if isinstance(o, _Cplx):
            return _Cplx(self.re * o.re - self.im * o.im,
                         self.re * o.im + self.im * o.re)
        return _Cplx(self.re * o, self.im * o)

    def conj(self):
        return _Cplx(self.re, -self.im)

    def scale(self, s):
        return _Cplx(self.re * s, self.im * s)


def _matvec(H, v):
    """H: dict[(i,j)] upper triangle of a Hermitian matrix; v: list of _Cplx."""
    out = []
    for i in range(C):
        acc = None
        for j in range(C):
            hij = H[(i, j)] if i <= j else H[(j, i)].conj()
            term = hij * v[j]
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _matsquare(H):
    out = {}
    for i in range(C):
        for j in range(i, C):
            acc = None
            for k in range(C):
                hik = H[(i, k)] if i <= k else H[(k, i)].conj()
                hkj = H[(k, j)] if k <= j else H[(j, k)].conj()
                term = hik * hkj
                acc = term if acc is None else acc + term
            out[(i, j)] = acc
    return out


def _trace(H):
    return sum(H[(i, i)].re for i in range(C))


def _atan2(y, x):
    """Vector atan2 via range reduction + odd minimax polynomial (Mosaic has no
    atan/atan2 primitive). Max error ~1e-5 rad — far below the MIC feature's
    quantization after the 1/(delta*bin) normalization."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    z = t * t
    # minimax coefficients for atan(t), t in [0, 1]
    p = -0.0117212
    p = p * z + 0.05265332
    p = p * z - 0.11643287
    p = p * z + 0.19354346
    p = p * z - 0.33262347
    p = p * z + 0.99997726
    a = t * p
    a = jnp.where(ay > ax, np.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, np.float32(np.pi) - a, a)
    return jnp.where(y < 0, -a, a)


def _kernel(xrm_ref, xrh_ref, xim_ref, xih_ref, mask_ref, out_ref, *,
            n_hop: int, audio_format: str, condition_number: float,
            lower_bin: int, delta: float):
    win = 2 * n_hop + 1
    b = pl.program_id(0)

    # main blocks are (C, BIN_TILE, T_TILE); halo blocks carry the next 128 frames
    # of the same planes. Concatenating in VMEM gives each channel a
    # (BIN_TILE, T_TILE + 128) window source with every slice 128-aligned.
    x = [
        _Cplx(jnp.concatenate([xrm_ref[c, :, :], xrh_ref[c, :, :]], axis=-1),
              jnp.concatenate([xim_ref[c, :, :], xih_ref[c, :, :]], axis=-1))
        for c in range(C)
    ]

    # ---- windowed covariance R[i,j] = mean_k x_i[t+k] conj(x_j[t+k]) ----
    R = {}
    inv_win = 1.0 / win
    for i in range(C):
        for j in range(i, C):
            acc = None
            for k in range(win):
                a = _Cplx(x[i].re[:, k : k + T_TILE], x[i].im[:, k : k + T_TILE])
                bb = _Cplx(x[j].re[:, k : k + T_TILE], x[j].im[:, k : k + T_TILE])
                p = a * bb.conj()
                acc = p if acc is None else acc + p
            R[(i, j)] = acc.scale(inv_win)

    # ---- trace normalization + repeated squaring ----
    inv_tr = 1.0 / (_trace(R) + 1e-30)
    Rn = {ij: R[ij].scale(inv_tr) for ij in R}
    P = Rn
    for _ in range(N_SQUARINGS):
        P = _matsquare(P)
        inv_ptr = 1.0 / (_trace(P) + 1e-30)
        P = {ij: P[ij].scale(inv_ptr) for ij in P}

    s0, s1 = _start_vectors()

    def const_vec(s):
        return [
            _Cplx(jnp.full((BIN_TILE, T_TILE), np.float32(s[c].real)),
                  jnp.full((BIN_TILE, T_TILE), np.float32(s[c].imag)))
            for c in range(C)
        ]

    def normalize(v):
        nrm2 = sum(v[c].re * v[c].re + v[c].im * v[c].im for c in range(C))
        inv = jax.lax.rsqrt(nrm2 + 1e-30)
        return [vc.scale(inv) for vc in v]

    def rayleigh(H, v):
        Hv = _matvec(H, v)
        return sum(v[c].re * Hv[c].re + v[c].im * Hv[c].im for c in range(C))

    def orth(u, v):
        dr = sum(v[c].re * u[c].re + v[c].im * u[c].im for c in range(C))
        di = sum(v[c].re * u[c].im - v[c].im * u[c].re for c in range(C))
        return [u[c] - _Cplx(dr * v[c].re - di * v[c].im,
                             dr * v[c].im + di * v[c].re) for c in range(C)]

    v = normalize(_matvec(P, const_vec(s0)))
    v = normalize(_matvec(P, v))
    lam0 = rayleigh(R, v)

    u = orth(const_vec(s1), v)
    for _ in range(3):
        u = _matvec(Rn, u)
        u = orth(u, v)
        u = normalize(u)
    lam1 = rayleigh(R, u)

    coherent = lam0 > lam1 * condition_number
    valid = jnp.logical_and(mask_ref[:, :] > 0.5, coherent)

    # ---- normalization to the 3 spatial channels ----
    if audio_format == "foa":
        inv_v0 = 1.0 / (v[0].re * v[0].re + v[0].im * v[0].im + 1e-30)
        comps = [
            (v[cix].re * v[0].re + v[cix].im * v[0].im) * inv_v0
            for cix in range(1, C)
        ]
        nrm = jax.lax.rsqrt(sum(r * r for r in comps) + 1e-30)
        feats = [r * nrm for r in comps]
    else:  # mic
        row = jax.lax.broadcasted_iota(jnp.int32, (BIN_TILE, T_TILE), 0).astype(jnp.float32)
        abs_bin = row + (b * BIN_TILE + lower_bin).astype(jnp.float32)
        inv_bin = 1.0 / (delta * abs_bin)
        feats = []
        for cix in range(1, C):
            pr = v[cix].re * v[0].re + v[cix].im * v[0].im
            pi = v[cix].im * v[0].re - v[cix].re * v[0].im
            feats.append(_atan2(pi, pr) * inv_bin)

    zero = jnp.zeros((BIN_TILE, T_TILE), jnp.float32)
    for cix in range(C - 1):
        out_ref[cix, :, :] = jnp.where(valid, feats[cix], zero)


@functools.partial(
    jax.jit,
    static_argnames=("n_hop", "audio_format", "condition_number", "lower_bin",
                     "fs", "n_fft", "x_prepadded", "interpret"),
)
def salsa_spatial_pallas(
    X: jnp.ndarray,
    sig_mask: jnp.ndarray,
    n_hop: int = 3,
    audio_format: str = "foa",
    condition_number: float = 5.0,
    lower_bin: int = 1,
    fs: int = 24000,
    n_fft: int = 512,
    x_prepadded: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """X: (n_bins_band, n_frames, C) complex64 STFT band slice — un-padded, or
    (with x_prepadded) already carrying n_hop context frames on both sides (the
    fused chunked-training path supplies real neighbor frames instead of wrap).
    sig_mask: (n_bins_band, n_frames) bool from the noise tracker.
    Returns (C-1, n_bins_band, n_frames) float32 features (zeros where invalid)."""
    Xpad = X if x_prepadded else jnp.concatenate(
        [X[:, -n_hop:], X, X[:, :n_hop]], axis=1)
    xr = jnp.transpose(jnp.real(Xpad), (2, 0, 1))
    xi = jnp.transpose(jnp.imag(Xpad), (2, 0, 1))
    return salsa_spatial_pallas_planes(
        xr, xi, sig_mask, n_hop=n_hop, audio_format=audio_format,
        condition_number=condition_number, lower_bin=lower_bin, fs=fs,
        n_fft=n_fft, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("n_hop", "audio_format", "condition_number", "lower_bin",
                     "fs", "n_fft", "interpret"),
)
def salsa_spatial_pallas_planes(
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    sig_mask: jnp.ndarray,
    n_hop: int = 3,
    audio_format: str = "foa",
    condition_number: float = 5.0,
    lower_bin: int = 1,
    fs: int = 24000,
    n_fft: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Planes-native entry: xr/xi are (C, n_bins_band, n_frames + 2*n_hop) float32
    re/im STFT planes ALREADY carrying n_hop covariance-context frames per side.
    This layout reaches the kernel with a single pad copy per plane — callers that
    keep STFT output in (C, T, bins) avoid the C-minor complex band entirely.
    sig_mask: (n_bins_band, n_frames) bool. Returns (C-1, n_bins_band, n_frames)."""
    n_bins = xr.shape[1]
    n_frames = xr.shape[2] - 2 * n_hop
    delta = 2.0 * np.pi * fs / (n_fft * SPEED_OF_SOUND)
    HALO = 128  # >= 2*n_hop, a full lane tile so every halo block is aligned

    bins_pad = -(-n_bins // BIN_TILE) * BIN_TILE
    t_pad = -(-n_frames // T_TILE) * T_TILE
    t_total = t_pad + HALO
    pad_spec = ((0, 0), (0, bins_pad - n_bins),
                (0, t_total - (n_frames + 2 * n_hop)))
    # one pad copy per plane -> (C, bins_pad, t_total); padded regions are masked
    # out through the sig_mask padding
    xr = jnp.pad(xr, pad_spec)
    xi = jnp.pad(xi, pad_spec)
    mask = jnp.pad(sig_mask.astype(jnp.float32),
                   ((0, bins_pad - n_bins), (0, t_pad - n_frames)))

    hpb = T_TILE // HALO  # halo blocks per main block
    main_spec = pl.BlockSpec((C, BIN_TILE, T_TILE), lambda b, t: (0, b, t),
                             memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((C, BIN_TILE, HALO),
                             lambda b, t: (0, b, (t + 1) * hpb),
                             memory_space=pltpu.VMEM)

    grid = (bins_pad // BIN_TILE, t_pad // T_TILE)
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_hop=n_hop, audio_format=audio_format,
            condition_number=condition_number, lower_bin=lower_bin, delta=delta,
        ),
        grid=grid,
        in_specs=[
            main_spec, halo_spec, main_spec, halo_spec,
            pl.BlockSpec((BIN_TILE, T_TILE), lambda b, t: (b, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C - 1, BIN_TILE, T_TILE), lambda b, t: (0, b, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C - 1, bins_pad, t_pad), jnp.float32),
        interpret=interpret,
    )(xr, xr, xi, xi, mask)
    return out[:, :n_bins, :n_frames]
