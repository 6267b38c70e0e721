"""Decimating FIR filtering — the framework's hottest kernel.

The reference evaluates a 64-tap direct-form FIR sample-at-a-time at every
retained (decimated) output position, carrying ``fir_length - 1`` frames of
history between blocks (src/dsp/lowpass.cxx:131-162). Here the same
computation is a *block* operation over ``[..., N]`` signals with two
TPU-first formulations:

* :func:`fir_decimate` — strided cross-correlation via
  ``lax.conv_general_dilated`` (XLA lowers 1-D strided conv onto the
  TPU convolution path). For small tap counts (K=64) and large decimation
  this is compute-minimal: ``K * N / D`` MACs, each input sample read
  ``K/D`` times from VMEM.

* :func:`overlap_save_decimate` — frequency-domain overlap-save convolution:
  segment the input with ``K-1`` overlap, batched FFT x filter response x
  inverse FFT, discard wrap-around, decimate. Wins when K is large (sharp
  channel filters) or D is small; the segmenting also defines the halo
  exchanged between time-shards in the multi-chip path (SURVEY §5
  "overlap-save boundary exchange").

State is explicit: callers thread the ``K-1``-frame history; block-size
invariance (same stream, any block split, identical output) is the core
correctness property tested against the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _ext_with_history(x: jax.Array, history: jax.Array) -> jax.Array:
    return jnp.concatenate([history, x], axis=-1)


def _corr_strided_real(xext: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    """Batched strided cross-correlation on float32 planes.

    ``xext``: [B, T] float32, ``kernel``: [K] or [B, K] float32 (already in
    correlation order, i.e. reference coefficients reversed). Output
    ``[B, (T - K) // stride + 1]``: ``y[b, n] = sum_k kernel[b, k] *
    xext[b, n*stride + k]`` — exactly the loop at src/dsp/lowpass.cxx:151-159.
    """
    b, t = xext.shape
    if kernel.ndim == 1:
        lhs = xext[:, None, :]  # [B, 1, T]
        rhs = kernel[None, None, :]  # [O=1, I=1, K]
        out = lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out[:, 0, :]
    # per-channel kernels -> grouped conv, one group per batch row
    lhs = xext[None, :, :]  # [1, B, T]
    rhs = kernel[:, None, :]  # [B, 1, K]
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=b,
    )
    return out[0]


def _apply_planes(fn, x: jax.Array) -> jax.Array:
    """Apply a real-plane function to float32 or complex64 input.

    Complex signals are filtered as two real planes stacked into the batch —
    the reference's interleaved-2-channel FIR (lowpass.cxx:155-156) — keeping
    the convolution real-typed for the TPU conv path.
    """
    if jnp.iscomplexobj(x):
        planes = jnp.concatenate([x.real, x.imag], axis=0)
        y = fn(planes)
        half = y.shape[0] // 2
        return lax.complex(y[:half], y[half:])
    return fn(x)


@functools.partial(jax.jit, static_argnames=("decimation",))
def fir_decimate(
    x: jax.Array,
    coeff: jax.Array,
    decimation: int,
    history: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Decimating FIR with explicit history carry.

    Args:
      x: ``[C, N]`` float32 or complex64 (``C`` = channel batch; use C=1 for
        a single receiver). ``N`` must be a multiple of ``decimation`` and
        at least ``K - 1``.
      coeff: ``[K]`` shared or ``[C, K]`` per-channel float32 coefficients in
        design order (:func:`~webradio_tpu.ops.firdesign.design_lowpass_fir`).
      decimation: integer decimation factor ``D`` (dspblock.cxx:118-130
        enforces integer rate ratios; we keep that constraint).
      history: ``[C, K-1]`` same dtype as ``x`` — the retained previous
        frames (zeros for a fresh stream, lowpass.cxx:133-142).

    Returns:
      ``(y, new_history)`` with ``y: [C, N // D]`` and
      ``new_history = x[..., -(K-1):]``.
    """
    k = coeff.shape[-1]
    if x.shape[-1] % decimation:
        raise ValueError(
            "block length must be a multiple of the decimation factor so the "
            "decimation grid stays aligned across blocks (dspblock.cxx:176-184)"
        )
    kernel = jnp.flip(coeff, axis=-1).astype(jnp.float32)
    xext = _ext_with_history(x, history)

    if coeff.ndim == 1:
        corr = lambda p: _corr_strided_real(p, kernel, decimation)
    else:
        # complex planes double the batch; tile kernels to match
        def corr(p):
            reps = p.shape[0] // kernel.shape[0]
            kb = jnp.tile(kernel, (reps, 1))
            return _corr_strided_real(p, kb, decimation)

    y = _apply_planes(corr, xext)
    new_history = x[..., x.shape[-1] - (k - 1):]
    return y, new_history


def fir_decimate_streaming(
    x: jax.Array, coeff: jax.Array, decimation: int, history: jax.Array
):
    """Alias of :func:`fir_decimate` (kept for API symmetry with the
    overlap-save variant; both carry identical state)."""
    return fir_decimate(x, coeff, decimation, history)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@functools.partial(
    jax.jit, static_argnames=("decimation", "segment_len", "fft_len")
)
def overlap_save_decimate(
    x: jax.Array,
    coeff: jax.Array,
    decimation: int,
    history: jax.Array,
    segment_len: int | None = None,
    fft_len: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Frequency-domain decimating FIR (overlap-save), same contract as
    :func:`fir_decimate`.

    The input (with history prepended) is cut into ``N / S`` segments of
    ``L = fft_len`` samples overlapping by ``L - S >= K - 1``; each segment is
    convolved circularly via batched FFTs and the first ``K - 1`` wrapped
    outputs are discarded. Numerically this differs from the direct form only
    by float32 FFT rounding — covered by the SNR-bound tests.

    ``segment_len`` must divide ``N``; defaults to the largest power of two
    ``<= N`` capped at 4096.
    """
    k = coeff.shape[-1]
    n = x.shape[-1]
    if n % decimation:
        raise ValueError(
            "block length must be a multiple of the decimation factor so the "
            "decimation grid stays aligned across blocks (dspblock.cxx:176-184)"
        )
    if segment_len is None:
        segment_len = min(4096, _next_pow2(n) if _next_pow2(n) <= n else n)
        while n % segment_len:
            segment_len //= 2
    s = segment_len
    if n % s:
        raise ValueError(f"segment_len {s} must divide N {n}")
    l = fft_len or _next_pow2(s + k - 1)
    if l < s + k - 1:
        raise ValueError("fft_len too small for segment + filter overlap")
    num_seg = n // s

    xext = _ext_with_history(x, history)  # [..., N + K - 1]
    pad = (num_seg - 1) * s + l - xext.shape[-1]
    xpad = jnp.pad(xext, [(0, 0)] * (x.ndim - 1) + [(0, pad)])

    # gather overlapping segments: seg[c, s_idx, t] = xpad[c, s_idx*S + t]
    starts = np.arange(num_seg) * s
    idx = starts[:, None] + np.arange(l)[None, :]
    segs = jnp.take(xpad, jnp.asarray(idx), axis=-1)  # [..., num_seg, L]

    if jnp.iscomplexobj(x):
        z = segs.astype(jnp.complex64)
    else:
        z = segs.astype(jnp.float32).astype(jnp.complex64)

    # Circular *convolution* with the design-order coefficients equals the
    # reference's reversed-coefficient correlation at output offset K-1:
    # w[n+K-1] = sum_j coeff[j] * xext[n+K-1-j] = sum_k coeff[K-1-k] * xext[n+k]
    h = coeff.astype(jnp.float32)
    hpad = jnp.zeros(h.shape[:-1] + (l,), jnp.float32)
    hpad = lax.dynamic_update_slice_in_dim(hpad, h, 0, axis=-1)
    hf = jnp.fft.fft(hpad.astype(jnp.complex64), axis=-1)
    if coeff.ndim > 1:
        hf = hf[..., None, :]  # broadcast over segments

    yf = jnp.fft.ifft(jnp.fft.fft(z, axis=-1) * hf, axis=-1)
    valid = lax.slice_in_dim(yf, k - 1, k - 1 + s, axis=-1)  # [..., num_seg, S]
    yfull = valid.reshape(valid.shape[:-2] + (num_seg * s,))
    y = yfull[..., ::decimation]
    if not jnp.iscomplexobj(x):
        y = y.real.astype(jnp.float32)
    new_history = x[..., n - (k - 1):]
    return y, new_history
