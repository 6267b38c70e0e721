"""Spectrum analyzer feeding the waterfall (batched windowed FFTs).

The reference accumulates IQ frames into a 512-frame buffer and runs a
Hamming-windowed complex FFT each time it fills, retaining only the latest
raw spectrum; HTTP threads convert to dB and fftshift on demand
(src/io/spectrumsink.cxx:88-142). Here the whole block's FFTs are computed
*batched* in one shot — the TPU-natural shape — and the caller keeps the
last row for API parity (or the full set for a dense waterfall, a strict
superset of the reference's 5 Hz poll).

Streaming state (SURVEY §5 "SpectrumSink fill offset + partial buffer") is a
``[F]``-frame tail buffer plus a fill offset. For block sizes that are a
multiple of the FFT size — true for every reference configuration
(102 400 IQ frames, F=512) — the offset is invariant across blocks, so the
step stays static-shaped; the general case uses one dynamic slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .window import hamming

DEFAULT_FFT_SIZE = 512  # src/io/spectrumsink.h:34


@functools.partial(jax.jit, static_argnames=("fft_size",))
def spectrum_accumulate(
    x: jax.Array,
    tail: jax.Array,
    offset: jax.Array,
    fft_size: int = DEFAULT_FFT_SIZE,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Window + FFT every complete ``fft_size``-frame group in the stream.

    Args:
      x: ``[N]`` complex64 IQ with ``N % fft_size == 0``.
      tail: ``[fft_size]`` complex64 — the last ``fft_size`` frames of the
        previous block (zeros initially); only its trailing ``offset`` frames
        are stream residue.
      offset: uint32 scalar fill offset (spectrumsink.cxx:102-117). With
        ``N % fft_size == 0`` it is carried through unchanged.
      fft_size: power-of-2 FFT length (spectrumsink.cxx:53-57).

    Returns ``(spectra, new_tail, offset)`` where ``spectra`` is
    ``[N // fft_size, fft_size]`` complex64 raw FFT rows in stream order
    (``spectra[-1]`` is the reference's "latest" frame).
    """
    n = x.shape[-1]
    if n % fft_size:
        raise ValueError("block length must be a multiple of fft_size")
    ext = jnp.concatenate([tail, x])  # [F + N]
    start = jnp.uint32(fft_size) - offset
    aligned = jax.lax.dynamic_slice_in_dim(ext, start.astype(jnp.int32), n)
    groups = aligned.reshape(n // fft_size, fft_size)
    win = jnp.asarray(hamming(fft_size))
    spectra = jnp.fft.fft(groups * win, axis=-1).astype(jnp.complex64)
    new_tail = x[n - fft_size:]
    return spectra, new_tail, offset


@jax.jit
def spectrum_db(spec: jax.Array) -> jax.Array:
    """Raw FFT rows -> dB magnitudes in ascending-frequency order.

    ``10*log10(re^2 + im^2) - 20*log10(N)`` with fftshift bin reordering,
    per src/io/spectrumsink.cxx:125-142. Zero power maps to ``-inf``
    (the JSON layer substitutes -10000 like waterfallhandler.cxx:62-66).
    """
    n = spec.shape[-1]
    scaledb = np.float32(20.0) * np.log10(np.float32(n))
    power = spec.real**2 + spec.imag**2
    db = np.float32(10.0) * jnp.log10(power) - scaledb
    return jnp.fft.fftshift(db, axes=-1).astype(jnp.float32)
