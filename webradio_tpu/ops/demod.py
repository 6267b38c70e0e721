"""Demodulation laws, block-vectorized with per-channel mode selection.

Reproduces src/dsp/demodulator.cxx:77-115 over ``[C, N]`` blocks:

* AM  — envelope ``sqrt(i^2 + q^2)``.
* FM  — multiply by the conjugate of the previous sample, then
  ``atan2(ii, qq) / 2pi``. The reference's argument order is swapped
  relative to the textbook discriminator (it yields pi/2 minus the phase
  delta); reproduced deliberately for audio parity (demodulator.cxx:97).
* USB / LSB — the reference's naive ``i + q`` / ``i - q`` forms
  (demodulator.cxx:99-104), not a Hilbert product detector.

The only cross-block state is FM's previous sample (``[C]`` complex64),
which the reference carries across blocks without reset
(demodulator.cxx:60-70,110-111). All four laws are evaluated and selected
per channel — on the VPU this costs a few elementwise passes, negligible
next to the FIR stages, and keeps the step free of data-dependent control
flow (XLA-friendly; modes switch live as plain parameters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Mode encoding matches the reference enum order (demodulator.cxx:37-41)
MODE_AM = 0
MODE_FM = 1
MODE_USB = 2
MODE_LSB = 3
MODES = ("AM", "FM", "USB", "LSB")

_INV_2PI = np.float32(1.0 / (2.0 * np.pi))


@jax.jit
def demodulate(
    x: jax.Array, mode: jax.Array, prev: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Demodulate ``[C, N]`` complex64 IQ to ``[C, N]`` float32 audio.

    Args:
      x: ``[C, N]`` complex64 at the channel (post-filter) rate.
      mode: ``[C]`` int32, values from :data:`MODE_AM`.. :data:`MODE_LSB`.
      prev: ``[C]`` complex64 — previous sample for the FM discriminator
        (zeros for a fresh stream).

    Returns ``(audio, new_prev)`` with ``new_prev = x[:, -1]``.
    """
    i = x.real
    q = x.imag

    am = jnp.sqrt(i * i + q * q)

    xprev = jnp.concatenate([prev[:, None], x[:, :-1]], axis=-1)
    pi_, pq = xprev.real, xprev.imag
    ii = i * pi_ + q * pq
    qq = q * pi_ - i * pq
    fm = jnp.arctan2(ii, qq) * _INV_2PI  # reference arg order, demodulator.cxx:97

    usb = i + q
    lsb = i - q

    stacked = jnp.stack([am, fm, usb, lsb], axis=0)  # [4, C, N]
    audio = jnp.take_along_axis(
        stacked, mode.astype(jnp.int32)[None, :, None], axis=0
    )[0]
    return audio.astype(jnp.float32), x[:, -1]
