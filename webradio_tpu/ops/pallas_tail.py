"""Pallas fused receiver tail: residual mix + shaping FIR + demod in VMEM.

At large channel counts the channelized step's cost is the per-channel tail
at the decimated rate, and XLA materializes each stage to HBM: the mixed
block, the shaped block, and 64 strided re-reads for the FIR — several
full-size [2, C, nd] round-trips per 42.7 ms block. This kernel keeps one
(channel-tile, time-tile) of the stream resident in VMEM through

    residual NCO mix -> 64-tap shaping FIR (decim 1) -> AM/FM/USB/LSB demod

writing only the mono demodulated audio (plus the tiny per-tile state
carries) back to HBM — an ~8x cut in tail memory traffic.

Semantics are identical to the unfused ops (webradio_tpu/ops/{nco,fir,
demod}.py): quantized 31-bit/16-bit NCO phase (downconverter.cxx:35-52),
reversed-coefficient FIR with K-1 mixed-sample history (lowpass.cxx:131-
162), the reference demod laws including the FM ``atan2(ii, qq)`` argument
order (demodulator.cxx:83-112). Parity is enforced by tests against the
unfused path.

Layout: channels ride the sublane axis in tiles of 8, time rides the lane
axis in whole-``nd`` tiles (one 42.7 ms block at 240 ksps = 10240 lanes =
~40 KB/row; the working set per tile is ~3 MB of VMEM). The grid is
channel-tiles only; time tiling can be added for much longer blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nco import LOOKUP_BITS, LOOKUP_MASK, LOOKUP_SHIFT, PHASE_MASK
from .trig import atan2
from .demod import MODE_AM, MODE_FM, MODE_USB

_ANGLE_SCALE = np.float32(2.0 * np.pi / (1 << LOOKUP_BITS))
_INV_2PI = np.float32(1.0 / (2.0 * np.pi))

CHAN_TILE = 8  # float32 sublane granularity


def _tail_kernel(k_taps: int,
                 xi_ref, xq_ref, phase0_ref, step_ref, wflip_ref, mode_ref,
                 hist_i_ref, hist_q_ref, prev_i_ref, prev_q_ref,
                 audio_ref, nhist_i_ref, nhist_q_ref, nprev_i_ref,
                 nprev_q_ref):
    nd = xi_ref.shape[-1]
    k = k_taps

    # ---- residual NCO mix (quantized phase, conjugate LO) ----
    n = jax.lax.broadcasted_iota(jnp.uint32, (CHAN_TILE, nd), 1)
    phases = (phase0_ref[:] + n * step_ref[:]) & jnp.uint32(PHASE_MASK)
    sinidx = phases >> LOOKUP_SHIFT
    cosidx = (sinidx + jnp.uint32((1 << LOOKUP_BITS) // 4)) & jnp.uint32(
        LOOKUP_MASK
    )
    # Mosaic has no uint32->float32 cast; both indices are < 2^16 so the
    # int32 detour is exact
    s = jnp.sin(sinidx.astype(jnp.int32).astype(jnp.float32) * _ANGLE_SCALE)
    c = jnp.sin(cosidx.astype(jnp.int32).astype(jnp.float32) * _ANGLE_SCALE)
    xi, xq = xi_ref[:], xq_ref[:]
    mi = xi * c + xq * s
    mq = xq * c - xi * s

    # ---- shaping FIR, decim 1, K-1 mixed-history carry ----
    ei = jnp.concatenate([hist_i_ref[:], mi], axis=-1)  # [8, nd + K - 1]
    eq = jnp.concatenate([hist_q_ref[:], mq], axis=-1)
    acc_i = jnp.zeros((CHAN_TILE, nd), jnp.float32)
    acc_q = jnp.zeros((CHAN_TILE, nd), jnp.float32)
    for tap in range(k):
        w = wflip_ref[:, tap][:, None]
        acc_i = acc_i + w * ei[:, tap : tap + nd]
        acc_q = acc_q + w * eq[:, tap : tap + nd]

    # ---- demodulation (all laws, per-channel select) ----
    am = jnp.sqrt(acc_i * acc_i + acc_q * acc_q)
    pi_ = jnp.concatenate([prev_i_ref[:], acc_i[:, : nd - 1]], axis=-1)
    pq_ = jnp.concatenate([prev_q_ref[:], acc_q[:, : nd - 1]], axis=-1)
    ii = acc_i * pi_ + acc_q * pq_
    qq = acc_q * pi_ - acc_i * pq_
    fm = atan2(ii, qq) * _INV_2PI  # reference arg order, demodulator.cxx:97
    usb = acc_i + acc_q
    lsb = acc_i - acc_q
    m = mode_ref[:]
    audio = jnp.where(
        m == MODE_AM, am,
        jnp.where(m == MODE_FM, fm, jnp.where(m == MODE_USB, usb, lsb)),
    )

    # ---- outputs + state carries ----
    audio_ref[:] = audio
    nhist_i_ref[:] = mi[:, nd - (k - 1):]
    nhist_q_ref[:] = mq[:, nd - (k - 1):]
    nprev_i_ref[:] = acc_i[:, nd - 1 :]
    nprev_q_ref[:] = acc_q[:, nd - 1 :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_receiver_tail(
    chan_in: jax.Array,
    phase0: jax.Array,
    phase_step: jax.Array,
    chan_coeff: jax.Array,
    mode: jax.Array,
    chan_hist: jax.Array,
    demod_prev: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused mix+FIR+demod over ``[2, C, nd]`` selected-bin planes.

    Args mirror the unfused pipeline stage:
      chan_in: ``[2, C, nd]`` float32 (selected filterbank bins).
      phase0 / phase_step: ``[C]`` uint32 residual NCO state/step.
      chan_coeff: ``[C, K]`` float32 design-order coefficients.
      mode: ``[C]`` int32 demod law.
      chan_hist: ``[2, C, K-1]`` float32 mixed-sample history.
      demod_prev: ``[2, C]`` float32 FM previous sample.

    Returns ``(audio [C, nd], new_chan_hist, new_demod_prev)``. C must be
    a multiple of CHAN_TILE (pipeline configs pad capacity accordingly).
    """
    c = chan_in.shape[1]
    nd = chan_in.shape[2]
    k = chan_coeff.shape[-1]
    if c % CHAN_TILE:
        raise ValueError(f"channel count {c} must be a multiple of {CHAN_TILE}")
    tiles = c // CHAN_TILE

    wflip = jnp.flip(chan_coeff, axis=-1).astype(jnp.float32)
    # 2-D scalar-per-channel operands (lane dim 1 broadcasts in-kernel)
    phase0_2d = phase0[:, None]
    step_2d = phase_step[:, None]
    mode_2d = mode.astype(jnp.int32)[:, None]
    prev_i = demod_prev[0][:, None]
    prev_q = demod_prev[1][:, None]

    chan_spec = lambda width: pl.BlockSpec(
        (CHAN_TILE, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shapes = (
        jax.ShapeDtypeStruct((c, nd), jnp.float32),       # audio
        jax.ShapeDtypeStruct((c, k - 1), jnp.float32),    # new hist i
        jax.ShapeDtypeStruct((c, k - 1), jnp.float32),    # new hist q
        jax.ShapeDtypeStruct((c, 1), jnp.float32),        # new prev i
        jax.ShapeDtypeStruct((c, 1), jnp.float32),        # new prev q
    )
    audio, nhi, nhq, npi, npq = pl.pallas_call(
        functools.partial(_tail_kernel, k),
        grid=(tiles,),
        in_specs=[
            chan_spec(nd), chan_spec(nd),           # x planes
            chan_spec(1), chan_spec(1),             # phase0, step
            chan_spec(k),                           # flipped coeffs
            chan_spec(1),                           # mode
            chan_spec(k - 1), chan_spec(k - 1),     # history planes
            chan_spec(1), chan_spec(1),             # demod prev planes
        ],
        out_specs=(
            chan_spec(nd),
            chan_spec(k - 1), chan_spec(k - 1),
            chan_spec(1), chan_spec(1),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(
        chan_in[0], chan_in[1], phase0_2d, step_2d, wflip, mode_2d,
        chan_hist[0], chan_hist[1], prev_i, prev_q,
    )
    new_hist = jnp.stack([nhi, nhq])
    new_prev = jnp.stack([npi[:, 0], npq[:, 0]])
    return audio, new_hist, new_prev
