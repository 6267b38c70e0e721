"""Pallas fused receiver tail: residual mix + shaping FIR + demod in VMEM.

At large channel counts the channelized step's cost is the per-channel tail
at the decimated rate, and XLA materializes each stage to HBM: the mixed
block, the shaped block, and 64 strided re-reads for the FIR — several
full-size [2, C, nd] round-trips per 42.7 ms block. This kernel keeps the
stream resident in VMEM through

    residual NCO mix -> 64-tap shaping FIR (decim 1) -> AM/FM/USB/LSB demod

writing only the mono demodulated audio (plus the tiny per-tile state
carries) back to HBM — an ~8x cut in tail memory traffic.

Differences from the unfused chain worth knowing:

* The cross-block FIR state is the **raw** (pre-mix) input tail, not the
  mixed tail — chunks re-mix their own left context from closed-form
  phases (``phase0 + n * step`` with signed ``n``), so no mixed samples
  ever round-trip. Results are identical (parity-tested).
* Time is processed in fixed chunks by an in-kernel ``fori_loop`` — large
  single-expression kernels (>~8k live lanes) crash this target's
  compiler, and the chunk loop keeps the body small regardless of block
  length.

Semantics match the unfused ops (webradio_tpu/ops/{nco,fir,demod}.py):
quantized 31-bit/16-bit NCO phase (downconverter.cxx:35-52), reversed-
coefficient FIR (lowpass.cxx:131-162), reference demod laws including the
FM ``atan2(ii, qq)`` argument order (demodulator.cxx:83-112).

Layout: channels on sublanes in tiles of 8 (the grid axis), time on lanes.
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
TIME_CHUNK = 1024  # lanes processed per in-kernel loop iteration


def _tail_kernel(k_taps: int, nd: int,
                 xi_ref, xq_ref, phase0_ref, step_ref, wflip_ref, mode_ref,
                 prev_i_ref, prev_q_ref,
                 audio_ref, nprev_i_ref, nprev_q_ref, power_ref):
    """Inputs are extended planes ``[8, nd + K]`` where lane ``l`` holds
    signal sample ``n = l - K`` (one zero lane, then the K-1 raw history
    samples, then the block)."""
    k = k_taps
    t = TIME_CHUNK
    num_chunks = nd // t
    seg_w = t + k

    phase0 = phase0_ref[:]
    step = step_ref[:]
    mode = mode_ref[:]
    w = [wflip_ref[:, tap][:, None] for tap in range(k)]

    def chunk_body(chunk, _):
        base = pl.multiple_of(chunk * t, t)
        seg_i = xi_ref[:, pl.ds(base, seg_w)]
        seg_q = xq_ref[:, pl.ds(base, seg_w)]

        # signed sample index n = base + l - K; uint32 wrap gives the
        # correct phase mod 2^31 for the (negative-n) history lanes too
        l = jax.lax.broadcasted_iota(jnp.int32, (CHAN_TILE, seg_w), 1)
        n = (base + l - k).astype(jnp.uint32)
        phases = (phase0 + n * step) & jnp.uint32(PHASE_MASK)
        sinidx = phases >> LOOKUP_SHIFT
        cosidx = (sinidx + jnp.uint32((1 << LOOKUP_BITS) // 4)) & jnp.uint32(
            LOOKUP_MASK
        )
        # Mosaic has no uint32->float32 cast; indices < 2^16 are exact
        # through int32
        s = jnp.sin(sinidx.astype(jnp.int32).astype(jnp.float32)
                    * _ANGLE_SCALE)
        c = jnp.sin(cosidx.astype(jnp.int32).astype(jnp.float32)
                    * _ANGLE_SCALE)
        mi = seg_i * c + seg_q * s
        mq = seg_q * c - seg_i * s

        # y_local[t'] for t' = 0..t: outputs m = base - 1 + t'
        acc_i = jnp.zeros((CHAN_TILE, t + 1), jnp.float32)
        acc_q = jnp.zeros((CHAN_TILE, t + 1), jnp.float32)
        for tap in range(k):
            acc_i = acc_i + w[tap] * mi[:, tap : tap + t + 1]
            acc_q = acc_q + w[tap] * mq[:, tap : tap + t + 1]

        # demod over outputs m = base .. base + t - 1, with y[m - 1] from
        # the previous lane; chunk 0's y[-1] comes from carried state
        cur_i, cur_q = acc_i[:, 1:], acc_q[:, 1:]
        lag_i, lag_q = acc_i[:, :t], acc_q[:, :t]
        state_prev_i = jnp.broadcast_to(prev_i_ref[:], (CHAN_TILE, t))
        state_prev_q = jnp.broadcast_to(prev_q_ref[:], (CHAN_TILE, t))
        first_lane = (
            jax.lax.broadcasted_iota(jnp.int32, (CHAN_TILE, t), 1) == 0
        )
        use_state = jnp.logical_and(first_lane, chunk == 0)
        pi_ = jnp.where(use_state, state_prev_i, lag_i)
        pq_ = jnp.where(use_state, state_prev_q, lag_q)

        am = jnp.sqrt(cur_i * cur_i + cur_q * cur_q)
        ii = cur_i * pi_ + cur_q * pq_
        qq = cur_q * pi_ - cur_i * pq_
        fm = atan2(ii, qq) * _INV_2PI  # reference arg order
        usb = cur_i + cur_q
        lsb = cur_i - cur_q
        audio = jnp.where(
            mode == MODE_AM, am,
            jnp.where(mode == MODE_FM, fm,
                      jnp.where(mode == MODE_USB, usb, lsb)),
        )
        audio_ref[:, pl.ds(base, t)] = audio
        # last chunk's final shaped sample is the next block's FM prev
        nprev_i_ref[:] = cur_i[:, t - 1 :]
        nprev_q_ref[:] = cur_q[:, t - 1 :]
        # squelch gate power: POST-shaping-FIR |y|^2 (the unified
        # cross-engine basis); chunk 0 initializes the accumulator
        psum = jnp.sum(cur_i * cur_i + cur_q * cur_q, axis=1,
                       keepdims=True)
        power_ref[:] = jnp.where(chunk == 0, psum, power_ref[:] + psum)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)
    power_ref[:] = power_ref[:] * np.float32(1.0 / nd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_receiver_tail(
    chan_in: jax.Array,
    phase0: jax.Array,
    phase_step: jax.Array,
    chan_coeff: jax.Array,
    mode: jax.Array,
    raw_hist: jax.Array,
    demod_prev: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused mix+FIR+demod over ``[2, C, nd]`` selected-bin planes.

    Args:
      chan_in: ``[2, C, nd]`` float32 (selected filterbank bins);
        ``nd`` must be a multiple of TIME_CHUNK, C of CHAN_TILE.
      phase0 / phase_step: ``[C]`` uint32 residual NCO state/step (phase of
        the FIRST sample of this block).
      chan_coeff: ``[C, K]`` float32 design-order coefficients.
      mode: ``[C]`` int32 demod law.
      raw_hist: ``[2, C, K-1]`` float32 — *raw* input tail of the previous
        block (pre-mix; the kernel re-mixes it at negative sample indices).
      demod_prev: ``[2, C]`` float32 FM previous (shaped) sample.

    Returns ``(audio [C, nd], new_raw_hist, new_demod_prev, power [C])``
    with ``power`` the block-mean post-shaping-FIR magnitude squared (the
    unified squelch gate basis).
    """
    # the compiled kernel targets TPU; other backends (tests, CPU servers)
    # run the interpreter transparently
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    c = chan_in.shape[1]
    nd = chan_in.shape[2]
    k = chan_coeff.shape[-1]
    if c % CHAN_TILE:
        raise ValueError(f"channel count {c} must be a multiple of {CHAN_TILE}")
    if nd % TIME_CHUNK:
        raise ValueError(f"block {nd} must be a multiple of {TIME_CHUNK}")
    tiles = c // CHAN_TILE

    # extended planes: [zero lane | K-1 raw history lanes | block]
    zero = jnp.zeros((2, c, 1), jnp.float32)
    ext = jnp.concatenate([zero, raw_hist, chan_in], axis=-1)  # [2,C,nd+K]

    wflip = jnp.flip(chan_coeff, axis=-1).astype(jnp.float32)
    phase0_2d = phase0[:, None]
    step_2d = phase_step[:, None]
    mode_2d = mode.astype(jnp.int32)[:, None]
    prev_i = demod_prev[0][:, None]
    prev_q = demod_prev[1][:, None]

    chan_spec = lambda width: pl.BlockSpec(
        (CHAN_TILE, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    audio, npi, npq, power = pl.pallas_call(
        functools.partial(_tail_kernel, k, nd),
        grid=(tiles,),
        in_specs=[
            chan_spec(nd + k), chan_spec(nd + k),
            chan_spec(1), chan_spec(1),
            chan_spec(k),
            chan_spec(1),
            chan_spec(1), chan_spec(1),
        ],
        out_specs=(chan_spec(nd), chan_spec(1), chan_spec(1),
                   chan_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((c, nd), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        ext[0], ext[1], phase0_2d, step_2d, wflip, mode_2d, prev_i, prev_q,
    )
    new_raw_hist = chan_in[:, :, nd - (k - 1):]
    new_prev = jnp.stack([npi[:, 0], npq[:, 0]])
    return audio, new_raw_hist, new_prev, power[:, 0]
