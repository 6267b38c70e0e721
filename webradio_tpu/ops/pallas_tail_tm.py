"""Pallas fused time-major receiver tail: mix + shaping FIR + demod.

The unfused time-major tail (pipeline/channelized.py) is already
MXU-shaped, but XLA still round-trips each stage through HBM: the mixed
planes (2x [nd, C]) are written by the NCO fusion and re-read by the FIR
matmuls, and the shaped planes are written again before the demod fusion
reads them — ~350 MB of avoidable traffic per 42.7 ms block at C=1024.
This kernel keeps one (time-tile x channel-tile) slab resident in VMEM
through

    residual NCO mix -> shared 64-tap shaping FIR (decim 1, MXU) -> demod

writing back only the demodulated audio plus the tiny carries.

**Measured verdict (v5e): the kernel wins from C=512 up.** With the
factored-phasor LO and sub-tiled audio FIR, the full channelized step is
a dead heat at C=512 (1.96 vs 1.99 ms/block), 36% faster at 1024 and
3.3x at 8192 (7.56 vs 24.94): the XLA chain's halo-as-second-matmul FIR
pays an extra full write+read of the [nd, C] planes, while this kernel's
single HBM round-trip dominates. ``channelized_step`` auto-selects it
above ``PALLAS_TM_AUTO_THRESHOLD`` channels (pipeline/channelized.py).
Raising CHAN_TILE past 128 exceeds VMEM with these slab sizes.

Semantics are identical to the unfused ops (bit-near; float32 everywhere):
quantized 31/16-bit NCO phase (ops/nco.py, downconverter.cxx:35-52),
banded-Toeplitz FIR at HIGHEST precision (ops/fir.py, lowpass.cxx:131-162),
reference demod laws incl. the FM ``atan2(ii, qq)`` arg order
(ops/demod.py, demodulator.cxx:83-112). The cross-block FIR state is the
MIXED-domain input tail, exactly like the unfused path, so states are
interchangeable between the two.

Layout: time on sublanes (major), channels on lanes, grid
``(chan_tiles, time_tiles)`` with time innermost — the FM discriminator's
one-sample lag crosses time tiles through a VMEM scratch carry (TPU grids
execute sequentially, so scratch persists across grid steps). The K-1-row
mixed left halo each tile needs rides the same kind of scratch carry, so
the inputs are plain pipelined BlockSpec tiles of the raw planes — no
extended-plane materialization in HBM (an earlier manual-DMA design
concatenated history onto the planes, paying a full write+read of the
[nd, C] planes per block) and no blocking per-program DMA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nco import LOOKUP_BITS, LOOKUP_MASK, LOOKUP_SHIFT, PHASE_MASK
from .trig import atan2
from .demod import MODE_AM, MODE_FM, MODE_LSB, MODE_USB

_ANGLE_SCALE = np.float32(2.0 * np.pi / (1 << LOOKUP_BITS))
_INV_2PI = np.float32(1.0 / (2.0 * np.pi))

CHAN_TILE = 128  # lanes
TIME_TILE = 1024  # sublanes per program (multiple of the FIR tile T)


#: in-kernel shaping-FIR sub-tile: re-derive the banded weights at T=64
#: (span 63+64=127 -> ONE 128-row MXU K-tile per output row) from the
#: shared reversed kernel, instead of inheriting the XLA layer's T=128
#: tile (span 191 -> TWO K-tiles, half of them padded band zeros).
#: Bit-NEAR, not bit-identical: output rows whose 64-tap band straddles
#: the T=128 layout's two K-tiles accumulate their sum as two partials
#: there and one here (measured 4.8e-7 max audio delta — well inside
#: the framework's 3e-6 equality bound).
FIR_SUB_TILE = 64


def _fir_sub_default() -> bool:
    """Whether the kernels re-tile the shaping FIR to FIR_SUB_TILE
    (A/B override: WEBRADIO_TM_FIR_SUB=0/1). Resolved at trace time."""
    import os

    return os.environ.get("WEBRADIO_TM_FIR_SUB", "1") == "1"


def _maybe_subtile_shaping(w_toep, tg: int | None = None):
    """Return the kernel-facing shaping weights: the FIR_SUB_TILE-tiled
    band when eligible (shared kernel fits one K-tile and the sub-tile
    divides the time tile), else ``w_toep`` unchanged."""
    span, t = w_toep.shape
    k = span - t + 1
    sub = FIR_SUB_TILE
    if (not _fir_sub_default() or t == sub or k > sub + 1
            or (tg is not None and tg % sub != 0)):
        return w_toep
    rev = w_toep[:k, 0]  # column 0 holds the reversed shared kernel
    return jnp.stack(
        [jnp.pad(rev, (m, sub - 1 - m)) for m in range(sub)], axis=1
    )  # [sub + k - 1, sub]


def _interleave_default() -> bool:
    """Default FIR/demod body form for the audio kernels (A/B override:
    WEBRADIO_TM_INTERLEAVE=0/1). Resolved at trace time.

    MEASURED (v5e, full channelized step at C=32768/highest): the
    per-sub-tile interleaved body is a wash (25.01 vs 24.85 ms) — a
    Mosaic microbenchmark shows independent MXU and VPU streams already
    co-schedule at ~max(MXU, VPU) regardless of statement order, so the
    whole-tile concat form was never actually serializing. Kept as an
    opt-in (bit-identical audio; parity-tested) for hardware where the
    scheduler behaves differently."""
    import os

    return os.environ.get("WEBRADIO_TM_INTERLEAVE", "0") == "1"

_FULL_ANGLE_SCALE = np.float32(2.0 * np.pi / (1 << 31))


#: fine-grid period of the in-kernel factored-phasor LO. Each time tile's
#: row index splits as r = a*B + b; the LO phasor factors into
#: coarse[a] * fine[b] (exact uint32 phase arithmetic), so only
#: a + B ~ 2*sqrt(tile) sine evaluations are needed instead of 2*tile.
#: Both kernels' time tiles are multiples of 128, so tile anchoring is
#: exact (row0 % B == 0).
FAST_LO_B = 128


def _band_dot(a, b, prec):
    """``a @ b`` with float32 accumulation inside the kernel.

    Mosaic lowers only DEFAULT (bf16x1) and HIGHEST (bf16x6) dot
    precisions; ``HIGH`` is implemented here as the classical manual
    3-pass split — a = ah + al with ah = bf16(a), so
    a@b ~ ah@bh + ah@bl + al@bh (the dropped al@bl term is O(eps^2)).
    Half the MXU passes of HIGHEST at ~90 dB SNR vs the float32 form,
    ample for the audio chain (the reference is float32 end-to-end).
    """
    if prec != lax.Precision.HIGH:
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _make_band_dot(wt, prec):
    """``seg -> wt @ seg`` at the given FIR tier, pre-splitting the
    STATIC weight operand once per kernel body.

    Beyond the :func:`_band_dot` tiers (DEFAULT/HIGH/HIGHEST as 1/3/6
    bf16 MXU passes), the string tiers exploit that the weight operand
    is a constant matrix: a THREE-term bf16 split ``w = wh + wm + wl``
    is EXACT for any float32 (3 x 8 mantissa bits cover f32's 24; each
    residual is computed exactly in f32 by Sterbenz cancellation), so
    only the data operand's split truncates:

      "hx5": wh@sh + wm@sh + wl@sh + wh@sl + wm@sl  — 5 passes; the
             only error left is the data residual ``s - sh - sl``
             (~2^-17 relative), vs HIGHEST's 6 passes at ~2^-24.
      "hx4": drops wl@sh — 4 passes; adds the ~2^-17 weight tail the
             3-term split was covering. Measured on-device: 6.3e-7 max
             audio deviation vs hx5's 4.7e-7 (BASELINE r4).

    A hypothetical 3-pass "hx3" (also dropping wm@sl) is ALGEBRAICALLY
    lax.Precision.HIGH — wh@sh + wm@sh + wh@sl is exactly the 2-term
    split's kept products — and measured byte-identical errors on
    device; use "high".

    The weight split runs per kernel body on a [T, span] matrix —
    noise next to the [tg, C_tile] data work.
    """
    if prec in ("hx5", "hx4"):
        wh = wt.astype(jnp.bfloat16)
        r1 = wt - wh.astype(jnp.float32)
        wm = r1.astype(jnp.bfloat16)
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)

        def dot(seg):
            sh = seg.astype(jnp.bfloat16)
            sl = (seg - sh.astype(jnp.float32)).astype(jnp.bfloat16)
            out = d(wh, sh) + (d(wm, sh) + d(wh, sl)) + d(wm, sl)
            if prec == "hx5":
                wl = (r1 - wm.astype(jnp.float32)).astype(jnp.bfloat16)
                out = out + d(wl, sh)
            return out

        return dot
    return lambda seg: _band_dot(wt, seg, prec)


def _demod_laws(yi, yq, lag_i, lag_q, mode, mode_set):
    """Per-sample demod (reference laws, demodulator.cxx:83-112) with
    STATIC law specialization: only the laws in ``mode_set`` — the set
    of distinct per-channel modes, known host-side when params are
    built — are evaluated. ``None`` evaluates all four (the generic
    kernel). With one law present (the common all-FM monitoring case)
    the select chain disappears entirely; r3's runtime-branch
    experiment lost to straight-line code, but a TRACE-TIME
    specialization has no branch to pay for."""
    want = ((MODE_AM, MODE_FM, MODE_USB, MODE_LSB) if mode_set is None
            else tuple(sorted(set(int(m) for m in mode_set))))
    vals = []
    for m in want:
        if m == MODE_AM:
            vals.append((m, jnp.sqrt(yi * yi + yq * yq)))
        elif m == MODE_FM:
            ii = yi * lag_i + yq * lag_q
            qq = yq * lag_i - yi * lag_q
            vals.append((m, atan2(ii, qq) * _INV_2PI))  # reference arg order
        elif m == MODE_USB:
            vals.append((m, yi + yq))
        else:
            vals.append((m, yi - yq))
    audio = vals[-1][1]
    for m, law in vals[-2::-1]:
        audio = jnp.where(mode[None, :] == m, law, audio)
    return audio


def _tile_lo(fast, tg, row0, phase0, step, fine_s, fine_c):
    """LO sin/cos for tile rows ``0..tg-1`` (sample ``row0 + r``).

    ``fast=False``: the reference's 16-bit quantized-table semantics
    (downconverter.cxx:35-52) — one sin per sample, plus a per-sample
    uint32 phase multiply. ``fast=True``: the factored-phasor law of
    ops.nco.nco_mix_tm_fast (full 31-bit angle, strictly more accurate
    than the table) — the dominant VPU cost of the whole tail drops from
    2 transcendentals + 1 int multiply per sample to 4 multiply-adds
    (measured at C=32768: the two per-sample sins alone were ~21 ms of a
    46 ms kernel). ``fine_s``/``fine_c`` are VMEM scratch holding the
    step-only fine table, computed once per channel tile (it is
    row0-independent) and reused across the sequential time grid.
    """
    pmask = jnp.uint32(PHASE_MASK)
    if not fast:
        r = jax.lax.broadcasted_iota(jnp.int32, (tg, CHAN_TILE), 0)
        n = (row0 + r).astype(jnp.uint32)
        phases = (phase0[None, :] + n * step[None, :]) & pmask
        sinidx = phases >> LOOKUP_SHIFT
        cosidx = (sinidx + jnp.uint32((1 << LOOKUP_BITS) // 4)) & jnp.uint32(
            LOOKUP_MASK
        )
        s = jnp.sin(sinidx.astype(jnp.int32).astype(jnp.float32) * _ANGLE_SCALE)
        c = jnp.sin(cosidx.astype(jnp.int32).astype(jnp.float32) * _ANGLE_SCALE)
        return s, c
    b = FAST_LO_B
    a = tg // b

    @pl.when(pl.program_id(1) == 0)
    def _():
        bidx = jax.lax.broadcasted_iota(jnp.int32, (b, CHAN_TILE), 0).astype(
            jnp.uint32
        )
        # Mosaic has no uint32->float32 cast; the masked phase fits 31
        # bits, so the int32 round-trip is exact
        tf = ((bidx * step[None, :]) & pmask).astype(jnp.int32).astype(
            jnp.float32
        ) * _FULL_ANGLE_SCALE
        fine_s[:] = jnp.sin(tf)
        fine_c[:] = jnp.cos(tf)

    aidx = jax.lax.broadcasted_iota(jnp.int32, (a, CHAN_TILE), 0).astype(
        jnp.uint32
    )
    base = phase0[None, :] + row0.astype(jnp.uint32) * step[None, :]
    coarse = (base + aidx * (step[None, :] * jnp.uint32(b))) & pmask
    tc = coarse.astype(jnp.int32).astype(jnp.float32) * _FULL_ANGLE_SCALE
    sc, cc = jnp.sin(tc), jnp.cos(tc)
    sf, cf = fine_s[:], fine_c[:]
    # angle addition per coarse row: [b, C] blocks, statically unrolled
    s_rows, c_rows = [], []
    for ai in range(a):
        c_rows.append(cc[ai:ai + 1, :] * cf - sc[ai:ai + 1, :] * sf)
        s_rows.append(sc[ai:ai + 1, :] * cf + cc[ai:ai + 1, :] * sf)
    return (
        jnp.concatenate(s_rows, axis=0),
        jnp.concatenate(c_rows, axis=0),
    )


def _kernel(k_taps, fir_tile, nd, prec, fast, mode_set,
            ci_ref, cq_ref, phase0_ref, step_ref, mode_ref, prev_ref,
            w_ref, hi0_ref, hq0_ref,
            audio_ref, nprev_ref, histi_ref, histq_ref, power_ref,
            halo_i, halo_q, lag_ref, pacc_ref, fine_s, fine_c):
    k = k_taps
    t = fir_tile
    tg = TIME_TILE
    ti = pl.program_id(1)
    n_ti = pl.num_programs(1)
    row0 = ti * tg

    # ---- residual NCO mix ----------------------------------------------
    # tile row r holds sample n = row0 + r; the K-1-row mixed left halo is
    # carried tile-to-tile in VMEM scratch (the time grid is sequential),
    # so the inputs are plain pipelined BlockSpec tiles of the raw planes
    # rather than manually DMA'd overlapping windows of extended planes
    phase0 = phase0_ref[0, :]
    step = step_ref[0, :]
    s, c = _tile_lo(fast, tg, row0, phase0, step, fine_s, fine_c)
    # bf16-stored packed product (pfb_precision "bf16"): upcast at load,
    # all arithmetic stays float32
    xi = ci_ref[:].astype(jnp.float32)
    xq = cq_ref[:].astype(jnp.float32)
    mi_d = xi * c + xq * s
    mq_d = xq * c - xi * s

    @pl.when(ti == 0)
    def _():
        # tile 0's left halo: the previous block's already-mixed tail
        halo_i[:] = hi0_ref[:]
        halo_q[:] = hq0_ref[:]
        pacc_ref[:] = jnp.zeros_like(pacc_ref)

    mi = jnp.concatenate([halo_i[:], mi_d], axis=0)  # [tg + K - 1, C_tile]
    mq = jnp.concatenate([halo_q[:], mq_d], axis=0)
    halo_i[:] = mi_d[tg - (k - 1):, :]
    halo_q[:] = mq_d[tg - (k - 1):, :]

    # ---- shaping FIR: banded-Toeplitz MXU products ----------------------
    # out rows j*T..(j+1)*T from mixed rows j*T..j*T+span
    span = t + k - 1
    wt = w_ref[:].T  # [T, span]
    band = _make_band_dot(wt, prec)
    outs_i, outs_q = [], []
    for j in range(tg // t):
        seg_i = lax.slice_in_dim(mi, j * t, j * t + span, axis=0)
        seg_q = lax.slice_in_dim(mq, j * t, j * t + span, axis=0)
        outs_i.append(band(seg_i))
        outs_q.append(band(seg_q))
    yi = jnp.concatenate(outs_i, axis=0)  # [tg, C_tile]
    yq = jnp.concatenate(outs_q, axis=0)

    # squelch gate power: POST-shaping-FIR (in-band) magnitude squared —
    # the same basis as the direct engine (pipeline/frontend.py passes the
    # shaped planes to _apply_gain_squelch), so one threshold behaves
    # identically across engines
    pacc_ref[:] += jnp.sum(yi * yi + yq * yq, axis=0, keepdims=True)

    # ---- demod (AM/FM/USB/LSB), FM lag crosses tiles via scratch --------
    @pl.when(ti == 0)
    def _():
        lag_ref[:] = prev_ref[:]  # [2, C_tile] from carried state

    lag_i = jnp.concatenate([lag_ref[0:1, :], yi[:-1, :]], axis=0)
    lag_q = jnp.concatenate([lag_ref[1:2, :], yq[:-1, :]], axis=0)

    # straight-line laws + select (see _demod_laws: runtime branches
    # measured slower; mode_set is the trace-time specialization)
    audio_ref[:] = _demod_laws(yi, yq, lag_i, lag_q, mode_ref[0, :],
                               mode_set)
    lag_ref[0, :] = yi[tg - 1, :]
    lag_ref[1, :] = yq[tg - 1, :]

    # ---- carries out on the last time tile ------------------------------
    @pl.when(ti == n_ti - 1)
    def _():
        nprev_ref[0, :] = yi[tg - 1, :]
        nprev_ref[1, :] = yq[tg - 1, :]
        histi_ref[:] = mi_d[tg - (k - 1):, :]  # last K-1 mixed rows
        histq_ref[:] = mq_d[tg - (k - 1):, :]
        power_ref[:] = pacc_ref[:] * np.float32(1.0 / nd)


@functools.partial(
    jax.jit, static_argnames=("interpret", "precision", "packed", "fast",
                              "mode_set")
)
def fused_tail_tm(
    ci_planes: jax.Array,
    cq_planes: jax.Array,
    phase0: jax.Array,
    phase_step: jax.Array,
    w_toep: jax.Array,
    mode: jax.Array,
    chan_hist_i: jax.Array,
    chan_hist_q: jax.Array,
    demod_prev: jax.Array,
    interpret: bool = False,
    precision: lax.Precision = lax.Precision.HIGHEST,
    packed: bool = False,
    fast: bool = False,
    mode_set: tuple | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused mix+FIR+demod over time-major planes.

    Args:
      ci_planes / cq_planes: ``[nd, C]`` float32 selected-bin planes
        (pfb_channelize_direct_tm output). ``nd % TIME_TILE == 0``,
        ``C % CHAN_TILE == 0``. With ``packed=True``, both are the SAME
        ``[nd, 2C]`` array (columns ``[:C]`` = I, ``[C:]`` = Q — the raw
        filterbank matmul product): the kernel's BlockSpecs address the I
        and Q column tiles directly, avoiding the two dense column-slice
        copies XLA would materialize before the custom call.
      phase0 / phase_step: ``[C]`` uint32 residual NCO state (phase of the
        first sample of this block) / per-sample step.
      w_toep: ``[span, T]`` shared banded weights (ops.toeplitz_weights,
        decim 1); ``TIME_TILE % T == 0``.
      mode: ``[C]`` int32 demod law.
      chan_hist_i / chan_hist_q: ``[K-1, C]`` MIXED-domain input tails of
        the previous block (same carry as the unfused tm path).
      demod_prev: ``[2, C]`` float32 FM previous shaped sample.
      fast: factored-phasor LO (ops.nco.nco_mix_tm_fast semantics — full
        31-bit angle) instead of the reference's 16-bit table law; cuts
        the mixer's per-sample transcendentals ~50x (see _tile_lo).

    Returns ``(audio [nd, C], new_hist_i, new_hist_q, new_demod_prev,
    power [C])`` — ``power`` is the block-mean POST-shaping-FIR magnitude
    squared per channel (the squelch gate basis, unified with the direct
    engine's post-FIR gate).
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    w_toep = _maybe_subtile_shaping(w_toep, TIME_TILE)
    nd, c = ci_planes.shape
    if packed:
        c //= 2
    span, t = w_toep.shape
    k = span - t + 1
    if nd % TIME_TILE:
        raise ValueError(f"nd {nd} must be a multiple of {TIME_TILE}")
    if c % CHAN_TILE:
        raise ValueError(f"channels {c} must be a multiple of {CHAN_TILE}")
    if TIME_TILE % t:
        raise ValueError(f"TIME_TILE must be a multiple of the FIR tile {t}")
    if TIME_TILE < k - 1:
        # the halo carry slices mi_d[tile-(k-1):] — a shorter tile would
        # silently wrap the slice and produce wrong audio
        raise ValueError(
            f"time tile {TIME_TILE} must cover the K-1={k - 1} halo rows"
        )
    if chan_hist_i.shape[0] != k - 1:
        raise ValueError("history length does not match the kernel")
    if fast and TIME_TILE % FAST_LO_B:
        raise ValueError("fast LO requires the time tile to be a "
                         f"multiple of {FAST_LO_B}")

    grid = (c // CHAN_TILE, nd // TIME_TILE)
    chan_cols = lambda i, j, *_: (0, i)
    time_chan = lambda i, j, *_: (j, i)
    n_ct = c // CHAN_TILE
    # packed planes: the Q columns live n_ct channel tiles to the right
    time_chan_q = (lambda i, j, *_: (j, i + n_ct)) if packed else time_chan

    audio, nprev, histi, histq, power = pl.pallas_call(
        functools.partial(_kernel, k, t, nd, precision, fast, mode_set),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TIME_TILE, CHAN_TILE), time_chan,
                         memory_space=pltpu.VMEM),  # ci (pipelined)
            pl.BlockSpec((TIME_TILE, CHAN_TILE), time_chan_q,
                         memory_space=pltpu.VMEM),  # cq
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # phase0
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # step
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mode
            pl.BlockSpec((2, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # demod_prev
            pl.BlockSpec((span, t), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mixed hist I
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mixed hist Q
        ],
        out_specs=(
            pl.BlockSpec((TIME_TILE, CHAN_TILE), time_chan,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((k - 1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((k - 1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((2, CHAN_TILE), jnp.float32),
            pltpu.VMEM((1, CHAN_TILE), jnp.float32),  # power accumulator
            pltpu.VMEM((FAST_LO_B, CHAN_TILE), jnp.float32),  # fine sin
            pltpu.VMEM((FAST_LO_B, CHAN_TILE), jnp.float32),  # fine cos
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nd, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
    )(
        ci_planes, cq_planes,
        phase0[None, :], phase_step[None, :],
        mode.astype(jnp.int32)[None, :], demod_prev,
        w_toep, chan_hist_i, chan_hist_q,
    )
    return audio, histi, histq, nprev, power[0]


# ---------------------------------------------------------------------------
# audio-FIR-fused variant: mix + shaping FIR + demod + decimating audio FIR
# ---------------------------------------------------------------------------

def _audio_tail_core(k_taps, fir_tile, d, tg, nd, prec, fast, mode_set,
                     interleave, xi, xq,
                     phase0_ref, step_ref, mode_ref,
                     prev_ref, w_ref, wa_ref, ahist0_ref, hi0_ref, hq0_ref,
                     audio_ref, nprev_ref, histi_ref, histq_ref, ahist_ref,
                     power_ref,
                     halo_i, halo_q, lag_ref, atail_ref, pacc_ref,
                     fine_s, fine_c):
    """One (chan, time) program: the :func:`_kernel` chain plus the
    decimating audio FIR, so the channel-rate audio plane never touches
    HBM. The audio-domain cross-tile carry (last K rows of each tile's
    audio) rides the ``atail_ref`` VMEM scratch, sequential over the
    innermost time grid exactly like the FM ``lag_ref``. ``xi``/``xq``
    are the selected-bin VALUES for this tile — loaded from plane tiles
    (:func:`_kernel_audio`) or produced by the in-VMEM filterbank matmul
    (:func:`_kernel_pfb_audio`).

    The inputs are plain BlockSpec tiles (Pallas double-buffers the
    fetches): the K-1-row mixed left halo each tile needs is carried
    tile-to-tile in the ``halo_i/halo_q`` scratch instead of
    materializing extended planes in HBM (which cost a full write+read
    of the [nd, C] planes per block). The squelch power sum (mean
    post-shaping-FIR |y|^2, the cross-engine unified gate basis)
    accumulates in ``pacc_ref`` for the same reason."""
    k = k_taps
    t = fir_tile
    ti = pl.program_id(1)
    n_ti = pl.num_programs(1)
    row0 = ti * tg

    # ---- residual NCO mix (table or factored-phasor law, as _kernel) ----
    # tile row r holds sample n = row0 + r (data rows only; the mixed
    # halo is carried, never recomputed)
    phase0 = phase0_ref[0, :]
    step = step_ref[0, :]
    s, c = _tile_lo(fast, tg, row0, phase0, step, fine_s, fine_c)
    mi_d = xi * c + xq * s
    mq_d = xq * c - xi * s

    @pl.when(ti == 0)
    def _():
        # block-carried state: previous block's mixed tail + power reset
        halo_i[:] = hi0_ref[:]
        halo_q[:] = hq0_ref[:]
        pacc_ref[:] = jnp.zeros_like(pacc_ref)

    mi = jnp.concatenate([halo_i[:], mi_d], axis=0)  # [tg + K - 1, C_tile]
    mq = jnp.concatenate([halo_q[:], mq_d], axis=0)
    halo_i[:] = mi_d[tg - (k - 1):, :]
    halo_q[:] = mq_d[tg - (k - 1):, :]

    # ---- shaping FIR + demod -------------------------------------------
    span = t + k - 1
    wt = w_ref[:].T  # [T, span]
    band = _make_band_dot(wt, prec)
    mode = mode_ref[0, :]

    @pl.when(ti == 0)
    def _():
        lag_ref[:] = prev_ref[:]
        atail_ref[1:, :] = ahist0_ref[:]  # block-carried audio history

    if interleave:
        # per-sub-tile FIR->demod: demod(j) depends only on dot(j) (plus
        # dot(j-1)'s last row for the FM lag), so Mosaic's scheduler can
        # run demod(j)'s VPU work concurrently with dot(j+1)'s MXU passes
        # — the whole-tile concat form below serializes ALL dots before
        # any demod (measured: interleaved MXU+VPU streams cost
        # ~max(MXU, VPU), not the sum)
        lag_row_i = lag_ref[0:1, :]
        lag_row_q = lag_ref[1:2, :]
        audio_subs = []
        psub = jnp.zeros((1, xi.shape[-1]), jnp.float32)
        last_i = last_q = None
        for j in range(tg // t):
            seg_i = lax.slice_in_dim(mi, j * t, j * t + span, axis=0)
            seg_q = lax.slice_in_dim(mq, j * t, j * t + span, axis=0)
            y_i = band(seg_i)
            y_q = band(seg_q)
            li = jnp.concatenate([lag_row_i, y_i[:-1, :]], axis=0)
            lq = jnp.concatenate([lag_row_q, y_q[:-1, :]], axis=0)
            audio_subs.append(_demod_laws(y_i, y_q, li, lq, mode, mode_set))
            psub = psub + jnp.sum(y_i * y_i + y_q * y_q, axis=0,
                                  keepdims=True)
            lag_row_i = y_i[t - 1:, :]
            lag_row_q = y_q[t - 1:, :]
            last_i, last_q = y_i, y_q
        audio = jnp.concatenate(audio_subs, axis=0)  # [tg, C_tile]
        pacc_ref[:] += psub
        lag_ref[0, :] = last_i[t - 1, :]
        lag_ref[1, :] = last_q[t - 1, :]
    else:
        outs_i, outs_q = [], []
        for j in range(tg // t):
            seg_i = lax.slice_in_dim(mi, j * t, j * t + span, axis=0)
            seg_q = lax.slice_in_dim(mq, j * t, j * t + span, axis=0)
            outs_i.append(band(seg_i))
            outs_q.append(band(seg_q))
        yi = jnp.concatenate(outs_i, axis=0)  # [tg, C_tile]
        yq = jnp.concatenate(outs_q, axis=0)

        # squelch power: POST-shaping-FIR basis, unified with the direct
        # engine
        pacc_ref[:] += jnp.sum(yi * yi + yq * yq, axis=0, keepdims=True)

        lag_i = jnp.concatenate([lag_ref[0:1, :], yi[:-1, :]], axis=0)
        lag_q = jnp.concatenate([lag_ref[1:2, :], yq[:-1, :]], axis=0)

        # straight-line laws + select: MEASURED faster than a per-tile
        # uniform-mode scalar-prefetch RUNTIME branch (pl.when) writing a
        # VMEM scratch (+3.4 ms at C=32768/FM — register pressure + the
        # scratch round-trip); mode_set is the TRACE-TIME specialization
        # that removes absent laws with no branch at all
        audio = _demod_laws(yi, yq, lag_i, lag_q, mode, mode_set)
        lag_ref[0, :] = yi[tg - 1, :]
        lag_ref[1, :] = yq[tg - 1, :]

    # ---- decimating audio FIR: sub-tiled banded matmuls -----------------
    # ext_a[0] is audio-domain row row0-(K-1); output m of this tile reads
    # ext_a rows m*d .. m*d+K-1 (the fir_decimate_toeplitz_tm contract).
    # The band is only K wide but a dense [T_a, span_a] dot pays for the
    # whole (T_a-1)*D+K span — sub-tiling the output rows keeps the dense
    # span near K (span_sub = (ta_sub-1)*D+K), cutting the padded-zero
    # MXU FLOPs ~(T_a*D)/(ta_sub*D) at large tiles.
    t_a = tg // d
    span_a = (t_a - 1) * d + k
    span_sub, ta_sub = wa_ref.shape
    ext_a = jnp.concatenate([atail_ref[1:, :], audio], axis=0)[:span_a]
    wa_t = wa_ref[:].T  # [ta_sub, span_sub]
    band_a = _make_band_dot(wa_t, prec)
    outs_a = []
    for jj in range(t_a // ta_sub):
        seg = lax.slice_in_dim(
            ext_a, jj * ta_sub * d, jj * ta_sub * d + span_sub, axis=0
        )
        outs_a.append(band_a(seg))
    audio_ref[:] = jnp.concatenate(outs_a, axis=0)  # [T_a, C_tile]
    atail_ref[:] = audio[tg - k:, :]  # last K audio rows (row 0 unused)

    # ---- carries out on the last time tile ------------------------------
    @pl.when(ti == n_ti - 1)
    def _():
        # lag_ref was just set to the tile's last shaped (yi, yq) row —
        # exactly the demod_prev carry, in both FIR/demod body forms
        nprev_ref[:] = lag_ref[:]
        histi_ref[:] = mi_d[tg - (k - 1):, :]
        histq_ref[:] = mq_d[tg - (k - 1):, :]
        ahist_ref[:] = audio[tg - (k - 1):, :]
        power_ref[:] = pacc_ref[:] * np.float32(1.0 / nd)


def _kernel_audio(k_taps, fir_tile, d, tg, nd, prec, fast, mode_set,
                  interleave, ci_ref, cq_ref, *rest):
    """Plane-fed audio tail: selected-bin tiles arrive as inputs
    (float32, or bfloat16 for the bf16-stored product tier — upcast at
    load, arithmetic stays float32)."""
    _audio_tail_core(k_taps, fir_tile, d, tg, nd, prec, fast, mode_set,
                     interleave, ci_ref[:].astype(jnp.float32),
                     cq_ref[:].astype(jnp.float32), *rest)


def _kernel_pfb_audio(k_taps, fir_tile, d, tg, nd, prec, fast, mode_set,
                      interleave, pfb_prec,
                      fr_ref, wi_ref, wq_ref, *rest):
    """Filterbank-fused audio tail: the selected-bin values are produced
    HERE by the polyphase filterbank matmul on the im2col frame tile, so
    the packed ``[nd, 2C]`` product — the single largest HBM tenant of
    the channelized step (5.4 GB of write+read per 42.7 ms block at
    C=32768) — never exists in HBM. Inputs per tile: the shared frame
    rows ``[tg, 2 K_p]`` (~1.6 MB, pipelined per time step) and this
    channel tile's weight columns (fetched once per channel tile — the
    time grid is innermost, so the unchanged index map skips the DMA).

    ``pfb_prec`` sets the filterbank dot's MXU pass count via
    :func:`_band_dot` (HIGH = manual bf16x3, ~96 dB vs float32; DEFAULT
    = one bf16 pass, ~51 dB) — the XLA filterbank matmul is given the
    same precision, so fused and unfused paths stay aligned."""
    fr = fr_ref[:]
    xi = _band_dot(fr, wi_ref[:], pfb_prec)
    xq = _band_dot(fr, wq_ref[:], pfb_prec)
    _audio_tail_core(k_taps, fir_tile, d, tg, nd, prec, fast, mode_set,
                     interleave, xi, xq, *rest)


#: output-row sub-tile for the in-kernel decimating audio FIR (see
#: _kernel_audio). Pulled small by band density (the dense span grows
#: ``ta_sub * D``-fast around the fixed K-wide band) and large by MXU
#: row utilisation. At stock rates (D=5, K=64): 64 -> span 379 (3 MXU
#: K-tiles per output row), 32 -> 219 (2 K-tiles), 16 -> 139, 8 -> 99
#: (1 K-tile). r5 full-step A/B at C=73728/highest/serving: 64 -> 39.65
#: ms, 32 -> 38.76, 16 -> 38.23, 8 -> 38.25 — K-tile count beats row
#: occupancy exactly as in the shaping-FIR re-tile (BASELINE r4 #8);
#: 16 is the measured optimum. Env-overridable for A/B runs.
AUDIO_SUB_TILE = int(os.environ.get("WEBRADIO_AUDIO_SUB_TILE", "16"))


def _audio_sub_tile(t_a: int) -> int:
    """Largest eligible audio-FIR sub-tile dividing ``t_a``."""
    for cand in (AUDIO_SUB_TILE, 32, 16, 8):
        if cand <= t_a and t_a % cand == 0:
            return cand
    return t_a


def _audio_time_tile(nd: int, d: int, fir_tile: int) -> int:
    """Largest time-tile <= 2048 that divides nd and is a multiple of both
    the shaping-FIR tile and the audio decimation; 0 if none exists."""
    import math

    base = fir_tile * d // math.gcd(fir_tile, d)
    best = 0
    m = base
    while m <= 2048:
        if nd % m == 0:
            best = m
        m += base
    return best


@functools.partial(
    jax.jit,
    static_argnames=("decimation", "interpret", "precision", "packed",
                     "fast", "mode_set", "interleave"),
)
def fused_tail_audio_tm(
    ci_planes: jax.Array,
    cq_planes: jax.Array,
    phase0: jax.Array,
    phase_step: jax.Array,
    w_toep: jax.Array,
    audio_toep: jax.Array,
    decimation: int,
    mode: jax.Array,
    chan_hist_i: jax.Array,
    chan_hist_q: jax.Array,
    demod_prev: jax.Array,
    audio_hist: jax.Array,
    interpret: bool = False,
    precision: lax.Precision = lax.Precision.HIGHEST,
    packed: bool = False,
    fast: bool = False,
    mode_set: tuple | None = None,
    interleave: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array,
           jax.Array]:
    """:func:`fused_tail_tm` extended through the decimating audio FIR.

    The channel-rate audio plane ([nd, C], the largest intermediate of
    the whole receiver tail) stays in VMEM: each time tile demodulates
    and immediately folds its audio rows through the banded audio-FIR
    matmul, carrying the K-1-row audio history across tiles in scratch.
    Saves a full write+read of that plane per block vs running
    ``fir_decimate_toeplitz_tm`` after :func:`fused_tail_tm`.

    Extra args vs :func:`fused_tail_tm`:
      audio_toep: ``[span, T]`` banded audio weights (any eligible tile —
        only its first column, the reversed kernel, is used; the kernel
        builds tile-matched weights internally).
      decimation: channel-rate -> audio-rate ratio.
      audio_hist: ``[K-1, C]`` audio-domain history carry.
      packed: as in :func:`fused_tail_tm` — both plane args are the same
        ``[nd, 2C]`` filterbank product, addressed in place.

    Returns ``(audio48 [nd // decimation, C], new_hist_i, new_hist_q,
    new_demod_prev, new_audio_hist, power [C])`` where ``power`` is the
    block-mean POST-shaping-FIR magnitude-squared per channel (the
    squelch gate signal, unified with the direct engine's post-FIR
    basis) — computed in-kernel so the planes are read exactly once.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if interleave is None:
        interleave = _interleave_default()
    w_toep = _maybe_subtile_shaping(w_toep)
    nd, c = ci_planes.shape
    if packed:
        c //= 2
    d = int(decimation)
    span, t = w_toep.shape
    k = span - t + 1
    if c % CHAN_TILE:
        raise ValueError(f"channels {c} must be a multiple of {CHAN_TILE}")
    if chan_hist_i.shape[0] != k - 1 or audio_hist.shape[0] != k - 1:
        raise ValueError("history length does not match the kernel")
    tg = _audio_time_tile(nd, d, t)
    if tg == 0:
        raise ValueError(
            f"no time tile divides nd={nd} for tile={t}, decim={d}"
        )
    if tg < k - 1:
        # the halo carry slices mi_d[tg-(k-1):] — a shorter tile would
        # silently wrap the slice and produce wrong audio
        raise ValueError(
            f"time tile {tg} must cover the K-1={k - 1} halo rows"
        )
    if fast and tg % FAST_LO_B:
        raise ValueError("fast LO requires the time tile to be a "
                         f"multiple of {FAST_LO_B}")
    t_a = tg // d
    ta_sub = _audio_sub_tile(t_a)
    span_sub = (ta_sub - 1) * d + k

    # sub-tile-matched audio weights from the shared reversed kernel
    # (column 0 of any banded audio weight matrix); the kernel loops the
    # sub-tile down the t_a output rows (see _kernel_audio)
    rev = audio_toep[:k, 0]
    wa = jnp.stack(
        [jnp.pad(rev, (m * d, span_sub - m * d - k)) for m in range(ta_sub)],
        axis=1,
    )  # [span_sub, ta_sub]

    grid = (c // CHAN_TILE, nd // tg)
    chan_cols = lambda i, j, *_: (0, i)
    time_chan = lambda i, j, *_: (j, i)
    n_ct = c // CHAN_TILE
    # packed planes: the Q columns live n_ct channel tiles to the right
    time_chan_q = (lambda i, j, *_: (j, i + n_ct)) if packed else time_chan

    audio48, nprev, histi, histq, ahist, power = pl.pallas_call(
        functools.partial(_kernel_audio, k, t, d, tg, nd, precision, fast,
                          mode_set, interleave),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tg, CHAN_TILE), time_chan,
                         memory_space=pltpu.VMEM),  # ci (pipelined)
            pl.BlockSpec((tg, CHAN_TILE), time_chan_q,
                         memory_space=pltpu.VMEM),  # cq
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # phase0
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # step
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mode
            pl.BlockSpec((2, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # demod_prev
            pl.BlockSpec((span, t), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # shaping weights
            pl.BlockSpec((span_sub, ta_sub), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # audio weights
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # audio history carry
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mixed hist I
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mixed hist Q
        ],
        out_specs=(
            pl.BlockSpec((t_a, CHAN_TILE), time_chan,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((k - 1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((k - 1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((2, CHAN_TILE), jnp.float32),
            pltpu.VMEM((k, CHAN_TILE), jnp.float32),
            pltpu.VMEM((1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((FAST_LO_B, CHAN_TILE), jnp.float32),  # fine sin
            pltpu.VMEM((FAST_LO_B, CHAN_TILE), jnp.float32),  # fine cos
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nd // d, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
    )(
        ci_planes, cq_planes,
        phase0[None, :], phase_step[None, :],
        mode.astype(jnp.int32)[None, :], demod_prev,
        w_toep, wa, audio_hist, chan_hist_i, chan_hist_q,
    )
    return audio48, histi, histq, nprev, ahist, power[0]


@functools.partial(
    jax.jit,
    static_argnames=("decimation", "interpret", "precision", "packed",
                     "fast", "pfb_precision", "mode_set", "interleave"),
)
def fused_pfb_tail_audio_tm(
    frames: jax.Array,
    pfb_weights: jax.Array,
    phase0: jax.Array,
    phase_step: jax.Array,
    w_toep: jax.Array,
    audio_toep: jax.Array,
    decimation: int,
    mode: jax.Array,
    chan_hist_i: jax.Array,
    chan_hist_q: jax.Array,
    demod_prev: jax.Array,
    audio_hist: jax.Array,
    interpret: bool = False,
    precision: lax.Precision = lax.Precision.HIGHEST,
    packed: bool = True,  # signature parity; frames are inherently packed
    fast: bool = False,
    pfb_precision: lax.Precision = lax.Precision.DEFAULT,
    mode_set: tuple | None = None,
    interleave: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """:func:`fused_tail_audio_tm` with the polyphase filterbank matmul
    fused into the kernel's first pass.

    The whole channelized receiver tail becomes ONE kernel::

        im2col frame tile -> filterbank matmul -> residual NCO mix ->
        shaping FIR -> demod -> decimating audio FIR

    with only the 48 kHz audio, the carries, and the squelch power
    leaving VMEM. HBM traffic per block drops from (write + read) of the
    packed ``[nd, 2C]`` product — 5.4 GB at C=32768 — to
    ``chan_tiles x`` re-reads of the small ``[nd, 2 K_p]`` frame tensor
    (~13 MB x C/128 at stock rates) plus one pass over the weights.

    Args vs :func:`fused_tail_audio_tm`:
      frames: ``[nd, 2 K_p]`` float32 im2col frames
        (:func:`webradio_tpu.ops.channelizer.pfb_frames_tm`).
      pfb_weights: ``[2 K_p, 2 C]`` float32 packed filterbank weights
        (``bin_weights_for_channels`` reshaped) — columns ``[:C]``
        produce mixed I, ``[C:]`` mixed Q.
      pfb_precision: the in-kernel filterbank dot's precision, mapped
        from ``ChannelizedConfig.pfb_precision`` by the channelized step
        (same lax.Precision the XLA matmul would use: DEFAULT = one bf16
        pass, HIGH = manual bf16x3 via :func:`_band_dot`, HIGHEST =
        bf16x6). The u8exact tier is not supported in this kernel
        (config validation rejects the combination).

    Returns ``(audio48 [nd // decimation, C], new_hist_i, new_hist_q,
    new_demod_prev, new_audio_hist, power [C])`` exactly like
    :func:`fused_tail_audio_tm`.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if interpret and pfb_precision == lax.Precision.HIGH:
        # CPU/interpret: the XLA filterbank matmul runs full float32
        # (precision flags are TPU pass counts); skip the manual bf16x3
        # split so both engines agree bit-near off-TPU
        pfb_precision = lax.Precision.HIGHEST
    if interleave is None:
        interleave = _interleave_default()
    w_toep = _maybe_subtile_shaping(w_toep)
    nd, kp2 = frames.shape
    c = pfb_weights.shape[-1] // 2
    d = int(decimation)
    span, t = w_toep.shape
    k = span - t + 1
    if pfb_weights.shape[0] != kp2:
        raise ValueError("frames/weights contraction mismatch")
    if c % CHAN_TILE:
        raise ValueError(f"channels {c} must be a multiple of {CHAN_TILE}")
    if chan_hist_i.shape[0] != k - 1 or audio_hist.shape[0] != k - 1:
        raise ValueError("history length does not match the kernel")
    tg = _audio_time_tile(nd, d, t)
    if tg == 0:
        raise ValueError(
            f"no time tile divides nd={nd} for tile={t}, decim={d}"
        )
    if tg < k - 1:
        raise ValueError(
            f"time tile {tg} must cover the K-1={k - 1} halo rows"
        )
    if fast and tg % FAST_LO_B:
        raise ValueError("fast LO requires the time tile to be a "
                         f"multiple of {FAST_LO_B}")
    t_a = tg // d
    ta_sub = _audio_sub_tile(t_a)
    span_sub = (ta_sub - 1) * d + k

    rev = audio_toep[:k, 0]
    wa = jnp.stack(
        [jnp.pad(rev, (m * d, span_sub - m * d - k)) for m in range(ta_sub)],
        axis=1,
    )  # [span_sub, ta_sub]

    grid = (c // CHAN_TILE, nd // tg)
    chan_cols = lambda i, j, *_: (0, i)
    time_chan = lambda i, j, *_: (j, i)
    n_ct = c // CHAN_TILE

    audio48, nprev, histi, histq, ahist, power = pl.pallas_call(
        functools.partial(_kernel_pfb_audio, k, t, d, tg, nd, precision,
                          fast, mode_set, interleave, pfb_precision),
        grid=grid,
        in_specs=[
            # shared frame rows for this time step (refetched per channel
            # tile — the index map ignores i, so within one channel tile
            # the fetch pipelines across the inner time grid)
            pl.BlockSpec((tg, kp2), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
            # this channel tile's I / Q weight columns of the SAME packed
            # array; the maps ignore j, so the DMA runs once per channel
            # tile and is reused across the whole inner time grid
            pl.BlockSpec((kp2, CHAN_TILE), lambda i, j, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp2, CHAN_TILE), lambda i, j, *_: (0, i + n_ct),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # phase0
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # step
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mode
            pl.BlockSpec((2, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # demod_prev
            pl.BlockSpec((span, t), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # shaping weights
            pl.BlockSpec((span_sub, ta_sub), lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # audio weights
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # audio history carry
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mixed hist I
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),  # mixed hist Q
        ],
        out_specs=(
            pl.BlockSpec((t_a, CHAN_TILE), time_chan,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k - 1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHAN_TILE), chan_cols,
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((k - 1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((k - 1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((2, CHAN_TILE), jnp.float32),
            pltpu.VMEM((k, CHAN_TILE), jnp.float32),
            pltpu.VMEM((1, CHAN_TILE), jnp.float32),
            pltpu.VMEM((FAST_LO_B, CHAN_TILE), jnp.float32),  # fine sin
            pltpu.VMEM((FAST_LO_B, CHAN_TILE), jnp.float32),  # fine cos
        ],
        out_shape=(
            jax.ShapeDtypeStruct((nd // d, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((k - 1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
    )(
        frames, pfb_weights, pfb_weights,
        phase0[None, :], phase_step[None, :],
        mode.astype(jnp.int32)[None, :], demod_prev,
        w_toep, wa, audio_hist, chan_hist_i, chan_hist_q,
    )
    return audio48, histi, histq, nprev, ahist, power[0]
