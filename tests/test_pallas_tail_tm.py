"""Parity test for the time-major fused Pallas tail (interpret mode on CPU).

The kernel is auto-selected by channelized_step at large channel counts
(see ops/pallas_tail_tm.py's measured verdict); its semantics must stay
bit-near the unfused chain it mirrors, including the mixed-domain
history carry interchangeability.
"""

import numpy as np
import jax.numpy as jnp

from webradio_tpu import ops
from webradio_tpu.ops.pallas_tail_tm import fused_tail_tm, TIME_TILE, CHAN_TILE


def test_matches_unfused_chain(rng):
    nd, c, k = 2 * TIME_TILE, CHAN_TILE, 64
    ci = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
    cq = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
    p0 = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    st = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    mode = jnp.asarray((np.arange(c) % 4).astype(np.int32))
    hi = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    hq = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32))
    coeff = np.asarray(ops.design_lowpass_fir(600_000, 2_400_000))
    w = jnp.asarray(ops.toeplitz_weights(coeff, 1, 128))

    mi, mq = ops.nco_mix_tm(ci, cq, p0, st)
    x2 = jnp.concatenate([mi, mq], axis=1)
    y2, nh2 = ops.fir_decimate_toeplitz_tm(
        x2, w, 1, jnp.concatenate([hi, hq], axis=1))
    ref_audio, ref_prev = ops.demodulate_tm(y2[:, :c], y2[:, c:], mode, prev)

    audio, nhi, nhq, nprev, power = fused_tail_tm(
        ci, cq, p0, st, w, mode, hi, hq, prev)

    # packed mode addresses the [nd, 2C] product in place — bit-identical
    y2in = jnp.concatenate([ci, cq], axis=1)
    p_audio, p_nhi, p_nhq, p_nprev, p_power = fused_tail_tm(
        y2in, y2in, p0, st, w, mode, hi, hq, prev, packed=True)
    np.testing.assert_array_equal(np.asarray(p_audio), np.asarray(audio))
    np.testing.assert_array_equal(np.asarray(p_nhi), np.asarray(nhi))
    np.testing.assert_array_equal(np.asarray(p_nhq), np.asarray(nhq))
    np.testing.assert_array_equal(np.asarray(p_nprev), np.asarray(nprev))
    np.testing.assert_array_equal(np.asarray(p_power), np.asarray(power))

    np.testing.assert_allclose(np.asarray(audio), np.asarray(ref_audio),
                               atol=3e-6)
    # in-kernel squelch power == post-shaping-FIR mean |y|^2 (the unified
    # cross-engine gate basis)
    ref_power = jnp.mean(y2[:, :c] ** 2 + y2[:, c:] ** 2, axis=0)
    np.testing.assert_allclose(np.asarray(power), np.asarray(ref_power),
                               rtol=1e-5)
    # history carries are bit-identical (pure pass-through of mixed rows)
    np.testing.assert_allclose(np.asarray(nhi), np.asarray(nh2[:, :c]),
                               atol=0)
    np.testing.assert_allclose(np.asarray(nhq), np.asarray(nh2[:, c:]),
                               atol=0)
    np.testing.assert_allclose(np.asarray(nprev), np.asarray(ref_prev),
                               atol=1e-6)


def test_audio_fused_matches_unfused_chain(rng):
    """fused_tail_audio_tm == fused_tail_tm + fir_decimate_toeplitz_tm,
    including the audio-domain history carry across blocks."""
    from webradio_tpu.ops.pallas_tail_tm import fused_tail_audio_tm

    nd, c, k, d = 2560, CHAN_TILE, 64, 5
    p0 = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    st = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    mode = jnp.asarray((np.arange(c) % 4).astype(np.int32))
    coeff = np.asarray(ops.design_lowpass_fir(600_000, 2_400_000))
    w = jnp.asarray(ops.toeplitz_weights(coeff, 1, 128))
    acoeff = np.asarray(ops.design_lowpass_fir(8_000, 240_000))
    wa = jnp.asarray(ops.toeplitz_weights(acoeff, d, 32))

    hi = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    hq = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32))
    ahist = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))

    f_hi, f_hq, f_prev, f_ahist = hi, hq, prev, ahist
    r_hi, r_hq, r_prev, r_ahist = hi, hq, prev, ahist.copy()
    for _ in range(2):  # two blocks: carries cross the boundary
        ci = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
        cq = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))

        mi, mq = ops.nco_mix_tm(ci, cq, p0, st)
        x2 = jnp.concatenate([mi, mq], axis=1)
        y2, nh2 = ops.fir_decimate_toeplitz_tm(
            x2, w, 1, jnp.concatenate([r_hi, r_hq], axis=1))
        r_hi, r_hq = nh2[:, :c], nh2[:, c:]
        a_ref, r_prev = ops.demodulate_tm(y2[:, :c], y2[:, c:], mode, r_prev)
        a48_ref, r_ahist = ops.fir_decimate_toeplitz_tm(a_ref, wa, d, r_ahist)

        a48, f_hi, f_hq, f_prev, f_ahist, power = fused_tail_audio_tm(
            ci, cq, p0, st, w, wa, d, mode, f_hi, f_hq, f_prev, f_ahist)

        np.testing.assert_allclose(np.asarray(a48), np.asarray(a48_ref),
                                   atol=3e-6)
        # in-kernel squelch power == post-shaping-FIR mean |y|^2 (the
        # unified cross-engine gate basis)
        np.testing.assert_allclose(
            np.asarray(power),
            np.asarray(jnp.mean(y2[:, :c] ** 2 + y2[:, c:] ** 2, axis=0)),
            rtol=1e-5)
        np.testing.assert_allclose(np.asarray(f_ahist), np.asarray(r_ahist),
                                   atol=3e-6)
        np.testing.assert_allclose(np.asarray(f_hi), np.asarray(r_hi), atol=0)
        np.testing.assert_allclose(np.asarray(f_hq), np.asarray(r_hq), atol=0)
        np.testing.assert_allclose(np.asarray(f_prev), np.asarray(r_prev),
                                   atol=1e-6)


def _b128_factored_mix(ci, cq, phase0, step, b=128):
    """The kernel's tile-anchored factored-phasor LO (FAST_LO_B=128),
    evaluated globally — bit-equivalent because every tile start is a
    multiple of B, so coarse/fine integer phases coincide exactly."""
    from webradio_tpu.ops.nco import PHASE_MASK

    nd = ci.shape[0]
    a = -(-nd // b)
    scale = np.float32(2.0 * np.pi / (1 << 31))
    pmask = jnp.uint32(PHASE_MASK)
    aidx = jnp.arange(a, dtype=jnp.uint32)
    bidx = jnp.arange(b, dtype=jnp.uint32)
    coarse = (phase0[None, :] + aidx[:, None] * (step[None, :] * jnp.uint32(b))) & pmask
    fine = (bidx[:, None] * step[None, :]) & pmask
    tc = coarse.astype(jnp.float32) * scale
    tf = fine.astype(jnp.float32) * scale
    sc, cc = jnp.sin(tc), jnp.cos(tc)
    sf, cf = jnp.sin(tf), jnp.cos(tf)
    cn = (cc[:, None, :] * cf[None, :, :] - sc[:, None, :] * sf[None, :, :])
    sn = (sc[:, None, :] * cf[None, :, :] + cc[:, None, :] * sf[None, :, :])
    cn = cn.reshape(a * b, -1)[:nd]
    sn = sn.reshape(a * b, -1)[:nd]
    return ci * cn + cq * sn, cq * cn - ci * sn


def test_fast_lo_matches_factored_chain(rng):
    """fast=True kernel == the factored-phasor mix + unfused FIR/demod
    (the cfg.fast_nco law, ops.nco.nco_mix_tm_fast semantics)."""
    nd, c, k = 2 * TIME_TILE, CHAN_TILE, 64
    ci = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
    cq = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
    p0 = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    st = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    mode = jnp.asarray((np.arange(c) % 4).astype(np.int32))
    hi = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    hq = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32))
    coeff = np.asarray(ops.design_lowpass_fir(600_000, 2_400_000))
    w = jnp.asarray(ops.toeplitz_weights(coeff, 1, 128))

    mi, mq = _b128_factored_mix(ci, cq, p0, st)
    x2 = jnp.concatenate([mi, mq], axis=1)
    y2, nh2 = ops.fir_decimate_toeplitz_tm(
        x2, w, 1, jnp.concatenate([hi, hq], axis=1))
    ref_audio, ref_prev = ops.demodulate_tm(y2[:, :c], y2[:, c:], mode, prev)

    audio, nhi, nhq, nprev, _ = fused_tail_tm(
        ci, cq, p0, st, w, mode, hi, hq, prev, fast=True)

    np.testing.assert_allclose(np.asarray(audio), np.asarray(ref_audio),
                               atol=3e-6)
    # carries are rounding-near, not bit-identical: XLA fuses the
    # reconstruction+mix chain into different FMA groupings in the two
    # compilation contexts (the table law's simpler chain fuses alike)
    np.testing.assert_allclose(np.asarray(nhi), np.asarray(nh2[:, :c]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(nhq), np.asarray(nh2[:, c:]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(nprev), np.asarray(ref_prev),
                               atol=1e-6)


def test_fast_lo_audio_variant_carried_blocks(rng):
    """fast=True audio-fused kernel across two carried blocks vs the
    factored mix + unfused chain (audio history crosses the boundary)."""
    from webradio_tpu.ops.pallas_tail_tm import fused_tail_audio_tm

    nd, c, k, d = 2560, CHAN_TILE, 64, 5
    p0 = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    st = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    mode = jnp.asarray((np.arange(c) % 4).astype(np.int32))
    coeff = np.asarray(ops.design_lowpass_fir(600_000, 2_400_000))
    w = jnp.asarray(ops.toeplitz_weights(coeff, 1, 128))
    acoeff = np.asarray(ops.design_lowpass_fir(8_000, 240_000))
    wa = jnp.asarray(ops.toeplitz_weights(acoeff, d, 32))

    hi = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    hq = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32))
    ahist = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))

    f_hi, f_hq, f_prev, f_ahist = hi, hq, prev, ahist
    r_hi, r_hq, r_prev, r_ahist = hi, hq, prev, ahist
    phase = p0
    from webradio_tpu.ops.nco import nco_advance
    for _ in range(2):
        ci = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
        cq = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))

        mi, mq = _b128_factored_mix(ci, cq, phase, st)
        x2 = jnp.concatenate([mi, mq], axis=1)
        y2, nh2 = ops.fir_decimate_toeplitz_tm(
            x2, w, 1, jnp.concatenate([r_hi, r_hq], axis=1))
        r_hi, r_hq = nh2[:, :c], nh2[:, c:]
        a_ref, r_prev = ops.demodulate_tm(y2[:, :c], y2[:, c:], mode, r_prev)
        a48_ref, r_ahist = ops.fir_decimate_toeplitz_tm(a_ref, wa, d, r_ahist)

        a48, f_hi, f_hq, f_prev, f_ahist, _ = fused_tail_audio_tm(
            ci, cq, phase, st, w, wa, d, mode, f_hi, f_hq, f_prev, f_ahist,
            fast=True)
        phase = nco_advance(phase, st, nd)

        np.testing.assert_allclose(np.asarray(a48), np.asarray(a48_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_hi), np.asarray(r_hi),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_hq), np.asarray(r_hq),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_ahist), np.asarray(r_ahist),
                                   atol=1e-5)


def test_pfb_fused_matches_pfb_plus_tail(rng):
    """fused_pfb_tail_audio_tm (filterbank matmul inside the kernel) ==
    pfb_channelize_direct_tm + fused_tail_audio_tm, across two carried
    blocks (filterbank history, mixed FIR tails, demod prev and audio
    history all cross the boundary)."""
    from webradio_tpu.ops.channelizer import (
        bin_weights_for_channels,
        design_prototype,
        pfb_channelize_direct_tm,
        pfb_frames_tm,
    )
    from webradio_tpu.ops.pallas_tail_tm import (
        fused_pfb_tail_audio_tm,
        fused_tail_audio_tm,
    )

    nbins, tpp = 8, 16
    kp = nbins * tpp
    c, k, d, nd = CHAN_TILE, 64, 5, 2560
    n = nd * nbins
    p0 = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    st = jnp.asarray(rng.integers(0, 2**20, c).astype(np.uint32))
    mode = jnp.asarray((np.arange(c) % 4).astype(np.int32))
    proto = design_prototype(1_024_000, nbins, tpp)
    bin_idx = (np.arange(c) % nbins).astype(np.int32)
    w_pfb = jnp.asarray(bin_weights_for_channels(proto, nbins, bin_idx))
    coeff = np.asarray(ops.design_lowpass_fir(60_000, 128_000))
    w = jnp.asarray(ops.toeplitz_weights(coeff, 1, 128))
    acoeff = np.asarray(ops.design_lowpass_fir(8_000, 128_000))
    wa = jnp.asarray(ops.toeplitz_weights(acoeff, d, 32))

    hi = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    hq = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32))
    ahist = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    pfb_hist = jnp.zeros((2, kp - 1), jnp.float32)

    f_state = (hi, hq, prev, ahist, pfb_hist)
    r_state = (hi, hq, prev, ahist, pfb_hist)
    phase = p0
    from webradio_tpu.ops.nco import nco_advance
    for _ in range(2):
        x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))

        ci, cq, r_pfb_hist = pfb_channelize_direct_tm(
            x, w_pfb, nbins, r_state[4])
        a_ref, r_hi, r_hq, r_prev, r_ahist, pw_ref = fused_tail_audio_tm(
            ci, cq, phase, st, w, wa, d, mode,
            r_state[0], r_state[1], r_state[2], r_state[3])
        r_state = (r_hi, r_hq, r_prev, r_ahist, r_pfb_hist)

        frames, f_pfb_hist = pfb_frames_tm(x, kp, nbins, f_state[4])
        a48, f_hi, f_hq, f_prev, f_ahist, pw = fused_pfb_tail_audio_tm(
            frames, w_pfb.reshape(2 * kp, 2 * c), phase, st, w, wa, d,
            mode, f_state[0], f_state[1], f_state[2], f_state[3])
        f_state = (f_hi, f_hq, f_prev, f_ahist, f_pfb_hist)
        phase = nco_advance(phase, st, nd)

        np.testing.assert_allclose(np.asarray(a48), np.asarray(a_ref),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(pw), np.asarray(pw_ref),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(f_hi), np.asarray(r_hi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_hq), np.asarray(r_hq),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f_ahist),
                                   np.asarray(r_ahist), atol=3e-5)
        np.testing.assert_array_equal(np.asarray(f_pfb_hist),
                                      np.asarray(r_pfb_hist))


def test_uniform_mode_tiles_match_mixed_path(rng):
    """Per-channel demod selection is lane-independent: a tile whose
    receivers all share one mode must produce exactly what those lanes
    produce inside a mixed-mode tile, for every law. (Also the guard
    test for any future uniform-mode fast path: a scalar-prefetch
    branchy variant was tried and MEASURED SLOWER on v5e — see
    BASELINE.md r3 — so the kernel deliberately keeps the straight-line
    four-law select.)"""
    nd, c, k = TIME_TILE, CHAN_TILE, 64
    ci = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
    cq = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32))
    p0 = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    st = jnp.asarray(rng.integers(0, 2**31, c).astype(np.uint32))
    hi = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    hq = jnp.asarray(rng.standard_normal((k - 1, c)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((2, c)).astype(np.float32))
    coeff = np.asarray(ops.design_lowpass_fir(600_000, 2_400_000))
    w = jnp.asarray(ops.toeplitz_weights(coeff, 1, 128))

    # mixed tile (modes vary per lane -> the -1 fallback branch)
    mixed = jnp.asarray((np.arange(c) % 4).astype(np.int32))
    a_mixed, *_ = fused_tail_tm(ci, cq, p0, st, w, mixed, hi, hq, prev)
    for m in range(4):
        uni = jnp.full(c, m, jnp.int32)
        a_uni, *_ = fused_tail_tm(ci, cq, p0, st, w, uni, hi, hq, prev)
        lanes = np.arange(c) % 4 == m
        # rounding-near, not bit-identical: the two branches compile to
        # different FMA groupings of the same math
        np.testing.assert_allclose(
            np.asarray(a_uni)[:, lanes], np.asarray(a_mixed)[:, lanes],
            atol=1e-6,
        )
