"""Fused Pallas receiver tail vs the unfused op chain (interpret mode on
CPU; the compiled path is exercised on real TPU by bench/probe runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from webradio_tpu import ops
from webradio_tpu.ops.pallas_tail import CHAN_TILE, fused_receiver_tail


def _inputs(c=16, nd=1280, k=64, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((2, c, nd)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 1 << 31, c).astype(np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 20, c).astype(np.uint32)),
        jnp.asarray((rng.standard_normal((c, k)) * 0.05).astype(np.float32)),
        jnp.asarray(np.arange(c, dtype=np.int32) % 4),
        jnp.asarray(rng.standard_normal((2, c, k - 1)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, c)).astype(np.float32)),
    )


def test_matches_unfused_chain():
    chan_in, phase0, step, coeff, mode, hist, prev = _inputs()
    mixed = ops.nco_mix(chan_in, phase0, step)
    shaped, nh = ops.fir_decimate(mixed, coeff, 1, hist)
    audio_ref, npv = ops.demodulate(shaped, mode, prev)

    audio, nh2, npv2 = fused_receiver_tail(
        chan_in, phase0, step, coeff, mode, hist, prev, interpret=True
    )
    np.testing.assert_allclose(audio, audio_ref, atol=2e-5)
    np.testing.assert_allclose(nh2, nh, atol=1e-6)
    np.testing.assert_allclose(npv2, npv, atol=1e-6)


def test_state_carry_block_invariance():
    """Two fused blocks == one double-length fused block."""
    chan_in, phase0, step, coeff, mode, hist, prev = _inputs(c=8, nd=2560)
    full, fh, fp = fused_receiver_tail(
        chan_in, phase0, step, coeff, mode, hist, prev, interpret=True
    )
    half = chan_in.shape[-1] // 2
    a1, h1, p1 = fused_receiver_tail(
        chan_in[:, :, :half], phase0, step, coeff, mode, hist, prev,
        interpret=True,
    )
    phase_mid = ops.nco_advance(phase0, step, half)
    a2, h2, p2 = fused_receiver_tail(
        chan_in[:, :, half:], phase_mid, step, coeff, mode, h1, p1,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.concatenate([a1, a2], axis=-1), full, atol=1e-6
    )
    np.testing.assert_allclose(h2, fh, atol=1e-6)
    np.testing.assert_allclose(p2, fp, atol=1e-6)


def test_rejects_unaligned_channels():
    chan_in, phase0, step, coeff, mode, hist, prev = _inputs(c=CHAN_TILE)
    with pytest.raises(ValueError):
        fused_receiver_tail(
            chan_in[:, :6], phase0[:6], step[:6], coeff[:6], mode[:6],
            hist[:, :6], prev[:, :6], interpret=True,
        )
