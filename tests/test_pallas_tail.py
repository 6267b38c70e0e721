"""Fused Pallas receiver tail vs the unfused op chain (interpret mode on
CPU; the compiled path is exercised on real TPU by bench/probe runs).

The fused kernel carries the *raw* input tail and re-mixes it in-kernel,
whereas the unfused chain carries mixed samples — so parity is asserted
over a carried multi-block stream, which exercises both state contracts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from webradio_tpu import ops
from webradio_tpu.ops.pallas_tail import (
    CHAN_TILE,
    TIME_CHUNK,
    fused_receiver_tail,
)

C, ND, K = 8, 2 * TIME_CHUNK, 64


def _params(c=C, k=K, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.integers(0, 1 << 20, c).astype(np.uint32)),  # step
        jnp.asarray((rng.standard_normal((c, k)) * 0.05).astype(np.float32)),
        jnp.asarray(np.arange(c, dtype=np.int32) % 4),
    )


def _stream(blocks=2, c=C, nd=ND, seed=1):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.standard_normal((2, c, nd)).astype(np.float32))
        for _ in range(blocks)
    ]


def test_matches_unfused_chain_across_blocks():
    step, coeff, mode = _params()
    blocks = _stream()

    # unfused reference: mixed-history carry
    phase = jnp.zeros(C, jnp.uint32)
    hist = jnp.zeros((2, C, K - 1), jnp.float32)
    prev = jnp.zeros((2, C), jnp.float32)
    ref = []
    for b in blocks:
        mixed = ops.nco_mix(b, phase, step)
        shaped, hist = ops.fir_decimate(mixed, coeff, 1, hist)
        audio, prev = ops.demodulate(shaped, mode, prev)
        phase = ops.nco_advance(phase, step, b.shape[-1])
        ref.append(np.asarray(audio))

    # fused: raw-history carry
    phase = jnp.zeros(C, jnp.uint32)
    raw_hist = jnp.zeros((2, C, K - 1), jnp.float32)
    prev = jnp.zeros((2, C), jnp.float32)
    got = []
    for b in blocks:
        audio, raw_hist, prev, _ = fused_receiver_tail(
            b, phase, step, coeff, mode, raw_hist, prev, interpret=True
        )
        phase = ops.nco_advance(phase, step, b.shape[-1])
        got.append(np.asarray(audio))

    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, atol=3e-5)


def test_block_size_invariance():
    """One 2-chunk block == two 1-chunk blocks through the fused kernel."""
    step, coeff, mode = _params(seed=3)
    (x,) = _stream(blocks=1, seed=4)
    phase0 = jnp.zeros(C, jnp.uint32)
    hist0 = jnp.zeros((2, C, K - 1), jnp.float32)
    prev0 = jnp.zeros((2, C), jnp.float32)

    full, fh, fp, _ = fused_receiver_tail(
        x, phase0, step, coeff, mode, hist0, prev0, interpret=True
    )
    half = ND // 2
    a1, h1, p1, _ = fused_receiver_tail(
        x[:, :, :half], phase0, step, coeff, mode, hist0, prev0,
        interpret=True,
    )
    a2, h2, p2, _ = fused_receiver_tail(
        x[:, :, half:], ops.nco_advance(phase0, step, half), step, coeff,
        mode, h1, p1, interpret=True,
    )
    np.testing.assert_allclose(
        np.concatenate([a1, a2], axis=-1), full, atol=1e-5
    )
    np.testing.assert_allclose(h2, fh, atol=0)
    np.testing.assert_allclose(p2, fp, atol=1e-5)


def test_rejects_bad_shapes():
    step, coeff, mode = _params()
    (x,) = _stream(blocks=1)
    hist = jnp.zeros((2, C, K - 1), jnp.float32)
    prev = jnp.zeros((2, C), jnp.float32)
    with pytest.raises(ValueError):
        fused_receiver_tail(x[:, :6], jnp.zeros(6, jnp.uint32), step[:6],
                            coeff[:6], mode[:6], hist[:, :6], prev[:, :6],
                            interpret=True)
    with pytest.raises(ValueError):
        fused_receiver_tail(x[:, :, : TIME_CHUNK + 8],
                            jnp.zeros(C, jnp.uint32), step, coeff, mode,
                            hist, prev, interpret=True)


def test_channelized_step_with_fused_tail():
    """channelized_step(use_pallas_tail=True) matches the unfused step
    (interpret forced by the CPU backend) across carried blocks."""
    from webradio_tpu.pipeline.channelized import (
        ChannelizedConfig,
        channelized_step,
        init_channelized_state,
        make_channelized_params,
    )

    common = dict(
        sample_rate=2_400_000, channel_rate=240_000, audio_rate=48_000,
        block_frames=10_240 * 10, num_channels=8,
    )
    ifs = [i * 11_000 for i in range(8)]
    modes = ["FM", "AM", "USB", "LSB"] * 2

    rng = np.random.default_rng(9)
    blocks = [
        jnp.asarray(rng.standard_normal((2, common["block_frames"]))
                    .astype(np.float32))
        for _ in range(2)
    ]

    cfg_u = ChannelizedConfig(**common)
    p_u = make_channelized_params(cfg_u, ifs, 80_000, 8_000, modes)
    s_u = init_channelized_state(cfg_u)
    ref = []
    for b in blocks:
        s_u, audio, _ = channelized_step(cfg_u, p_u, s_u, b)
        ref.append(np.asarray(audio))

    cfg_f = ChannelizedConfig(**common, use_pallas_tail=True)
    p_f = make_channelized_params(cfg_f, ifs, 80_000, 8_000, modes)
    s_f = init_channelized_state(cfg_f)
    got = []
    for b in blocks:
        s_f, audio, _ = channelized_step(cfg_f, p_f, s_f, b)
        got.append(np.asarray(audio))

    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, atol=3e-5)
