"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from webradio_tpu.pipeline import (
    ChainConfig,
    init_state,
    make_receiver_params,
    frontend_step,
)
from webradio_tpu.parallel import make_mesh, mesh_shape_for, ShardedFrontEnd
from conftest import make_iq, snr_db

CFG = ChainConfig(
    sample_rate=1_024_000,
    channel_rate=128_000,
    audio_rate=32_000,
    block_frames=16_384,
    num_channels=4,
)


def _params():
    return make_receiver_params(
        CFG,
        if_hz=[100_000, 0, -50_000, 25_000],
        if_bandwidth_hz=[80_000, 80_000, 40_000, 80_000],
        af_bandwidth_hz=[8_000] * 4,
        mode=["FM", "AM", "USB", "LSB"],
    )


def _reference_audio(iq, n_blocks=2):
    params = _params()
    state = init_state(CFG)
    outs, specs = [], []
    for b in range(n_blocks):
        blk = iq[:, b * CFG.block_frames : (b + 1) * CFG.block_frames]
        state, audio, spectra = frontend_step(CFG, params, state, blk)
        outs.append(np.asarray(audio))
        specs.append(np.asarray(spectra))
    return state, np.concatenate(outs, -1), np.concatenate(specs, 1)


@pytest.mark.parametrize("tshape", [(1, 4), (2, 2), (4, 2), (2, 4), (8, 1)])
def test_sharded_matches_single_device(rng, tshape):
    t, c = tshape
    if c > CFG.num_channels:
        pytest.skip("more chan shards than channels")
    mesh = make_mesh(t, c)
    iq_np = make_iq(rng, 2 * CFG.block_frames, "fm", fs=CFG.sample_rate)
    iq = jnp.asarray(np.ascontiguousarray(iq_np.T))  # [2, N] planes

    ref_state, ref_audio, ref_spec = _reference_audio(iq)

    fe = ShardedFrontEnd(CFG, _params(), mesh)
    outs, specs = [], []
    for b in range(2):
        blk = iq[:, b * CFG.block_frames : (b + 1) * CFG.block_frames]
        audio, spectra = fe.process(blk)
        outs.append(np.asarray(audio))
        specs.append(np.asarray(spectra))
    got_audio = np.concatenate(outs, -1)
    got_spec = np.concatenate(specs, 1)

    np.testing.assert_allclose(ref_audio, got_audio, atol=3e-6)
    np.testing.assert_allclose(ref_spec, got_spec, atol=2e-3)
    # final carries agree (state for the next block)
    np.testing.assert_allclose(
        np.asarray(ref_state.rx.nco_phase), np.asarray(fe.state.rx.nco_phase)
    )
    np.testing.assert_allclose(
        np.asarray(ref_state.rx.chan_hist),
        np.asarray(fe.state.rx.chan_hist),
        atol=1e-6,
    )


@pytest.mark.parametrize("squelch_db", [-10, -3])
def test_sharded_squelch_whole_block_power(rng, squelch_db):
    """The gate must use WHOLE-block power: a burst confined to the first
    time shard must open (or mute) every shard exactly as the single-chip
    step does — per-shard local power would gate shards differently."""
    params = make_receiver_params(
        CFG, if_hz=[100_000, 0, -50_000, 25_000],
        if_bandwidth_hz=80_000, af_bandwidth_hz=8_000, mode="FM",
        squelch_db=squelch_db,
    )
    iq_np = make_iq(rng, CFG.block_frames, "fm", fs=CFG.sample_rate)
    iq = np.ascontiguousarray(iq_np.T).astype(np.float32)
    iq[:, CFG.block_frames // 4:] = 0.0  # burst lives only in shard 0 of 4
    iq = jnp.asarray(iq)

    _, ref_audio, _ = frontend_step(CFG, params, init_state(CFG), iq)

    fe = ShardedFrontEnd(CFG, params, make_mesh(4, 1))
    audio, _ = fe.process(iq)
    np.testing.assert_allclose(np.asarray(ref_audio), np.asarray(audio),
                               atol=3e-6)


def test_mesh_shape_heuristic():
    assert mesh_shape_for(8, 8, 102_400) == (1, 8)
    t, c = mesh_shape_for(8, 4, 102_400)
    assert t * c == 8 and c <= 4
    assert mesh_shape_for(4, 1, 102_400) == (4, 1)


class TestMultihost:
    """Degenerate single-process coverage of the multi-host helpers."""

    def test_init_noop_without_coordinator(self, monkeypatch):
        from webradio_tpu.parallel.multihost import init_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert init_distributed() is False

    def test_host_slice_and_global_block(self):
        import numpy as np
        from webradio_tpu.parallel import make_mesh
        from webradio_tpu.parallel.multihost import (
            host_time_slice, make_global_block,
        )

        mesh = make_mesh(4, 2)
        n = 4096
        lo, hi = host_time_slice(n, mesh)
        assert (lo, hi) == (0, n)  # single process owns every shard
        local = np.random.default_rng(0).standard_normal(
            (2, hi - lo)).astype(np.float32)
        g = make_global_block(local, n, mesh)
        assert g.shape == (2, n)
        np.testing.assert_array_equal(np.asarray(g), local)

    def test_sharded_step_consumes_global_block(self):
        import jax.numpy as jnp
        import numpy as np
        from webradio_tpu.parallel import make_mesh
        from webradio_tpu.parallel.multihost import make_global_block
        from webradio_tpu.parallel.sharded_channelized import (
            ShardedChannelizedFrontEnd,
        )
        from webradio_tpu.pipeline.channelized import (
            ChannelizedConfig, make_channelized_params,
        )

        cfg = ChannelizedConfig(
            sample_rate=1_024_000, channel_rate=128_000, audio_rate=32_000,
            block_frames=16_384, num_channels=4,
        )
        mesh = make_mesh(2, 4)
        params = make_channelized_params(cfg, [0, 10_000, -10_000, 128_000],
                                         80_000, 8_000, "FM")
        fe = ShardedChannelizedFrontEnd(cfg, params, mesh)
        local = np.random.default_rng(1).standard_normal(
            (2, cfg.block_frames)).astype(np.float32)
        g = make_global_block(local, cfg.block_frames, mesh)
        audio, spectra = fe.process(g)
        assert audio.shape == (4, cfg.audio_frames)


def test_tm_shard_body_matches_stage_body(rng, monkeypatch):
    """The time-major shard body (local-tail-recompute halos + fused tail)
    reproduces the stage-by-stage body on identical params/state across
    carried blocks."""
    from webradio_tpu.parallel import sharded_channelized as sc
    from webradio_tpu.pipeline.channelized import (
        ChannelizedConfig, make_channelized_params,
    )

    cfg = ChannelizedConfig(
        sample_rate=1_024_000, channel_rate=128_000, audio_rate=32_000,
        block_frames=16_384, num_channels=8,
    )
    params = make_channelized_params(
        cfg, [i * 11_000 - 40_000 for i in range(8)], 80_000, 8_000,
        ["FM", "AM", "USB", "LSB"] * 2,
        # gate states: disabled, wide open, muted, and near the noise floor
        squelch_db=[None, -200.0, 1000.0, -15.0] * 2,
    )
    assert sc._tm_body_eligible(cfg, 2, params)
    mesh = make_mesh(2, 4)
    blocks = [
        jnp.asarray(rng.standard_normal((2, cfg.block_frames))
                    .astype(np.float32))
        for _ in range(2)
    ]

    fe_tm = sc.ShardedChannelizedFrontEnd(cfg, params, mesh)
    outs_tm = [fe_tm.process(b) for b in blocks]

    monkeypatch.setattr(sc, "_tm_body_eligible", lambda *a: False)
    fe_st = sc.ShardedChannelizedFrontEnd(cfg, params, mesh)
    outs_st = [fe_st.process(b) for b in blocks]

    for (a_tm, s_tm), (a_st, s_st) in zip(outs_tm, outs_st):
        np.testing.assert_allclose(np.asarray(a_tm), np.asarray(a_st),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(s_tm), np.asarray(s_st),
                                   atol=1e-3)
    for f_tm, f_st in zip(fe_tm.state, fe_st.state):
        np.testing.assert_allclose(np.asarray(f_tm), np.asarray(f_st),
                                   atol=2e-4)
