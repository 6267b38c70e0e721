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


def test_mesh_shape_heuristic():
    assert mesh_shape_for(8, 8, 102_400) == (1, 8)
    t, c = mesh_shape_for(8, 4, 102_400)
    assert t * c == 8 and c <= 4
    assert mesh_shape_for(4, 1, 102_400) == (4, 1)
