"""shard_map'd channelized front-end: filterbank + channels over a mesh.

Combines the scalable compute shape (polyphase filterbank,
webradio_tpu/ops/channelizer.py) with the mesh layout of
:mod:`webradio_tpu.parallel.sharded`:

* ``chan`` axis — receivers are pure data-parallel: selector rows, residual
  steps, FIR banks, demod state all shard; no collectives. Every chan shard
  evaluates the (cheap, shared) filterbank on its local time slice rather
  than broadcasting bins — the PFB is O(K_p / D + D) MACs per input sample,
  so recomputation costs less than the all-gather it would replace.
* ``time`` axis — the wideband block shards in time; left-neighbor halos
  move by one ``lax.ppermute`` each, exactly the carries the single-chip
  step keeps between blocks (SURVEY §5):

  - ``K_p - 1`` raw input samples (filterbank history),
  - ``K - 1`` selected+mixed channel-rate samples (shaping-FIR history),
  - one channel-rate sample (FM discriminator),
  - ``K - 1`` demodulated samples (audio-FIR history).

  The residual NCO needs no communication: its phase at a shard boundary
  is closed-form ``(phase0 + shard_start * step) mod 2^31``.

Block-level carries for the next block are taken from the last time shard
with a masked ``psum`` (replicated), mirroring ``sharded.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .. import ops
from ..ops.channelizer import pfb_channelize_direct, pfb_channelize_direct_tm
from ..pipeline.channelized import (
    ChannelizedConfig,
    ChannelizedParams,
    ChannelizedState,
)
from .sharded import _from_last, _right_perm


def _shard_body(cfg: ChannelizedConfig, t_shards: int, params, state, iq_local):
    tidx = lax.axis_index("time")
    n_local = cfg.block_frames // t_shards
    nd_local = n_local // cfg.num_bins
    k = cfg.fir_length
    kp = cfg.proto_taps
    perm = _right_perm(t_shards)

    spectra = ops.spectrum_accumulate(iq_local, cfg.fft_size)

    # ---- filterbank: raw-input history halo; each chan shard's matmul
    # computes only its own channels (weights sharded on the channel axis)
    iq_halo = lax.ppermute(iq_local[:, iq_local.shape[-1] - (kp - 1):],
                           "time", perm)
    pfb_hist = jnp.where(tidx == 0, state.pfb_hist, iq_halo)
    from ..pipeline.channelized import _channelize_tm, _pfb_prec

    if params.pfb_weights_split is not None:
        y2, _, pfb_hist_local = _channelize_tm(cfg, params, pfb_hist,
                                               iq_local, split=False)
        cl = params.pfb_weights_split.shape[3]
        y2 = y2.astype(jnp.float32)
        chan_in = jnp.stack([y2[:, :cl].T, y2[:, cl:].T])
    else:
        chan_in, pfb_hist_local = pfb_channelize_direct(
            iq_local, params.pfb_weights, cfg.num_bins, pfb_hist,
            precision=_pfb_prec(cfg),
        )  # [2, C_local, nd_local]
    new_pfb_hist = _from_last(pfb_hist_local, tidx, t_shards)

    # ---- residual NCO: closed-form start phase per shard
    shard_start = (tidx * nd_local).astype(jnp.uint32)
    phase_here = (
        state.nco_phase + shard_start * params.residual_step
    ) & jnp.uint32(ops.nco.PHASE_MASK)
    mixed = ops.nco_mix(chan_in, phase_here, params.residual_step)
    new_phase = ops.nco_advance(
        state.nco_phase, params.residual_step, cfg.chan_frames
    )

    # ---- shaping FIR (decim 1): channel-rate history halo
    chan_halo = lax.ppermute(mixed[:, :, mixed.shape[-1] - (k - 1):],
                             "time", perm)
    chan_hist = jnp.where(tidx == 0, state.chan_hist, chan_halo)

    shaped, chan_hist_local = ops.fir_dispatch(
        mixed, params.chan_coeff, params.chan_toep, 1, chan_hist
    )
    new_chan_hist = _from_last(chan_hist_local, tidx, t_shards)

    # ---- demod: previous-sample halo
    prev_halo = lax.ppermute(shaped[:, :, shaped.shape[-1] - 1], "time", perm)
    prev = jnp.where(tidx == 0, state.demod_prev, prev_halo)
    audio_if, demod_prev_local = ops.demodulate(shaped, params.mode, prev)
    new_demod_prev = _from_last(demod_prev_local, tidx, t_shards)

    # ---- audio FIR: history halo
    audio_halo = lax.ppermute(
        audio_if[:, audio_if.shape[-1] - (k - 1):], "time", perm
    )
    audio_hist = jnp.where(tidx == 0, state.audio_hist, audio_halo)
    audio, audio_hist_local = ops.fir_dispatch(
        audio_if, params.audio_coeff, params.audio_toep, cfg.audio_decim,
        audio_hist,
    )
    new_audio_hist = _from_last(audio_hist_local, tidx, t_shards)
    from ..pipeline.frontend import _apply_gain_squelch

    # whole-block gate power (pmean over the time axis) on the unified
    # POST-shaping-FIR basis: all shards of a channel gate identically,
    # matching the single-chip step exactly
    audio = _apply_gain_squelch(audio, shaped, params.af_gain,
                                params.squelch, axis_name="time")

    new_state = ChannelizedState(
        pfb_hist=new_pfb_hist,
        nco_phase=new_phase,
        chan_hist=new_chan_hist,
        demod_prev=new_demod_prev,
        audio_hist=new_audio_hist,
    )
    return new_state, audio, spectra


def _shard_body_tm(cfg: ChannelizedConfig, t_shards: int, c_shards: int,
                   mode_set, params, state, iq_local):
    """Time-major shard body: the fast single-chip tail per shard.

    The stage-by-stage body (:func:`_shard_body`) extracts each halo from
    a materialized stage output, forcing every stage to finish before its
    ppermute. Here the three tail halos (mixed FIR history, demod prev
    sample, audio FIR history) are instead *recomputed locally* from the
    shard's last ``2K-1`` selected-bin rows — an elementwise mix, one tiny
    ``[K, 2K-1] @ [2K-1, C]`` matmul, and a ``K-1``-row demod — then moved
    with one ppermute each. The main tail then runs as the single-chip
    time-major path (pipeline/channelized.py), including the fused Pallas
    kernel when the local tile constraints hold, with no mid-stage
    synchronization points.
    """
    tidx = lax.axis_index("time")
    n_local = cfg.block_frames // t_shards
    nd_local = n_local // cfg.num_bins
    c_local = cfg.num_channels // c_shards
    k = cfg.fir_length
    kp = cfg.proto_taps
    perm = _right_perm(t_shards)
    pmask = jnp.uint32(ops.nco.PHASE_MASK)

    spectra = ops.spectrum_accumulate(iq_local, cfg.fft_size)

    # ---- filterbank: raw-input history halo (same as the stage body)
    iq_halo = lax.ppermute(iq_local[:, iq_local.shape[-1] - (kp - 1):],
                           "time", perm)
    pfb_hist = jnp.where(tidx == 0, state.pfb_hist, iq_halo)
    from ..pipeline.channelized import _channelize_tm

    ci, cq, pfb_hist_local = _channelize_tm(cfg, params, pfb_hist,
                                            iq_local, split=True)
    # [nd_local, C_local]; bf16-stored product upcasts here (the local
    # tail mixes halo rows in f32 before the kernels see them)
    ci = ci.astype(jnp.float32)
    cq = cq.astype(jnp.float32)
    new_pfb_hist = _from_last(pfb_hist_local, tidx, t_shards)

    # ---- residual NCO start phase per shard (closed form, no comms)
    shard_start = (tidx * nd_local).astype(jnp.uint32)
    phase_here = (
        state.nco_phase + shard_start * params.residual_step
    ) & pmask
    new_phase = ops.nco_advance(
        state.nco_phase, params.residual_step, cfg.chan_frames
    )

    use_pallas = _tm_uses_pallas(cfg, nd_local, c_local, params)
    # the halo recompute must mix with the same law as the main tail so
    # the injected histories stay consistent with what the neighbor's
    # tail actually computed — the fused kernels now implement BOTH laws
    # (fast=cfg.fast_nco), so the selection is law-for-law
    mix_tm = ops.nco_mix_tm_fast if cfg.fast_nco else ops.nco_mix_tm

    # ---- local tail recompute: last 2K-1 mixed rows give every halo
    t_rows = 2 * k - 1
    row0 = jnp.uint32(nd_local - t_rows)
    phase_t = (phase_here + row0 * params.residual_step) & pmask
    mt_i, mt_q = mix_tm(ci[nd_local - t_rows:], cq[nd_local - t_rows:],
                        phase_t, params.residual_step)
    # shaped[-K:] via one small banded matmul: W_tail [2K-1, K] from the
    # shared kernel (chan_toep column 0 holds the reversed coefficients)
    rev = params.chan_toep[:k, 0]
    w_tail = jnp.stack(
        [jnp.pad(rev, (m, k - 1 - m)) for m in range(k)], axis=1
    )  # [2K-1, K]
    st_i = jax.lax.dot_general(
        w_tail, mt_i, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [K, C_local] = shaped rows nd-K .. nd-1
    st_q = jax.lax.dot_general(
        w_tail, mt_q, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    audio_tail, _ = ops.demodulate_tm(
        st_i[1:], st_q[1:], params.mode,
        jnp.stack([st_i[0], st_q[0]]),
    )  # [K-1, C_local] = audio_if rows nd-(K-1) .. nd-1

    # ---- one ppermute per halo; shard 0 takes the block-level carry
    mixed_halo_i = lax.ppermute(mt_i[t_rows - (k - 1):], "time", perm)
    mixed_halo_q = lax.ppermute(mt_q[t_rows - (k - 1):], "time", perm)
    hist_i = jnp.where(tidx == 0, state.chan_hist[0].T, mixed_halo_i)
    hist_q = jnp.where(tidx == 0, state.chan_hist[1].T, mixed_halo_q)
    prev_halo = lax.ppermute(jnp.stack([st_i[-1], st_q[-1]]), "time", perm)
    prev = jnp.where(tidx == 0, state.demod_prev, prev_halo)
    audio_halo = lax.ppermute(audio_tail, "time", perm)
    audio_hist = jnp.where(tidx == 0, state.audio_hist.T, audio_halo)

    # ---- main tail: identical to the single-chip time-major path
    from ..pipeline.channelized import _fir_prec, _xla_prec

    prec = _fir_prec(cfg)
    audio = None
    if use_pallas:
        from ..ops.pallas_tail_tm import (
            _audio_time_tile,
            fused_tail_audio_tm,
            fused_tail_tm,
        )

        fir_tile = params.chan_toep.shape[1]
        if _audio_time_tile(nd_local, cfg.audio_decim, fir_tile):
            audio, _, _, _, _, power = fused_tail_audio_tm(
                ci, cq, phase_here, params.residual_step,
                params.chan_toep, params.audio_toep, cfg.audio_decim,
                params.mode, hist_i, hist_q, prev, audio_hist,
                precision=prec, fast=cfg.fast_nco, mode_set=mode_set,
            )
        else:
            audio_tm, _, _, _, power = fused_tail_tm(
                ci, cq, phase_here, params.residual_step,
                params.chan_toep, params.mode, hist_i, hist_q, prev,
                precision=prec, fast=cfg.fast_nco, mode_set=mode_set,
            )
    else:
        mi, mq = mix_tm(ci, cq, phase_here, params.residual_step)
        x2 = jnp.concatenate([mi, mq], axis=1)
        y2, _ = ops.fir_decimate_toeplitz_tm(
            x2, params.chan_toep, 1,
            jnp.concatenate([hist_i, hist_q], axis=1),
            precision=_xla_prec(prec),
        )
        audio_tm, _ = ops.demodulate_tm(
            y2[:, :c_local], y2[:, c_local:], params.mode, prev
        )
        pm = jnp.mean(y2 * y2, axis=0)
        power = pm[:c_local] + pm[c_local:]
    if audio is None:
        audio, _ = ops.fir_decimate_toeplitz_tm(
            audio_tm, params.audio_toep, cfg.audio_decim, audio_hist,
            precision=_xla_prec(prec),
        )
    audio = audio.T  # [C_local, audio_frames_local]

    # squelch gate from the WHOLE block's POST-shaping-FIR power (the
    # unified cross-engine basis): a pmean over equal time shards is the
    # block mean, so shards can never disagree and the gate decision
    # matches the single-chip step
    from ..pipeline.frontend import squelch_scale

    power = lax.pmean(power, "time")
    audio = audio * squelch_scale(power, params.af_gain,
                                  params.squelch)[:, None]

    # ---- next-block carries: the last shard's local tails
    new_chan_hist = _from_last(
        jnp.stack([mt_i[t_rows - (k - 1):].T, mt_q[t_rows - (k - 1):].T]),
        tidx, t_shards,
    )
    new_demod_prev = _from_last(jnp.stack([st_i[-1], st_q[-1]]), tidx,
                                t_shards)
    new_audio_hist = _from_last(audio_tail.T, tidx, t_shards)

    new_state = ChannelizedState(
        pfb_hist=new_pfb_hist,
        nco_phase=new_phase,
        chan_hist=new_chan_hist,
        demod_prev=new_demod_prev,
        audio_hist=new_audio_hist,
    )
    return new_state, audio, spectra


def _tm_uses_pallas(cfg: ChannelizedConfig, nd_local: int, c_local: int,
                    params) -> bool:
    """Per-shard twin of pipeline.channelized._use_pallas_tm."""
    from ..pipeline.channelized import PALLAS_TM_AUTO_THRESHOLD

    if cfg.tail_kernel == "xla":
        return False
    if cfg.tail_kernel == "auto" and c_local < PALLAS_TM_AUTO_THRESHOLD:
        return False
    from ..ops.pallas_tail_tm import CHAN_TILE, TIME_TILE

    return (
        params.chan_toep is not None
        and nd_local % TIME_TILE == 0
        and c_local % CHAN_TILE == 0
        and TIME_TILE % params.chan_toep.shape[1] == 0
    )


def _tm_body_eligible(cfg: ChannelizedConfig, t_shards: int,
                      params: ChannelizedParams) -> bool:
    """Static check: can the time-major shard body run these shapes?"""
    if params.chan_toep is None or params.audio_toep is None:
        return False
    nd_local = cfg.block_frames // t_shards // cfg.num_bins
    if nd_local < 2 * cfg.fir_length - 1:
        return False
    return (
        nd_local % params.chan_toep.shape[1] == 0
        and (nd_local // cfg.audio_decim) % params.audio_toep.shape[1] == 0
    )


def _sharded_smapped(cfg: ChannelizedConfig, mesh: Mesh,
                     mode_set: tuple | None = None):
    """The shard_map'd step body (un-jitted) — shared by the live step
    and the offline capture scan."""
    t_shards = mesh.shape["time"]
    c_shards = mesh.shape["chan"]
    if cfg.block_frames % (t_shards * cfg.fft_size):
        raise ValueError("time shards must hold whole FFT groups")
    n_local = cfg.block_frames // t_shards
    if n_local % (cfg.num_bins * cfg.audio_decim):
        raise ValueError("time shards must hold whole decimation groups")
    if n_local < cfg.proto_taps:
        raise ValueError("time shards shorter than the filterbank halo")
    if cfg.num_channels % c_shards:
        raise ValueError("num_channels must divide over chan shards")

    params_spec = ChannelizedParams(
        pfb_weights=P(None, None, "chan"),
        residual_step=P("chan"),
        chan_coeff=P("chan", None),
        audio_coeff=P("chan", None),
        mode=P("chan"),
        af_gain=P("chan"),
        squelch=P("chan"),
        chan_toep=P(None, None),  # tiny shared band matrix, replicated
        audio_toep=P(None, None),
        # present iff pfb_precision == "u8exact" (host-split bf16 pair,
        # [2, 2K_p, 2, C] — channel axis LAST and separate, so this spec
        # slices real channels; a packed [.., 2C] layout would give
        # shards all-I / all-Q column blocks)
        pfb_weights_split=(P(None, None, None, "chan")
                           if cfg.pfb_precision == "u8exact" else None),
    )
    state_spec = ChannelizedState(
        pfb_hist=P(None, None),  # tiny, replicated
        nco_phase=P("chan"),
        chan_hist=P(None, "chan", None),
        demod_prev=P(None, "chan"),
        audio_hist=P("chan", None),
    )

    def body(params, state, iq_local):
        # trace-time dispatch: chan_toep presence is pytree structure, so
        # the right body is picked per compilation without retracing churn
        if _tm_body_eligible(cfg, t_shards, params):
            return _shard_body_tm(cfg, t_shards, c_shards, mode_set,
                                  params, state, iq_local)
        return _shard_body(cfg, t_shards, params, state, iq_local)
    smapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(params_spec, state_spec, P(None, "time")),
        out_specs=(state_spec, P("chan", "time"), P(None, "time", None)),
        check_vma=False,
    )
    return smapped


def sharded_channelized_step(cfg: ChannelizedConfig, mesh: Mesh,
                             mode_set: tuple | None = None):
    """Build the jitted sharded channelized step for a mesh.

    ``step(params, state, iq) -> (state, audio, spectra)`` with ``iq``
    ``[2, block_frames]`` sharded over ``time``, audio ``[C, audio_frames]``
    sharded ``(chan, time)``. ``mode_set`` statically specializes the
    fused kernels' demod section (pipeline.channelized.mode_set_of).
    """
    return jax.jit(_sharded_smapped(cfg, mesh, mode_set),
                   donate_argnums=(1,))


@functools.lru_cache(maxsize=8)
def _capture_scan_fn(cfg: ChannelizedConfig, mesh: Mesh):
    smapped = _sharded_smapped(cfg, mesh)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def scan_fn(params, state, blocks):
        def body(carry, iq):
            s, audio, spectra = smapped(params, carry, iq)
            return s, (audio, spectra[:, spectra.shape[1] - 1, :])

        final, (audio, latest) = lax.scan(body, state, blocks)
        return final, audio, latest

    return scan_fn


def run_capture_sharded(
    cfg: ChannelizedConfig,
    params: ChannelizedParams,
    mesh: Mesh,
    iq: jax.Array,
    state: ChannelizedState | None = None,
):
    """Demodulate a whole recorded capture on a device mesh.

    The mesh counterpart of ``pipeline.stream.run_capture_channelized``:
    one compiled ``lax.scan`` whose body is the shard_map'd step, so the
    per-block host dispatch disappears AND every block runs sharded
    (time halos ride ppermute between scan iterations exactly as they do
    between live blocks). Same contract: ``iq [2, total]`` in,
    ``(final_state, audio [C, total_audio], latest [n, 2, fft])`` out.
    """
    from ..pipeline.channelized import init_channelized_state

    n_blocks = iq.shape[-1] // cfg.block_frames
    if n_blocks == 0:
        raise ValueError("capture shorter than one block")
    blocks = jnp.moveaxis(
        iq[:, : n_blocks * cfg.block_frames].reshape(
            2, n_blocks, cfg.block_frames
        ),
        1,
        0,
    )
    if state is None:
        state = init_channelized_state(cfg)
    final, audio, latest = _capture_scan_fn(cfg, mesh)(params, state, blocks)
    audio = jnp.moveaxis(audio, 0, 1).reshape(cfg.num_channels, -1)
    return final, audio, latest


class ShardedChannelizedFrontEnd:
    """Mesh-aware counterpart of the channelized pipeline."""

    def __init__(self, cfg: ChannelizedConfig, params: ChannelizedParams,
                 mesh: Mesh):
        from ..pipeline.channelized import (
            init_channelized_state,
            mode_set_of,
        )

        self.cfg = cfg
        self.mesh = mesh
        self.params = params
        self.state = init_channelized_state(cfg)
        self._mode_set = mode_set_of(params.mode)
        self._step = sharded_channelized_step(cfg, mesh, self._mode_set)

    def update_params(self, params: ChannelizedParams) -> None:
        from ..pipeline.channelized import mode_set_of

        self.params = params
        ms = mode_set_of(params.mode)
        if ms != self._mode_set:
            # a new demod law appeared: rebuild the step (one retrace,
            # the same accepted trade as param-structure changes)
            self._mode_set = ms
            self._step = sharded_channelized_step(self.cfg, self.mesh, ms)

    def process(self, iq: jax.Array):
        self.state, audio, spectra = self._step(self.params, self.state, iq)
        return audio, spectra

    # ---- live-server interface (same contract as FrontEndPipeline) ----
    _pending = None

    def process_host(self, iq_planes):
        import numpy as np

        from .. import ops

        if isinstance(iq_planes, jax.Array):
            # multihost serving hands in the already-assembled global
            # block (multihost.make_global_block) — converting through
            # numpy would both gather it and strip the sharding
            iq = iq_planes
        else:
            iq = jnp.asarray(np.ascontiguousarray(iq_planes, np.float32))
        self.state, audio, spectra = self._step(self.params, self.state, iq)
        latest_db = ops.spectrum_db(spectra[:, spectra.shape[1] - 1, :])
        result = None
        if self._pending is not None:
            # on-device handoff; the web layer fetches spectrum/audio on
            # demand (see FrontEndPipeline.process_host)
            result = self._pending
        self._pending = (audio, latest_db)
        return result


    def flush(self):
        result = None
        if self._pending is not None:
            result = self._pending
            self._pending = None
        return result

    def process_host_sync(self, iq_planes):
        out = self.process_host(iq_planes)
        tail = self.flush()
        return tail if out is None else out

    def reset(self) -> None:
        from ..pipeline.channelized import init_channelized_state

        self.state = init_channelized_state(self.cfg)
        self._pending = None
