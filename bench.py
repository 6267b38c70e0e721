"""Headline benchmark: concurrent real-time NBFM channels per chip.

Runs the channelized front-end step (spectrum FFT + shared polyphase
filterbank + per-channel residual mix, shaping FIR, demod, audio FIR) at
the reference's stock rates (2.4 Msps wideband, 42.7 ms blocks —
src/main.cxx:74-75) with large channel batches on one device and reports
how many receiver channels the chip sustains in real time. The per-channel
direct path (NCO + full-rate FIR per receiver, the reference topology) is
measured alongside for comparison.

Execution is forced by fetching a scalar checksum through the device->host
path inside the timed region — on tunneled backends ``block_until_ready``
acks before remote execution completes, so dispatch-only timing lies.

Baseline: the reference demonstrates exactly 1 real-time receiver on its
target CPU (SURVEY §6, BASELINE.md) — ``vs_baseline`` is the channel ratio.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

STEPS = 20


def _measure(step, params, state, iq, checksum):
    """Median-of-3 of (STEPS steps + forcing fetch), seconds per step."""
    import jax

    # warmup / compile / first-transfer
    s = state
    s, audio, spectra = step(params, s, iq)
    jax.device_get(checksum(audio, spectra))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, audio, spectra = step(params, s, iq)
        jax.device_get(checksum(audio, spectra))  # forces the whole chain
        times.append((time.perf_counter() - t0) / STEPS)
    return sorted(times)[1]


def main():
    import jax
    import jax.numpy as jnp

    from webradio_tpu.pipeline import (
        ChainConfig,
        init_state,
        make_receiver_params,
    )
    from webradio_tpu.pipeline.frontend import frontend_step
    from webradio_tpu.pipeline.channelized import (
        ChannelizedConfig,
        channelized_step,
        init_channelized_state,
        make_channelized_params,
    )

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    iq_np = rng.standard_normal((2, 102_400)).astype(np.float32)
    iq = jax.device_put(jnp.asarray(iq_np), dev)

    def checksum(audio, spectra):
        return jnp.sum(audio[:, 0]) + jnp.sum(spectra[0, 0, 0])

    def ifs(c):
        return [int((i - c // 2) * 2_000) for i in range(c)]

    report = {}

    # ---- channelized path (the scalable one) ----
    best_rt, best_c = 0.0, 0
    for c in (1024, 4096, 16384):
        cfg = ChannelizedConfig(num_channels=c)
        try:
            params = make_channelized_params(cfg, ifs(c), 80_000, 8_000, "FM")
            state = init_channelized_state(cfg)
            dt = _measure(
                lambda p, s, x: channelized_step(cfg, p, s, x),
                params, state, iq, checksum,
            )
        except Exception as e:  # OOM etc. — keep the best so far
            report[f"pfb_c{c}_error"] = str(e)[:120]
            break
        rt = c * cfg.block_seconds / dt
        report[f"pfb_c{c}_step_ms"] = round(dt * 1e3, 2)
        report[f"pfb_c{c}_rt_channels"] = round(rt, 1)
        if rt > best_rt:
            best_rt, best_c = rt, c
        if dt > 4 * cfg.block_seconds:
            break

    # ---- direct per-channel path (reference topology) ----
    for c in (256, 1024):
        cfg = ChainConfig(num_channels=c)
        try:
            params = make_receiver_params(cfg, ifs(c), 80_000, 8_000, "FM")
            state = init_state(cfg)
            dt = _measure(
                lambda p, s, x: frontend_step(cfg, p, s, x),
                params, state, iq, checksum,
            )
        except Exception as e:
            report[f"direct_c{c}_error"] = str(e)[:120]
            break
        rt = c * cfg.block_seconds / dt
        report[f"direct_c{c}_step_ms"] = round(dt * 1e3, 2)
        report[f"direct_c{c}_rt_channels"] = round(rt, 1)
        if dt > 4 * cfg.block_seconds:
            break

    value = round(best_rt, 1)
    print(
        json.dumps(
            {
                "metric": "realtime_nbfm_channels_per_chip",
                "value": value,
                "unit": "channels @ 2.4Msps full chain",
                "vs_baseline": value,  # reference sustains 1 channel (SURVEY §6)
                "detail": report,
                "best_batch": best_c,
            }
        )
    )


if __name__ == "__main__":
    main()
