"""Headline benchmark: concurrent real-time NBFM channels per chip.

Runs the fused front-end step (spectrum FFT + per-channel NCO mix, channel
FIR decimate, demod, audio FIR decimate) at the reference's stock rates
(2.4 Msps wideband, 42.7 ms blocks — src/main.cxx:74-75) with a large channel
batch on one device, and reports how many receiver channels the chip sustains
in real time.

Baseline: the reference demonstrates exactly 1 real-time receiver on its
target CPU (SURVEY §6, BASELINE.md) — ``vs_baseline`` is the channel ratio.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from webradio_tpu.pipeline import (
        ChainConfig,
        init_state,
        make_receiver_params,
    )
    from webradio_tpu.pipeline.frontend import frontend_step

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    def measure(num_channels: int, steps: int = 10) -> float:
        cfg = ChainConfig(num_channels=num_channels)
        params = make_receiver_params(
            cfg,
            if_hz=[int((i - num_channels // 2) * 2_000) for i in range(num_channels)],
            if_bandwidth_hz=80_000,
            af_bandwidth_hz=8_000,
            mode="FM",
        )
        state = init_state(cfg)
        iq_np = rng.standard_normal((2, cfg.block_frames)).astype(np.float32)
        iq = jax.device_put(jnp.asarray(iq_np), dev)

        # warmup / compile
        state, audio, spectra = frontend_step(cfg, params, state, iq)
        jax.block_until_ready((audio, spectra))
        state, audio, spectra = frontend_step(cfg, params, state, iq)
        jax.block_until_ready((audio, spectra))

        t0 = time.perf_counter()
        for _ in range(steps):
            state, audio, spectra = frontend_step(cfg, params, state, iq)
        jax.block_until_ready((audio, spectra))
        dt = (time.perf_counter() - t0) / steps
        return dt, cfg.block_seconds

    # find the largest channel count that stays real-time
    best_rt = 0.0
    best_c = 0
    report = {}
    for c in (64, 256, 512, 1024, 2048):
        try:
            dt, block_s = measure(c)
        except Exception as e:  # OOM etc. — keep the best so far
            report[f"c{c}_error"] = str(e)[:120]
            break
        rt_channels = c * block_s / dt
        report[f"c{c}_step_ms"] = round(dt * 1e3, 3)
        report[f"c{c}_rt_channels"] = round(rt_channels, 1)
        if rt_channels > best_rt:
            best_rt, best_c = rt_channels, c
        # stop scaling once step time exceeds real time by 4x
        if dt > 4 * block_s:
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
