"""On-device accuracy of split-weight FIR tiers vs the HIGHEST chain.

Interpret mode can't measure this (XLA elides in-jit bf16 splits); the
Mosaic-compiled kernel computes them literally. C=128, stock rates, one
block; the linear (USB) law isolates FIR arithmetic from atan2 wraps, FM
is reported alongside. This is the measurement recipe behind the hx5/hx4
rows of BASELINE.md r4 — the default ``python bench.py`` run now repeats
a gated version of it every round (bench.py parity_check).

Usage: python tools/exp_acc.py [tier ...]   (default: hx5 hx4 high)
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from webradio_tpu.pipeline.channelized import (
    ChannelizedConfig,
    channelized_step,
    init_channelized_state,
    make_channelized_params,
    mode_set_of,
)

tiers = sys.argv[1:] or ["hx5", "hx4", "high"]
c = 128
ifs = [int((i - c // 2) * 2_000) + 777 for i in range(c)]
rng = np.random.default_rng(7)
x = jnp.asarray(rng.standard_normal((2, 102_400)).astype(np.float32))
jax.device_get(jnp.sum(x))

out = {"metric": "hx_tier_audio_error_vs_highest", "channels": c,
       "backend": jax.default_backend()}
for mode in ("USB", "FM"):
    base = None
    for tier in ["highest"] + tiers:
        cfg = ChannelizedConfig(num_channels=c, fir_precision=tier,
                                tail_kernel="pallas")
        params = make_channelized_params(cfg, ifs, 80_000, 8_000, mode)
        _, audio, _ = channelized_step(cfg, params,
                                       init_channelized_state(cfg), x,
                                       mode_set=mode_set_of(params.mode))
        audio = np.asarray(jax.device_get(audio), np.float64)
        if tier == "highest":
            base = audio
            out[f"{mode}_rms"] = round(float(np.sqrt(np.mean(base**2))), 4)
            continue
        err = audio - base
        out[f"{mode}_{tier}_max_abs"] = float(np.max(np.abs(err)))
        out[f"{mode}_{tier}_snr_db"] = round(10 * np.log10(
            np.mean(base**2) / max(np.mean(err**2), 1e-300)), 1)
print(json.dumps(out))
