import time, sys
import numpy as np
import jax, jax.numpy as jnp
from webradio_tpu.pipeline.channelized import (
    ChannelizedConfig, make_channelized_params, init_channelized_state,
    channelized_step)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
cfg = ChannelizedConfig(num_channels=C)
rng = np.random.default_rng(0)
params = make_channelized_params(
    cfg, [(i % 20 - 10) * 10_000 for i in range(C)], 80_000, 8_000,
    ["FM"] * C)
state = init_channelized_state(cfg)
iq = jnp.asarray(rng.standard_normal((2, cfg.block_frames)).astype(np.float32))
print("inputs on device", flush=True)

def checksum(a, s):
    return jnp.sum(a) + jnp.sum(s)

t0 = time.perf_counter()
state, audio, spectra = channelized_step(cfg, params, state, iq)
print(f"dispatched ({time.perf_counter()-t0:.1f}s)", flush=True)
jax.device_get(checksum(audio, spectra))
print(f"compiled+ran ({time.perf_counter()-t0:.1f}s)", flush=True)
STEPS = 10
times = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, audio, spectra = channelized_step(cfg, params, state, iq)
    jax.device_get(checksum(audio, spectra))
    times.append((time.perf_counter() - t0) / STEPS)
ms = sorted(times)[1] * 1e3
rt = C * cfg.block_seconds / (sorted(times)[1])
print(f"C={C}: {ms:.2f} ms/block, rt_channels={rt:.0f}", flush=True)
