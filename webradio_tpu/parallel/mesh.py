"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(
    n_devices: int, num_channels: int, block_frames: int, fft_size: int = 512
) -> tuple[int, int]:
    """Pick a ``(time, chan)`` factorization of ``n_devices``.

    Prefers channel sharding (no collectives) as long as each shard keeps at
    least one channel; remaining factors go to the time axis, constrained so
    each time shard holds a whole number of FFT groups.
    """
    chan = 1
    time = 1
    rem = n_devices
    # greedily assign powers of two to chan while channels divide evenly
    while rem % 2 == 0 and num_channels % (chan * 2) == 0:
        chan *= 2
        rem //= 2
    while rem > 1:
        nt = time * 2 if rem % 2 == 0 else time * rem
        step = nt // time
        if block_frames % (nt * fft_size) == 0:
            time = nt
            rem //= step
        else:
            break
    if time * chan != n_devices:
        # fall back: put everything on chan if divisible, else time
        if num_channels % n_devices == 0:
            return 1, n_devices
        if block_frames % (n_devices * fft_size) == 0:
            return n_devices, 1
        raise ValueError(
            f"cannot factor {n_devices} devices over C={num_channels}, "
            f"N={block_frames}"
        )
    return time, chan


def make_mesh(time: int, chan: int, devices=None) -> Mesh:
    """Build a ``('time', 'chan')`` mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < time * chan:
        raise ValueError(f"need {time * chan} devices, have {len(devices)}")
    arr = np.array(devices[: time * chan]).reshape(time, chan)
    return Mesh(arr, ("time", "chan"))
