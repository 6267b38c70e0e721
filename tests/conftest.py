"""Test configuration: force CPU with 8 virtual devices.

Sharding tests use JAX's standard multi-device simulation
(``--xla_force_host_platform_device_count``, SURVEY §4) so the multi-chip
paths run anywhere; the real-TPU path is exercised by ``bench.py``.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# Unconditional: the driver environment pre-sets JAX_PLATFORMS to the TPU
# tunnel; unit tests must run on the virtual-device CPU backend regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A pytest plugin may have imported jax before this conftest ran, in which
# case the env var was already snapshotted — override via the config API
# (safe as long as no backend has been initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)


def make_iq(rng, n, kind="noise", fs=2_400_000.0):
    """Synthesized IQ test signals: noise, or an FM/AM-style tone."""
    t = np.arange(n, dtype=np.float64) / fs
    if kind == "noise":
        z = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        return z
    if kind == "tone":
        # complex tone at 37 kHz with 30% amplitude noise floor
        z = np.exp(2j * np.pi * 37_000.0 * t)
        z += 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        return np.stack([z.real, z.imag], axis=-1).astype(np.float32)
    if kind == "fm":
        # NBFM: 1 kHz audio, 5 kHz deviation, carrier at +100 kHz IF
        msg = np.sin(2 * np.pi * 1_000.0 * t)
        phase = 2 * np.pi * np.cumsum(5_000.0 * msg) / fs
        z = np.exp(1j * (2 * np.pi * 100_000.0 * t + phase))
        return np.stack([z.real, z.imag], axis=-1).astype(np.float32)
    raise ValueError(kind)


def snr_db(ref, test):
    """SNR of `test` against `ref` in dB (both float arrays)."""
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    p_sig = np.mean(ref**2)
    p_err = np.mean(err**2)
    if p_err == 0:
        return np.inf
    return 10 * np.log10(p_sig / p_err)
