"""Int8-MXU probe for the filterbank matmul (VERDICT r4 #8).

The u8exact law ships 2 effective bf16 passes. If the MXU runs int8 at
2x bf16 rate AND XLA lowers int8 dots to it, a 2-term int8 weight split
(exact u8-grid data x ~14-bit weights + per-column scale) would cost
~1 bf16-pass-equivalent. This measures the RAW dot cost of each
candidate at the filterbank's own shapes; adoption additionally needs
the accuracy ladder, but a speed refutation here refutes the law.

Usage: python tools/exp_int8.py [C]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

C = int(sys.argv[1]) if len(sys.argv) > 1 else 73_728
ND, K = 10_240, 384
STEPS = 20

rng = np.random.default_rng(0)
f = jnp.asarray(rng.standard_normal((ND, K)).astype(np.float32))
w = jnp.asarray(rng.standard_normal((K, 2 * C)).astype(np.float32))
f2 = jnp.concatenate([f, f], axis=1)           # doubled contraction
w2 = jnp.asarray(rng.standard_normal((2 * K, 2 * C)).astype(np.float32))
fi8 = jnp.asarray(rng.integers(-128, 128, (ND, K), dtype=np.int8))
wi8 = jnp.asarray(rng.integers(-128, 128, (K, 2 * C), dtype=np.int8))
jax.device_get(jnp.sum(f))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.device_get(jnp.ravel(out)[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        jax.device_get(jnp.ravel(out)[0])
        times.append((time.perf_counter() - t0) / STEPS)
    return name, round(sorted(times)[1] * 1e3, 3)


results = {}
cases = [
    ("bf16x1_default", jax.jit(lambda a, b: jnp.dot(
        a, b, precision=lax.Precision.DEFAULT)), f, w),
    ("u8exact_2pass_doubled", jax.jit(lambda a, b: jnp.dot(
        a, b, precision=lax.Precision.DEFAULT)), f2, w2),
    ("int8_int32_acc", jax.jit(lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.int32)), fi8, wi8),
    ("int8_2term_split", jax.jit(lambda a, b1, b2: (
        jnp.dot(a, b1, preferred_element_type=jnp.int32).astype(jnp.float32)
        + jnp.dot(a, b2, preferred_element_type=jnp.int32
                  ).astype(jnp.float32) * (1.0 / 128.0))), fi8, wi8, wi8),
]
for name, fn, *args in cases:
    try:
        n, ms = timeit(name, fn, *args)
        results[n] = ms
    except Exception as e:
        results[name + "_error"] = str(e)[:160]
print(json.dumps({"metric": "filterbank_dot_candidates_ms",
                  "c": C, "nd": ND, "k": K, **results}))
