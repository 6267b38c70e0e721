"""Headline benchmark: concurrent real-time NBFM channels per chip.

Runs the channelized front-end step (spectrum FFT + shared polyphase
filterbank + per-channel residual mix, shaping FIR, demod, audio FIR) at
the reference's stock rates (2.4 Msps wideband, 42.7 ms blocks —
src/main.cxx:74-75) with large channel batches on one device and reports
how many receiver channels the chip sustains in real time. The per-channel
direct path (NCO + full-rate FIR per receiver, the reference topology) is
measured alongside for comparison.

Robustness: measurements run in a child process streaming results to a
file; the parent enforces a wall-clock deadline and prints the best
result seen even if the device tunnel wedges mid-run (its first
device->host transfer is known to hang for minutes on some sessions).
Execution is forced by fetching a scalar checksum through the
device->host path inside the timed region — ``block_until_ready`` acks
before remote execution completes on tunneled backends, so dispatch-only
timing lies.

Baseline: the reference demonstrates exactly 1 real-time receiver on its
target CPU (SURVEY §6, BASELINE.md) — ``vs_baseline`` is the channel ratio.
The headline value is the largest channel batch whose measured step fits
the 42.7 ms block budget (fully real-time, never throughput-normalized).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

STEPS = 20
#: absolute wall-clock cap; progress (new results, or the worker reporting
#: the transfer warm-up finished) extends the soft deadline up to this
DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", "900"))
PROGRESS_GRACE_S = 240


# ---------------------------------------------------------------------------
# worker: actual measurements, one JSON line per result to the given file
# ---------------------------------------------------------------------------

def _measure(step, params, state, iq, checksum):
    """Median-of-3 of (STEPS steps + forcing fetch), seconds per step."""
    import jax

    s = state
    s, audio, spectra = step(params, s, iq)
    jax.device_get(checksum(audio, spectra))  # compile + transfer warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, audio, spectra = step(params, s, iq)
        jax.device_get(checksum(audio, spectra))  # forces the whole chain
        times.append((time.perf_counter() - t0) / STEPS)
    return sorted(times)[1]


def worker(out_path: str) -> None:
    import numpy as np
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

    out = open(out_path, "a", buffering=1)

    def emit(**kv):
        out.write(json.dumps(kv) + "\n")

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    iq = jax.device_put(
        jnp.asarray(rng.standard_normal((2, 102_400)).astype(np.float32)), dev
    )
    # absorb the session's first device->host transfer (can take minutes on
    # tunneled backends) before any timed region, and tell the parent
    t0 = time.time()
    jax.device_get(jnp.sum(iq))
    emit(kind="warm", seconds=round(time.time() - t0, 1))

    def checksum(audio, spectra):
        return jnp.sum(audio[:, 0]) + jnp.sum(spectra[0, 0, 0])

    def ifs(c):
        return [int((i - c // 2) * 2_000) for i in range(c)]

    # fir_precision="highest" is float32-identical to the direct form
    # (bf16x6); "high" is the bf16x3 tier (~65 dB SNR vs the float32
    # chain through the FM discriminator — see BASELINE.md), benched at
    # the widest batch where it buys a real-time config that "highest"
    # cannot reach
    sweep = [
        (1024, "highest"), (4096, "highest"), (16384, "highest"),
        (32768, "highest"), (49152, "highest"), (65536, "high"),
    ]
    for c, fp in sweep:
        cfg = ChannelizedConfig(num_channels=c, fir_precision=fp)
        key = f"pfb_c{c}" + ("" if fp == "highest" else f"_{fp}")
        try:
            params = make_channelized_params(cfg, ifs(c), 80_000, 8_000, "FM")
            state = init_channelized_state(cfg)
            dt = _measure(
                lambda p, s, x: channelized_step(cfg, p, s, x),
                params, state, iq, checksum,
            )
        except Exception as e:
            emit(kind="error", key=key, error=str(e)[:120])
            break
        emit(kind="result", path="pfb", key=key, channels=c,
             precision=fp, step_ms=dt * 1e3,
             rt_channels=c * cfg.block_seconds / dt,
             realtime=dt <= cfg.block_seconds)
        if dt > 4 * cfg.block_seconds:
            break

    # the direct engine is the SHIPPED DEFAULT topology (capacity 4,
    # app.py DEFAULT_CONFIG) — small-C points cover what a stock install
    # actually runs; its realtime factor is block_seconds / step
    for c in (4, 16, 64, 256, 1024):
        cfg = ChainConfig(num_channels=c)
        try:
            params = make_receiver_params(cfg, ifs(c), 80_000, 8_000, "FM")
            state = init_state(cfg)
            dt = _measure(
                lambda p, s, x: frontend_step(cfg, p, s, x),
                params, state, iq, checksum,
            )
        except Exception as e:
            emit(kind="error", key=f"direct_c{c}", error=str(e)[:120])
            break
        emit(kind="result", path="direct", channels=c, step_ms=dt * 1e3,
             rt_channels=c * cfg.block_seconds / dt,
             realtime_factor=cfg.block_seconds / dt)
        if dt > 4 * cfg.block_seconds:
            break
    emit(kind="done")


# ---------------------------------------------------------------------------
# parent: deadline + aggregation
# ---------------------------------------------------------------------------

def main() -> None:
    fd, path = tempfile.mkstemp(prefix="webradio_bench_", suffix=".jsonl")
    os.close(fd)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", path],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    start = time.time()
    soft_deadline = start + PROGRESS_GRACE_S
    done = False
    last_size = 0
    while True:
        if child.poll() is not None:
            done = True
            break
        now = time.time()
        if now > start + DEADLINE_S:
            break  # absolute cap
        try:
            size = os.path.getsize(path)
        except OSError:
            size = 0
        if size != last_size:
            last_size = size
            soft_deadline = now + PROGRESS_GRACE_S
        elif size > 0 and now > soft_deadline:
            break  # produced something, then stalled
        time.sleep(2.0)
    if not done:
        # tunnel wedged or overran: take what we have (SIGKILL the exact
        # process group we created; never kill by pattern)
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except OSError:
            child.kill()
        child.wait()

    # headline: the LARGEST channel batch whose measured step fits inside
    # the 42.7 ms block budget — fully real-time, not throughput-
    # normalized — reported PER PRECISION TIER: "highest" (bf16x6,
    # float32-identical to the direct form = bit-exact) and "high"
    # (bf16x3, ~65 dB SNR vs the float32 chain). ``value`` is the
    # bit-exact tier, the conservative headline. Falls back to
    # throughput-normalized best (with a note) only if nothing measured
    # real-time.
    report = {}
    best_rt = {"highest": 0, "high": 0}  # precision -> largest rt batch
    best_tp, best_tp_c, best_tp_fp = 0.0, 0, ""
    try:
        for line in open(path):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("kind") == "result":
                key = rec.get("key") or f"{rec['path']}_c{rec['channels']}"
                report[f"{key}_step_ms"] = round(rec["step_ms"], 2)
                report[f"{key}_rt_channels"] = round(rec["rt_channels"], 1)
                if rec["path"] == "pfb":
                    fp = rec.get("precision", "highest")
                    if rec.get("realtime") and rec["channels"] > best_rt[fp]:
                        best_rt[fp] = rec["channels"]
                    if rec["rt_channels"] > best_tp:
                        best_tp = rec["rt_channels"]
                        best_tp_c, best_tp_fp = rec["channels"], fp
            elif rec.get("kind") == "error":
                report[rec["key"] + "_error"] = rec["error"]
    except OSError:
        pass
    bitexact = best_rt["highest"]
    bf16x3 = max(best_rt["high"], bitexact)  # highest also qualifies at x3
    value, best_c, best_fp = float(bitexact), bitexact, "highest"
    if value == 0.0 and bf16x3 > 0:
        value, best_c, best_fp = float(bf16x3), bf16x3, "high"
        report["note_headline"] = "no bit-exact config fit the budget; value is the bf16x3 tier"
    elif value == 0.0 and best_tp > 0.0:
        value, best_c, best_fp = best_tp, best_tp_c, best_tp_fp
        report["note_headline"] = "no config fit the block budget; value is throughput-normalized"
    if not done:
        report["note"] = f"deadline {DEADLINE_S}s hit; partial results"
    try:
        os.unlink(path)
    except OSError:
        pass

    value = round(value, 1)
    print(
        json.dumps(
            {
                "metric": "realtime_nbfm_channels_per_chip",
                "value": value,
                "unit": "channels @ 2.4Msps full chain",
                "vs_baseline": value,  # reference sustains 1 channel (SURVEY §6)
                "realtime_channels_bitexact": bitexact,
                "realtime_channels_bf16x3": bf16x3,
                "best_precision": best_fp,
                "detail": report,
                "best_batch": best_c,
            }
        )
    )


def soak(seconds: int = 30, capacity: int = 1024) -> int:
    """Live-server soak on the real backend (VERDICT r2 #10).

    Boots the full application — tone tuner at the reference's stock
    rates (2.4 Msps, 42.7 ms blocks, main.cxx:74-75), channelized engine
    at ``capacity`` receivers — pumps live for ``seconds``, then reads
    ``GET /status`` over HTTP and prints ONE JSON line. Pass criteria
    mirror the reference's real-time contract (capture overrun = data
    drop, rtlsdrtuner.cxx:99-102): zero ring drops and a sampled
    realtime_factor > 1.
    """
    import http.client
    import logging

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    from webradio_tpu.app import RadioApp

    config = {
        "server": {"port": 0, "host": "127.0.0.1", "html": "html"},
        "tuners": [
            {
                "driver": "tone",
                "centre_frequency": 124_325_000,
                "sample_rate": 2_400_000,
                "block_frames": 102_400,
                "capacity": capacity,
                "engine": "channelized",
            }
        ],
        "receivers": [
            {"tuner": 0, "if_frequency": 100_000, "demodulator": "FM"}
        ],
    }
    app = RadioApp(config)

    def fetch_status():
        conn = http.client.HTTPConnection("127.0.0.1", app.server.port,
                                          timeout=30)
        conn.request("GET", "/status", headers={"Host": "127.0.0.1"})
        st = json.loads(conn.getresponse().read())
        conn.close()
        return next(iter(st["front_ends"].values()))

    try:
        if not app.start():
            print(json.dumps({"metric": "soak", "ok": False,
                              "error": "app failed to start"}))
            return 1
        # settle: the background warm-up compiles (param-structure
        # variants, catch-up scan) intentionally overlap live serving;
        # on a remote-compile backend they serialize with dispatch and
        # can drop early blocks. The steady-state claim starts after
        # they land.
        settle = 15
        time.sleep(settle)
        base = fetch_status()
        time.sleep(seconds)
        fe = fetch_status()
    finally:
        app.close()
    blocks = fe["blocks"] - base["blocks"]
    dropped = fe["dropped_blocks"] - base["dropped_blocks"]
    block_s = 102_400 / 2_400_000
    expected = seconds / block_s
    # real-time = the reference's contract: the paced source's every
    # block got processed (zero overruns) at the source rate. The
    # sampled latency (ns_per_frame) is reported but not gated on — it
    # includes a full host-link round trip per sample, which on the dev
    # tunnel is ~0.3 s and says nothing about device throughput.
    ok = dropped == 0 and blocks >= 0.97 * expected
    print(json.dumps({
        "metric": "live_soak",
        "ok": ok,
        "seconds": seconds,
        "settle_seconds": settle,
        "capacity": capacity,
        "engine": fe["engine"],
        "blocks": blocks,
        "blocks_expected": round(expected, 1),
        "dropped_blocks": dropped,
        "dropped_total_with_warmup": fe["dropped_blocks"],
        "throughput_factor": fe.get("throughput_factor"),
        "sampled_latency_ns_per_frame": fe["ns_per_frame"],
        "last_dispatch_ms": fe["last_dispatch_ms"],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "--soak":
        sys.exit(soak(
            int(sys.argv[2]) if len(sys.argv) > 2 else 30,
            int(sys.argv[3]) if len(sys.argv) > 3 else 1024,
        ))
    else:
        main()
