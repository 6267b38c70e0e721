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
        channelized_step_serving,
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

    def checksum_serving(audio, latest_db):
        # serving audio is time-major [af, C]; latest_db is [fft]
        return jnp.sum(audio[0]) + jnp.sum(latest_db[0])

    def ifs(c):
        return [int((i - c // 2) * 2_000) for i in range(c)]

    try:
        emit(kind="parity", **parity_check())
    except Exception as e:
        emit(kind="parity", ok=False, error=str(e)[:200])

    # Quality tiers (measured on-device; `bench.py --accuracy` for the
    # end-to-end SNR vs float64, BASELINE.md r4 for the hx tiers):
    #   fir=highest : bf16x6 FIRs, float32-identical to the direct
    #                 engine — the bit-exact tier
    #   fir=hx5/hx4 : host-exact 3-term weight split x 2-term data
    #                 split, 5/4 MXU passes — measured <= 6.3e-7 max abs
    #                 audio deviation from the bit-exact chain (111/109
    #                 dB), an order of magnitude inside the framework's
    #                 own 3e-6 equality bound ("f32-parity" tiers)
    #   fir=high    : bf16x3 (~65 dB through the FM discriminator)
    #   pfb=highest : float32-exact filterbank (reference quality);
    #   pfb=u8exact : exact for 8-bit-sourced (all hardware) signals at
    #                 2 passes; pfb=default: one bf16 pass (~31 dB).
    # Every config passes mode_set (the live server does too): the
    # fused kernel statically evaluates only the demod laws present.
    # headline configs FIRST: if the harness deadline clips the sweep,
    # the best real-time batches per tier are already on record
    sweep = [
        (81920, "highest", "default"),   # bit-exact-FIR headline (r5:
                                         # transpose-free serving layout
                                         # + audio-FIR ta_sub=16 re-tile)
        (79872, "highest", "default"),   # headline fallback 1
        (90112, "hx4", "default"),       # f32-parity throughput tier
        (86016, "hx5", "default"),       # f32-parity, 5-pass
        (73728, "highest", "u8exact"),   # reference quality, u8 input
        (46080, "highest", "highest"),   # reference quality, any input
        (96256, "high", "default"),      # bf16x3 throughput tier
        (88064, "highest", "bf16"),      # bf16-stored product tier
        (86016, "highest", "bf16"),      # (reported separately)
        (102400, "high", "bf16"),        # max-throughput crown (100k+)
        (98304, "hx4", "bf16"),
        (77824, "highest", "default"),   # headline fallback 2
        (88064, "hx4", "default"), (83968, "hx5", "default"),
        (77824, "hx4", "u8exact"), (75776, "hx4", "u8exact"),
        (73728, "hx5", "u8exact"),
        (71680, "highest", "u8exact"), (69632, "highest", "u8exact"),
        (45056, "highest", "highest"),
        (32768, "highest", "default"), (16384, "highest", "default"),
        (4096, "highest", "default"), (1024, "highest", "default"),
    ]
    for c, fp, pp in sweep:
        cfg = ChannelizedConfig(num_channels=c, fir_precision=fp,
                                pfb_precision=pp)
        key = (f"pfb_c{c}" + ("" if fp == "highest" else f"_{fp}")
               + ("" if pp == "default" else f"_pfb{pp}"))
        try:
            from webradio_tpu.pipeline.channelized import mode_set_of

            params = make_channelized_params(cfg, ifs(c), 80_000, 8_000, "FM")
            ms = mode_set_of(params.mode)
            state = init_channelized_state(cfg)
            # measure the SERVING step — spectrum dB row + time-major
            # audio, exactly the program the live pump dispatches per
            # block (r5: the serving layout skips the [C, af] transpose)
            dt = _measure(
                lambda p, s, x: channelized_step_serving(cfg, p, s, x,
                                                         mode_set=ms),
                params, state, iq, checksum_serving,
            )
        except Exception as e:
            emit(kind="error", key=key, error=str(e)[:120])
            continue
        emit(kind="result", path="pfb", key=key, channels=c,
             precision=fp, pfb_precision=pp, step_ms=dt * 1e3,
             rt_channels=c * cfg.block_seconds / dt,
             realtime=dt <= cfg.block_seconds)

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


def parity_check() -> dict:
    """On-device split-weight-law parity regression (VERDICT r4 #4).

    The hx5/hx4 host-exact-weight FIR tiers and the u8exact filterbank
    law are measurable ONLY on real hardware: XLA-CPU silently elides
    in-jit bf16 hi/lo splits (BASELINE r3 #6), so interpret-mode tests
    pass vacuously. This re-measures them against the bit-exact (bf16x6)
    chain every bench run — C=128, one stock-rate block, forced Pallas
    tail (the kernel every headline batch uses) — and the bench parent
    FAILS the process on a bound violation. USB isolates FIR arithmetic
    (linear law); FM adds the discriminator (where a large error flips
    atan2 wraps). Bounds: measured r4 maxima (<= 6.3e-7) x ~4 headroom,
    still inside the framework's own 3e-6 sharded-equality bound.
    Standalone: ``python bench.py --parity``.
    """
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

    c = 128
    pifs = [int((i - c // 2) * 2_000) + 777 for i in range(c)]
    prng = np.random.default_rng(7)
    x = jnp.asarray(prng.standard_normal((2, 102_400)).astype(np.float32))
    # real hardware signals live on the u8 ADC grid (x-128)/128
    xu8 = jnp.asarray((np.round(prng.standard_normal((2, 102_400)) * 64)
                       .clip(-128, 127) / 128.0).astype(np.float32))

    def audio_of(fir_p, pfb_p, mode, sig):
        cfg = ChannelizedConfig(num_channels=c, fir_precision=fir_p,
                                pfb_precision=pfb_p,
                                tail_kernel="pallas")
        params = make_channelized_params(cfg, pifs, 80_000, 8_000, mode)
        _, audio, _ = channelized_step(
            cfg, params, init_channelized_state(cfg), sig,
            mode_set=mode_set_of(params.mode))
        return np.asarray(jax.device_get(audio), np.float64)

    res = {"backend": jax.default_backend()}
    checks = []  # (name, measured, bound)
    for mode, bound in (("USB", 2e-6), ("FM", 3e-6)):
        base = audio_of("highest", "highest", mode, x)
        for tier in ("hx5", "hx4"):
            d = float(np.max(np.abs(audio_of(tier, "highest", mode, x)
                                    - base)))
            checks.append((f"hx_{tier}_{mode}", d, bound))
    base_u8 = audio_of("highest", "highest", "USB", xu8)
    d = float(np.max(np.abs(audio_of("highest", "u8exact", "USB", xu8)
                            - base_u8)))
    checks.append(("u8exact_USB", d, 3e-6))
    base_u8fm = audio_of("highest", "highest", "FM", xu8)
    d = float(np.max(np.abs(audio_of("highest", "u8exact", "FM", xu8)
                            - base_u8fm)))
    checks.append(("u8exact_FM", d, 3e-6))
    ok = True
    for name, d, bound in checks:
        res[name] = float(f"{d:.2e}")
        if d > bound:
            res[name + "_VIOLATION"] = f"bound {bound:g}"
            ok = False
    res["ok"] = ok
    return res


# ---------------------------------------------------------------------------
# roofline model (VERDICT r3 #8: machine-visible across rounds)
# ---------------------------------------------------------------------------

#: v5e peak bf16 MXU throughput / f32 VPU throughput / HBM bandwidth
V5E_MXU_FLOPS = 197e12
V5E_VPU_FLOPS = 3.9e12
V5E_HBM_BPS = 819e9

_FIR_PASSES = {"highest": 6, "hx5": 5, "hx4": 4, "high": 3}
_PFB_PASSES = {"default": 1, "u8exact": 2, "high": 3, "highest": 6}


def roofline_model_ms(c: int, fir: str, pfb: str) -> dict:
    """Compute-/bandwidth-bound step-time model for the channelized step
    at stock rates (nd = 10240 channel-rate frames per 42.7 ms block).

    Two-stage model (refreshed r5 from a post-re-tile device trace at
    C=73728/32768; the stages genuinely serialize — the fused tail
    kernel consumes the filterbank fusion's packed product):

    * FRONT (the XLA fusion: spectrum + im2col + filterbank matmul +
      packed-product write): ``max(pfb MXU, product-write HBM)``. The
      trace measures this stage AT its HBM bound (8.18 ms at C=73728 vs
      7.4 modeled) — no lever left but removing the product, and the
      filterbank-fused kernel re-A/B (r5, T=64 band) still loses at the
      full-step level (43.1 vs 41.5 ms at C=73728).
    * KERNEL (fused mix/FIR/demod/audio tail): ``max(FIR MXU, VPU,
      product-read HBM)``. MXU MAC-slots COUNT THE PADDED BAND ZEROS:
      the re-tiled shaping FIR runs 128 slots per output row per channel
      per pass (64-tap band in ONE [64, 127] K-tile), the sub-tiled
      audio FIR 384 per output row (span 379 -> 3 K-tiles). The VPU term
      models the mode_set-specialized FM chain (~35 flops/sample:
      factored-phasor LO + mix + discriminator + power). Measured 27.4
      ms at C=73728 vs 15.3 ideal: the residual is MXU/VPU DEPENDENCE
      inside each tile (mix feeds FIR feeds demod — the r4 microbench
      showed independent streams co-schedule at ~max, but these are not
      independent; manual interleave measured a wash).

    ``ideal_ms`` = front_ideal + kernel_ideal (+0.7 ms measured layout
    copies); ``serial_ms`` = no-overlap sum of every stream.
    """
    nd = 10_240
    kp2 = 320  # 2 * proto_taps at stock rates (16 taps/phase x 10 bins)
    fp = _FIR_PASSES[fir]
    pp = _PFB_PASSES[pfb]
    fir_macs = (
        2 * nd * c * 128 * fp          # shaping FIR, I+Q planes
        # audio FIR at the r5 ta_sub=16 re-tile: span 139 -> 2 K-tiles
        # per output row (was 3 at ta_sub=64; measured -1.4 ms at
        # C=73728/highest, matching this slot count)
        + (nd // 5) * c * 256 * fp
    )
    pfb_macs = nd * 384 * 2 * c * pp   # filterbank matmul (3 K-tiles)
    fir_mxu_ms = 2 * fir_macs / V5E_MXU_FLOPS * 1e3
    pfb_mxu_ms = 2 * pfb_macs / V5E_MXU_FLOPS * 1e3
    vpu_ms = nd * c * 35 / V5E_VPU_FLOPS * 1e3
    product_bytes = nd * 2 * c * 4     # packed [nd, 2C] product
    front_hbm_ms = (
        product_bytes                  # product write
        + nd * kp2 * 4                 # im2col frames read
        + kp2 * 2 * c * 4 * (2 if pfb == "u8exact" else 1)  # weights
    ) / V5E_HBM_BPS * 1e3
    kernel_hbm_ms = (
        product_bytes                  # product read (once, BlockSpec)
        + 2 * (nd // 5) * c * 4        # audio write + transpose read
    ) / V5E_HBM_BPS * 1e3
    copies_ms = 0.7                    # measured residual layout copies
    front_ideal = max(pfb_mxu_ms, front_hbm_ms) + 0.3  # + spectrum FFT
    kernel_ideal = max(fir_mxu_ms, vpu_ms, kernel_hbm_ms)
    return {
        "front_mxu_ms": round(pfb_mxu_ms, 2),
        "front_hbm_ms": round(front_hbm_ms, 2),
        "kernel_mxu_ms": round(fir_mxu_ms, 2),
        "kernel_vpu_ms": round(vpu_ms, 2),
        "kernel_hbm_ms": round(kernel_hbm_ms, 2),
        "ideal_ms": round(front_ideal + kernel_ideal + copies_ms, 2),
        "serial_ms": round(pfb_mxu_ms + front_hbm_ms + fir_mxu_ms
                           + vpu_ms + kernel_hbm_ms + copies_ms + 0.3, 2),
    }


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
    parity = {}
    best_rt = {"highest": 0, "hx5": 0, "hx4": 0, "high": 0}
    best_bf16p = 0  # fir=highest + pfb="bf16" (bf16-STORED product) —
    # reported apart: its product quality sits ~1 dB under the
    # "default" tier every other headline row uses
    best_any = 0  # largest real-time batch at ANY tier combination
    best_refq = 0  # fir=highest AND pfb=highest (float32-exact chain)
    best_refq_u8 = 0  # fir=highest, pfb=u8exact (exact for u8 input)
    best_u8_parity = 0  # fir in {highest,hx5,hx4}, pfb=u8exact
    best_tp, best_tp_c, best_tp_fp = 0.0, 0, ""
    headline_ms = None  # measured step at the headline (bitexact) config
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
                    pp = rec.get("pfb_precision", "default")
                    if rec.get("realtime") and rec["channels"] > best_any:
                        best_any = rec["channels"]
                    if pp == "bf16":
                        # bf16-stored product: its own tier, never the
                        # headline (see best_bf16p note)
                        if (rec.get("realtime") and fp == "highest"
                                and rec["channels"] > best_bf16p):
                            best_bf16p = rec["channels"]
                        continue
                    if rec.get("realtime") and rec["channels"] > best_rt[fp]:
                        best_rt[fp] = rec["channels"]
                        if fp == "highest":
                            headline_ms = (rec["channels"], pp,
                                           rec["step_ms"])
                    if (rec.get("realtime") and fp == "highest"
                            and pp == "highest"
                            and rec["channels"] > best_refq):
                        best_refq = rec["channels"]
                    if (rec.get("realtime") and fp == "highest"
                            and pp == "u8exact"
                            and rec["channels"] > best_refq_u8):
                        best_refq_u8 = rec["channels"]
                    if (rec.get("realtime") and pp == "u8exact"
                            and fp in ("highest", "hx5", "hx4")
                            and rec["channels"] > best_u8_parity):
                        best_u8_parity = rec["channels"]
                    if rec["rt_channels"] > best_tp:
                        best_tp = rec["rt_channels"]
                        best_tp_c, best_tp_fp = rec["channels"], fp
            elif rec.get("kind") == "parity":
                parity = {k: v for k, v in rec.items() if k != "kind"}
            elif rec.get("kind") == "error":
                report[rec["key"] + "_error"] = rec["error"]
    except OSError:
        pass
    bitexact = best_rt["highest"]
    # quality ordering: highest > hx5 > hx4 > high — each tier's best
    # batch also qualifies at every lower tier
    f32parity = max(best_rt["hx5"], best_rt["hx4"], bitexact)
    bf16x3 = max(best_rt["high"], f32parity)
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

    # roofline position of the headline config (VERDICT r3 #8): how far
    # the measured step sits from the modeled compute/bandwidth bound
    roofline = {}
    roofline_detail = {}
    if headline_ms is not None:
        hc, hpp, hms = headline_ms
        model = roofline_model_ms(hc, "highest", hpp)
        roofline = {
            "roofline_ms": model["ideal_ms"],
            "roofline_serial_ms": model["serial_ms"],
            "roofline_frac": round(model["ideal_ms"] / hms, 3),
        }
        roofline_detail = {**model, "measured_ms": round(hms, 2),
                           "config": f"c{hc}_highest_pfb{hpp}"}

    # compact parity summary for the headline line: worst measured
    # deviation per law family (full numbers on the detail line)
    parity_summary = {}
    if parity:
        hx = [v for k, v in parity.items()
              if k.startswith("hx_") and isinstance(v, float)]
        u8 = [v for k, v in parity.items()
              if k.startswith("u8exact") and isinstance(v, float)]
        parity_summary = {
            "parity_ok": bool(parity.get("ok", False)),
            "parity_hx_max_dev": max(hx) if hx else None,
            "parity_u8exact_max_dev": max(u8) if u8 else None,
        }

    value = round(value, 1)
    # The driver captures only the tail of stdout and parses the FINAL
    # line — keep it compact (BENCH_r04 went unparsed when `detail`
    # outgrew the capture). Full per-config numbers go on their own
    # preceding line.
    print(json.dumps({
        "metric": "realtime_nbfm_channels_per_chip_detail",
        "detail": report,
        "roofline_detail": roofline_detail,
        "parity": parity,
    }))
    print(
        json.dumps(
            {
                "metric": "realtime_nbfm_channels_per_chip",
                "value": value,
                "unit": "channels @ 2.4Msps full chain",
                "vs_baseline": value,  # reference sustains 1 channel (SURVEY §6)
                "realtime_channels_bitexact": bitexact,
                # hx5/hx4 host-exact-weight tiers: <= 6.3e-7 max abs
                # audio deviation from the bit-exact chain (measured
                # on-device, BASELINE.md r4) — inside the framework's
                # own 3e-6 equality bound
                "realtime_channels_f32parity": f32parity,
                "realtime_channels_bf16x3": bf16x3,
                # bf16-STORED packed product (pfb="bf16"): bit-exact
                # FIRs on a product ~3 dB below the "default" tier's —
                # the cheapest-HBM throughput configuration
                "realtime_channels_bf16product": best_bf16p,
                # the crown: largest real-time batch over every tier
                # combination (r5: high-FIR + bf16 product, ~65 dB FIR
                # arithmetic on a ~30 dB product — mass-monitoring)
                "realtime_channels_max_any_tier": best_any,
                **roofline,
                # float32-exact end to end (fir=highest AND pfb=highest;
                # ~146 dB vs float64 on FM tones — the reference chain's
                # own arithmetic quality)
                "realtime_channels_reference_quality": best_refq,
                # 2-pass split-weight filterbank: zero bf16 product error
                # for 8-bit-sourced signals (all real RTL2832U data)
                "realtime_channels_reference_quality_u8input": max(
                    best_refq_u8, best_refq),
                # f32-parity FIR (hx5/hx4, 146 dB vs float64 end to end
                # — measured equal to the bf16x6 chain) + the exact-u8
                # filterbank: reference-equivalent quality for hardware
                # signals at the fastest arithmetic
                "realtime_channels_u8input_f32parity": max(
                    best_u8_parity, best_refq_u8, best_refq),
                "best_precision": best_fp,
                "best_batch": best_c,
                **parity_summary,
            }
        )
    )
    # VERDICT r4 #4: a measured bound violation in the split-weight laws
    # fails the bench (an exception in the check is reported, not gated —
    # it means the check could not run, usually a tunnel flake)
    if parity and not parity.get("ok", True) and "error" not in parity:
        sys.exit(1)


def accuracy() -> int:
    """Measured end-to-end arithmetic accuracy of the channelized engine.

    Runs one stock-rate block of full-band noise (the worst case for the
    FM discriminator) through ``channelized_step`` on the device at each
    (fir_precision, pfb_precision) tier, against a float64 NumPy
    evaluation of the SAME math (same float32 parameter values, same
    quantized-NCO/demod laws, full float64 arithmetic). This quantifies
    what each precision knob actually buys END TO END — including the
    filterbank's bf16-pass floor, which parity tests that share the
    filterbank product cannot see (BASELINE.md r3 #4). Prints ONE JSON
    line of SNR dB per tier.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from webradio_tpu.pipeline.channelized import (
        ChannelizedConfig,
        channelized_step,
        init_channelized_state,
        make_channelized_params,
    )

    c = 128  # one channel tile
    cfg0 = ChannelizedConfig(num_channels=c)
    ifs = [int((i - c // 2) * 2_000) + 777 for i in range(c)]
    params0 = make_channelized_params(cfg0, ifs, 80_000, 8_000, "FM")

    def f64_reference(x64):
        """Float64 evaluation of the channelized math on exact-f32 input
        values and exact-f32 parameter values."""
        d = cfg0.num_bins
        kp = cfg0.proto_taps
        nd = cfg0.chan_frames
        k = cfg0.fir_length
        ad = cfg0.audio_decim
        w64 = np.asarray(params0.pfb_weights,
                         np.float64).reshape(2 * kp, 2 * c)
        # im2col frames [nd, 2kp] (zero history, as init state)
        ext = np.concatenate([np.zeros((2, kp - 1)), x64], axis=-1)
        fr = np.empty((nd, 2 * kp))
        for t in range(kp):
            col = ext[:, (kp - 1 - t): (kp - 1 - t) + nd * d: d].T
            fr[:, t] = col[:, 0]
            fr[:, kp + t] = col[:, 1]
        y = fr @ w64  # [nd, 2C]
        ci, cq = y[:, :c], y[:, c:]
        # residual NCO (fast law: full 31-bit angle), phase0 = 0
        n = np.arange(nd, dtype=np.uint64)[:, None]
        steps = np.asarray(params0.residual_step, np.uint64)[None, :]
        ph = (n * steps) & np.uint64((1 << 31) - 1)
        theta = ph.astype(np.float64) * (2.0 * np.pi / (1 << 31))
        s_, c_ = np.sin(theta), np.cos(theta)
        mi = ci * c_ + cq * s_
        mq = cq * c_ - ci * s_
        # shaping FIR (decim 1), reference correlation (lowpass.cxx:151)
        rev = np.asarray(params0.chan_coeff, np.float64)[0][::-1]
        exti = np.concatenate([np.zeros((k - 1, c)), mi], axis=0)
        extq = np.concatenate([np.zeros((k - 1, c)), mq], axis=0)
        yi = np.zeros((nd, c))
        yq = np.zeros((nd, c))
        for j in range(k):
            yi += rev[j] * exti[j: j + nd]
            yq += rev[j] * extq[j: j + nd]
        # FM: conjugate-previous product, atan2(ii, qq) arg order, /2pi
        li = np.concatenate([np.zeros((1, c)), yi[:-1]], axis=0)
        lq = np.concatenate([np.zeros((1, c)), yq[:-1]], axis=0)
        ii = yi * li + yq * lq
        qq = yq * li - yi * lq
        fm = np.arctan2(ii, qq) / (2.0 * np.pi)
        # audio FIR decim 5
        arev = np.asarray(params0.audio_coeff, np.float64)[0][::-1]
        exta = np.concatenate([np.zeros((k - 1, c)), fm], axis=0)
        ref = np.zeros((nd // ad, c))
        for j in range(k):
            ref += arev[j] * exta[j: j + (nd // ad) * ad: ad]
        return ref.T  # [C, audio_frames]

    rng = np.random.default_rng(7)
    nb = cfg0.block_frames
    signals = {}
    # worst case: full-band noise through the FM discriminator (phase
    # errors blow up where |y| ~ 0 — this bounds EVERY f32 chain)
    signals["noise"] = rng.standard_normal((2, nb))
    # realistic: one NBFM carrier per receiver at its own IF
    t = np.arange(nb) / cfg0.sample_rate
    z = np.zeros(nb, np.complex128)
    for f in ifs:
        beta = 5_000.0 / 1_000.0
        z += 0.08 * np.exp(1j * (2 * np.pi * f * t
                                 + beta * np.sin(2 * np.pi * 1_000.0 * t)))
    z += 0.002 * (rng.standard_normal(nb) + 1j * rng.standard_normal(nb))
    signals["fm_tones"] = np.stack([z.real, z.imag])
    # real hardware signals live on the u8 ADC grid (x-128)/128 — the
    # domain where the u8exact split-weight filterbank has zero bf16
    # product error
    signals["u8_noise"] = (
        np.round(signals["noise"] * 64).clip(-128, 127) / 128.0)

    out = {"metric": "channelized_audio_snr_db_vs_float64", "channels": c}
    for name, sig in signals.items():
        x = jnp.asarray(sig.astype(np.float32))
        ref = f64_reference(np.asarray(x, np.float64))
        for fir_p, pfb_p in (("highest", "default"), ("highest", "high"),
                             ("highest", "highest"), ("high", "default"),
                             ("high", "high"), ("highest", "u8exact"),
                             ("high", "u8exact"), ("hx5", "highest"),
                             ("hx5", "u8exact"), ("hx4", "highest"),
                             ("highest", "bf16")):
            cfg = ChannelizedConfig(num_channels=c, fir_precision=fir_p,
                                    pfb_precision=pfb_p)
            params = make_channelized_params(cfg, ifs, 80_000, 8_000, "FM")
            _, audio, _ = channelized_step(cfg, params,
                                           init_channelized_state(cfg), x)
            got = np.asarray(jax.device_get(audio), np.float64)
            err = got - ref
            snr = 10.0 * np.log10(np.mean(ref ** 2) / np.mean(err ** 2))
            out[f"{name}_fir_{fir_p}_pfb_{pfb_p}"] = round(float(snr), 1)
    print(json.dumps(out))
    return 0


def soak(seconds: int = 30, capacity: int = 1024, consumers: int = 8,
         pfb: str = "highest", driver: str = "tone",
         fir: str = "highest") -> int:
    """Live-server soak on the real backend (VERDICT r2 #10 / r3 #6).

    Boots the full application — tone tuner at the reference's stock
    rates (2.4 Msps, 42.7 ms blocks, main.cxx:74-75), channelized engine
    at ``capacity`` receivers — pumps live for ``seconds`` WITH real
    consumers attached: ``consumers`` HTTP audio subscribers spread
    across distinct receiver mounts (created via POST /receivers) plus a
    5 Hz waterfall poller (the UI's cadence, ui.html:168). Then reads
    ``GET /status`` and prints ONE JSON line. Pass criteria mirror the
    reference's real-time contract (capture overrun = data drop,
    rtlsdrtuner.cxx:99-102): zero ring drops, every consumer received
    audio, and blocks kept pace.
    """
    import http.client
    import logging
    import threading

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    from webradio_tpu.app import RadioApp

    subdevice = ""
    if driver == "file":
        # capture-replay source: pre-loaded, looping, near-zero per-block
        # host cost (the tone synthesizer is GIL-bound numpy and becomes
        # the limit past ~50k channels under full serving load)
        import numpy as _np
        import tempfile as _tf

        fd, subdevice = _tf.mkstemp(suffix=".cu8")
        os.close(fd)
        rng = _np.random.default_rng(1)
        _np.asarray(rng.integers(0, 256, 4 * 204_800), _np.uint8
                    ).tofile(subdevice)
    config = {
        "server": {"port": 0, "host": "127.0.0.1", "html": "html"},
        "tuners": [
            {
                "driver": driver,
                "subdevice": subdevice,
                "centre_frequency": 124_325_000,
                "sample_rate": 2_400_000,
                "block_frames": 102_400,
                "capacity": capacity,
                "engine": "channelized",
                # big-batch soaks pick the tier whose step fits the
                # budget at that C (BASELINE per-tier maxima); the
                # default mirrors the app's synthetic-tuner default
                "pfb_precision": pfb,
                "fir_precision": fir,
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

    stop_consumers = threading.Event()
    stream_bytes = []
    waterfall_polls = [0]

    def make_receivers(n):
        uuids = [app.receivers[0].uuid]
        for i in range(n - 1):
            conn = http.client.HTTPConnection("127.0.0.1", app.server.port,
                                              timeout=30)
            conn.request(
                "POST", "/receivers",
                body=json.dumps({"tuner": "0", "if_frequency":
                                 100_000 + 5_000 * (i + 1),
                                 "demodulator": "FM"}),
                headers={"Host": "127.0.0.1",
                         "Content-Type": "application/json"})
            r = conn.getresponse()
            root = json.loads(r.read())
            conn.close()
            uuids.append(root["uri"].rsplit("/", 1)[1])
        return uuids

    def audio_consumer(idx, uuid):
        conn = http.client.HTTPConnection("127.0.0.1", app.server.port,
                                          timeout=60)
        try:
            conn.request("GET", f"/audio/{uuid}.mp3",
                         headers={"Host": "127.0.0.1"})
            resp = conn.getresponse()
            while not stop_consumers.is_set():
                chunk = resp.read(4096)
                if not chunk:
                    break
                stream_bytes[idx] += len(chunk)
        except Exception:
            pass
        finally:
            conn.close()

    def waterfall_poller():
        while not stop_consumers.is_set():
            try:
                conn = http.client.HTTPConnection(
                    "127.0.0.1", app.server.port, timeout=30)
                conn.request("GET", "/tuners/0000/waterfall",
                             headers={"Host": "127.0.0.1"})
                conn.getresponse().read()
                conn.close()
                waterfall_polls[0] += 1
            except Exception:
                pass
            stop_consumers.wait(0.2)  # the UI's 5 Hz cadence

    threads = []
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
        # attach the serving load: distinct mounts + waterfall polling
        uuids = make_receivers(max(1, consumers))
        stream_bytes.extend([0] * len(uuids))
        for i, u in enumerate(uuids):
            t = threading.Thread(target=audio_consumer, args=(i, u),
                                 daemon=True)
            t.start()
            threads.append(t)
        t = threading.Thread(target=waterfall_poller, daemon=True)
        t.start()
        threads.append(t)
        time.sleep(5)  # absorb the POST-driven params rebuilds
        base = fetch_status()
        time.sleep(seconds)
        fe = fetch_status()
        stop_consumers.set()
    finally:
        stop_consumers.set()
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
    fed = all(b > 0 for b in stream_bytes)
    ok = dropped == 0 and blocks >= 0.97 * expected and fed
    print(json.dumps({
        "metric": "live_soak",
        "ok": ok,
        "seconds": seconds,
        "settle_seconds": settle,
        "capacity": capacity,
        "pfb_precision": pfb,
        "fir_precision": fir,
        "engine": fe["engine"],
        "blocks": blocks,
        "blocks_expected": round(expected, 1),
        "dropped_blocks": dropped,
        "dropped_total_with_warmup": fe["dropped_blocks"],
        "overload_events": fe.get("overload_events"),
        "throughput_factor": fe.get("throughput_factor"),
        "sampled_latency_ns_per_frame": fe["ns_per_frame"],
        "last_dispatch_ms": fe["last_dispatch_ms"],
        "audio_consumers": len(stream_bytes),
        "audio_stream_bytes": stream_bytes,
        "waterfall_polls": waterfall_polls[0],
    }))
    return 0 if ok else 1


def recovery(stall_ms: int = 500, capacity: int = 1024) -> int:
    """Backlog-recovery measurement (VERDICT r3 #7), on the CPU backend.

    Boots the live app (tone tuner, channelized engine), lets it reach
    steady state, then injects a forced pump stall of ``stall_ms`` (the
    pump thread sleeps before its next block — a GC pause / tunnel
    hiccup stand-in) while the paced capture keeps filling the 4-deep
    ring (the reference's ~171 ms stall tolerance,
    rtlsdrtuner.cxx:33-34). Measures ring drops during the stall and the
    time for the backlog to drain back to zero. With the stock 4-deep
    ring the backlog can never exceed 4 = CATCHUP_BLOCKS, so any stall
    drains in at most ONE warmed scan dispatch — this measurement is
    what justifies the catch-up sizing by data.
    """
    import logging
    import threading

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
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
    try:
        if not app.start():
            print(json.dumps({"metric": "backlog_recovery", "ok": False,
                              "error": "app failed to start"}))
            return 1
        fe = app.front_ends[0]
        # wait for the warmed catch-up scan (compiled in the background)
        deadline = time.time() + 120
        while not fe._catchup_scan_ready() and time.time() < deadline:
            time.sleep(0.5)
        scan_ready = fe._catchup_scan_ready()
        # steady state gate: the backend must actually be real-time at
        # this capacity BEFORE the stall, else drops measure machine
        # capacity rather than recovery
        time.sleep(2)
        pre_drops = fe.ring.dropped_blocks
        time.sleep(3)
        if fe.ring.dropped_blocks != pre_drops:
            print(json.dumps({
                "metric": "backlog_recovery", "ok": False,
                "error": "backend not real-time at this capacity "
                         "(steady-state drops) — lower capacity",
                "capacity": capacity,
            }))
            return 1

        # inject: one-shot stall at the next pump iteration
        orig = fe.run_once
        stalled = threading.Event()

        def stalling_run_once(timeout=1.0):
            fe.run_once = orig  # one shot
            time.sleep(stall_ms / 1e3)
            stalled.set()
            return orig(timeout)

        drops0 = fe.ring.dropped_blocks
        blocks0 = fe.block_count
        fe.run_once = stalling_run_once
        assert stalled.wait(30), "stall never triggered"
        t_end_stall = time.monotonic()
        max_backlog = fe.ring.backlog
        # drain: time until the ring is empty again
        recovered = None
        while time.monotonic() - t_end_stall < 30:
            max_backlog = max(max_backlog, fe.ring.backlog)
            if fe.ring.backlog == 0 and fe.block_count > blocks0:
                recovered = time.monotonic() - t_end_stall
                break
            time.sleep(0.005)
        # post-recovery steady state: blocks must flow at source rate
        # again (throughput_factor spans capture start incl. the stall,
        # so gate on this window instead)
        post0 = fe.block_count
        post_drops0 = fe.ring.dropped_blocks
        time.sleep(3)
        post_blocks = fe.block_count - post0
        post_drops = fe.ring.dropped_blocks - post_drops0
        drops = fe.ring.dropped_blocks - drops0
        blocks = fe.block_count - blocks0
        tput = fe.throughput_factor()
    finally:
        app.close()
    block_ms = 102_400 / 2_400_000 * 1e3
    expected_drops = max(0, int(stall_ms / block_ms) - 4)
    ok = (recovered is not None
          and drops <= expected_drops + 2
          and post_drops == 0
          and post_blocks >= 0.9 * (3_000 / block_ms))
    print(json.dumps({
        "metric": "backlog_recovery",
        "ok": ok,
        "stall_ms": stall_ms,
        "capacity": capacity,
        "catchup_scan_ready": scan_ready,
        "max_backlog_seen": max_backlog,
        "ring_drops_during_stall": drops,
        "expected_drops_at_most": expected_drops,
        "blocks_processed_after": blocks,
        "recovery_ms_after_stall": (round(recovered * 1e3, 1)
                                    if recovered is not None else None),
        "post_recovery_blocks_3s": post_blocks,
        "post_recovery_drops": post_drops,
        "throughput_factor_since_start": tput,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "--accuracy":
        sys.exit(accuracy())
    elif len(sys.argv) > 1 and sys.argv[1] == "--parity":
        res = parity_check()
        print(json.dumps({"metric": "split_weight_law_parity", **res}))
        sys.exit(0 if res["ok"] else 1)
    elif len(sys.argv) > 1 and sys.argv[1] == "--soak":
        sys.exit(soak(
            int(sys.argv[2]) if len(sys.argv) > 2 else 30,
            int(sys.argv[3]) if len(sys.argv) > 3 else 1024,
            int(sys.argv[4]) if len(sys.argv) > 4 else 8,
            sys.argv[5] if len(sys.argv) > 5 else "highest",
            sys.argv[6] if len(sys.argv) > 6 else "tone",
            sys.argv[7] if len(sys.argv) > 7 else "highest",
        ))
    elif len(sys.argv) > 1 and sys.argv[1] == "--recovery":
        sys.exit(recovery(
            int(sys.argv[2]) if len(sys.argv) > 2 else 500,
            int(sys.argv[3]) if len(sys.argv) > 3 else 1024,
        ))
    else:
        main()
