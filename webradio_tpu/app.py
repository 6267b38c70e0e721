"""Application assembly: declarative topology -> running radio server.

The reference's only configuration is a hardcoded block in ``main()``
(src/main.cxx:71-107: one RTL-SDR front end, one AM receiver, 12 URL
routes) plus one positional tuner-serial argument. Here the topology is a
declarative dict (loadable from JSON): tuners, receivers, server — with
defaults reproducing the reference's shipped setup on the hardware-free
tuner seam.
"""

from __future__ import annotations

import json
import logging
import pathlib
import signal
import threading
import time

from .io.tuner import TUNER_DRIVERS
from .pipeline import ChainConfig
from .radio import FrontEnd, Radio, Receiver
from .web.handlers import (
    AudioStreamHandler,
    ConfigHandler,
    FileHandler,
    RedirectHandler,
    ReceiverHandler,
    TunerControlHandler,
    TunerHandler,
    WaterfallHandler,
)
from .web.server import RadioHttpServer

log = logging.getLogger(__name__)

#: The reference's shipped topology (main.cxx:71-90), on the synthetic
#: tone tuner so it runs anywhere: 2.4 Msps front end, one AM receiver at
#: IF 0, with block/frequency/ppm defaults as compiled in.
DEFAULT_CONFIG = {
    "server": {"port": 8080, "html": "html"},
    "tuners": [
        {
            "driver": "tone",
            "subdevice": "",
            "centre_frequency": 124_325_000,  # main.cxx:72
            "sample_rate": 2_400_000,  # main.cxx:74
            "block_frames": 102_400,  # main.cxx:75 (204800 samples / 2 ch)
            "agc": True,  # main.cxx:77
            "offset_ppm": 25,  # main.cxx:78
            "capacity": 4,
        }
    ],
    "receivers": [
        {
            "tuner": 0,
            "if_frequency": 0,  # main.cxx:82
            "demodulator": "AM",  # main.cxx:83
            "if_bandwidth": 80_000,  # radio.cxx:79
            "af_bandwidth": 8_000,  # radio.cxx:81
        }
    ],
}


def load_config(path: str | pathlib.Path | None) -> dict:
    if path is None:
        return json.loads(json.dumps(DEFAULT_CONFIG))
    return json.loads(pathlib.Path(path).read_text())


class RadioApp:
    """Owns the Radio topology, HTTP server, and the block-pump thread."""

    def __init__(self, config: dict | None = None):
        self.config = config or load_config(None)
        self.server: RadioHttpServer | None = None
        self._pump: threading.Thread | None = None
        self._stop = threading.Event()
        self.front_ends: list[FrontEnd] = []
        self.receivers: list[Receiver] = []

    # ---- topology ------------------------------------------------------
    def build(self) -> None:
        for tcfg in self.config.get("tuners", []):
            driver = TUNER_DRIVERS[tcfg.get("driver", "rand")]
            tuner = driver(tcfg.get("subdevice", ""))
            tuner.set_centre_frequency(tcfg.get("centre_frequency", 100_000_000))
            tuner.set_agc(tcfg.get("agc", True))
            tuner.set_offset_ppm(tcfg.get("offset_ppm", 0))
            if "rf_gain" in tcfg:
                tuner.set_gain_db(tcfg["rf_gain"])
            chain = ChainConfig(
                sample_rate=tcfg.get("sample_rate", 2_400_000),
                channel_rate=tcfg.get("channel_rate", 240_000),
                audio_rate=tcfg.get("audio_rate", 48_000),
                block_frames=tcfg.get("block_frames", 102_400),
            )
            fe = FrontEnd(tuner, chain, capacity=tcfg.get("capacity", 4))
            self.front_ends.append(fe)
        for rcfg in self.config.get("receivers", []):
            rx = Receiver()
            rx.update(
                if_frequency=rcfg.get("if_frequency", 0),
                if_bandwidth=rcfg.get("if_bandwidth", 80_000),
                af_bandwidth=rcfg.get("af_bandwidth", 8_000),
                demodulator=rcfg.get("demodulator", "AM"),
            )
            rx.set_front_end(self.front_ends[rcfg.get("tuner", 0)])
            self.receivers.append(rx)

    # ---- routes (the 12 registrations of main.cxx:92-106) -------------
    def build_server(self) -> RadioHttpServer:
        scfg = self.config.get("server", {})
        srv = RadioHttpServer(port=scfg.get("port", 8080),
                              host=scfg.get("host", "0.0.0.0"))
        html = scfg.get("html", "html")
        srv.register_handler("", RedirectHandler, "/static/ui.html")
        srv.register_handler("static/**", FileHandler, html)
        srv.register_handler("audio/*", AudioStreamHandler)
        srv.register_handler("config", ConfigHandler)
        srv.register_handler("tuners", TunerHandler)
        srv.register_handler("tuners/*", TunerHandler)
        srv.register_handler("tuners/*/control", TunerControlHandler)
        srv.register_handler("tuners/*/waterfall", WaterfallHandler)
        srv.register_handler(
            "tuners/*/receivers", RedirectHandler, "/receivers?tuner_id=$1"
        )
        srv.register_handler("receivers", ReceiverHandler)
        srv.register_handler("receivers/*", ReceiverHandler)
        srv.register_handler(
            "receivers/*/audio.mp3", RedirectHandler, "/audio/$1.mp3"
        )
        srv.register_handler(
            "receivers/*/audio.wav", RedirectHandler, "/audio/$1.wav"
        )
        self.server = srv
        return srv

    # ---- lifecycle -----------------------------------------------------
    def start(self) -> bool:
        if not self.front_ends:
            self.build()
        if self.server is None:
            self.build_server()
        if not self.server.start():
            return False
        ok = all(fe.start() for fe in self.front_ends)
        if not ok:
            return False
        self._stop.clear()
        self._pump = threading.Thread(
            target=self._pump_loop, daemon=True, name="pipeline"
        )
        self._pump.start()
        return True

    def _pump_loop(self) -> None:
        """The main loop of main.cxx:114-122: pump every front end, log the
        profile every 5 s."""
        last_profile = time.monotonic()
        while not self._stop.is_set():
            any_block = False
            for fe in list(Radio.front_ends.values()):
                if fe.running and fe.run_once(timeout=0.25):
                    any_block = True
            if not any_block:
                time.sleep(0.01)
            now = time.monotonic()
            if now - last_profile >= 5.0:
                Radio.profile()
                last_profile = now

    def stop(self) -> None:
        self._stop.set()
        if self._pump is not None:
            self._pump.join(timeout=5.0)
            self._pump = None
        for fe in self.front_ends:
            fe.stop()
        if self.server is not None:
            self.server.stop()

    def close(self) -> None:
        self.stop()
        Radio.reset()
        self.front_ends.clear()
        self.receivers.clear()


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="webradio-tpu",
        description="TPU-native web-controlled SDR server",
    )
    parser.add_argument("-c", "--config", default=None,
                        help="topology config JSON (default: built-in demo)")
    parser.add_argument("-p", "--port", type=int, default=None)
    parser.add_argument("--driver", default=None,
                        help="override tuner 0 driver (rand|tone|file|rtltcp)")
    parser.add_argument("--subdevice", default=None,
                        help="override tuner 0 subdevice "
                             "(file path / host:port)")
    parser.add_argument("--platform", default=None,
                        help="force a JAX backend (tpu|cpu); must win over "
                             "site-level JAX_PLATFORMS overrides")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s",
    )
    if args.platform:
        import jax

        # config API beats env vars that site hooks may have overridden
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: server restarts skip recompilation
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path.home() / ".cache" / "webradio_tpu_xla"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization, never fatal
        pass
    config = load_config(args.config)
    if args.port is not None:
        config.setdefault("server", {})["port"] = args.port
    if args.driver is not None:
        config["tuners"][0]["driver"] = args.driver
    if args.subdevice is not None:
        config["tuners"][0]["subdevice"] = args.subdevice

    app = RadioApp(config)
    if not app.start():
        return 1

    quit_evt = threading.Event()

    def _sigint(signum, frame):  # main.cxx:48-62
        log.info("Signal %d caught, exiting", signum)
        quit_evt.set()

    signal.signal(signal.SIGINT, _sigint)
    signal.signal(signal.SIGTERM, _sigint)
    log.info("webradio-tpu up on port %d", app.server.port)
    try:
        while not quit_evt.is_set():
            quit_evt.wait(1.0)
    finally:
        app.close()
    return 0
