"""Tuner drivers: hardware control over a SampleSource.

Mirrors the reference contract (src/io/tuner.h:49-63): centre frequency,
PPM offset, AGC, RF gain, identity strings; defaults 100 MHz / 1.2 Msps /
AGC on (tuner.h:33,43-46). Drivers register in :data:`TUNER_DRIVERS` — the
``TunerFactory`` seam (tuner.h:77) that lets front-ends instantiate drivers
generically and lets every API test run hardware-free (SURVEY §4).

Included drivers:

* :class:`FileTuner` / :class:`RandTuner` / :class:`ToneTuner` — capture
  replay and synthetic sources.
* :class:`RtlTcpTuner` — a network client for the standard ``rtl_tcp``
  protocol, giving real RTL2832U hardware support with zero native
  dependencies (the reference links librtlsdr directly,
  src/io/rtlsdrtuner.cxx; rtl_tcp exposes the same commands over TCP).
"""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np

from .source import FileSource, RandSource, SampleSource, ToneSource


class Tuner:
    """Control-plane wrapper over a SampleSource (tuner.h semantics)."""

    driver = "tuner"

    def __init__(self, source: SampleSource, name: str = "Tuner"):
        self.source = source
        self._name = name
        self._centre_frequency = 100_000_000  # tuner.h:33 DEFAULT_CENTRE_FREQUENCY
        self._offset_ppm = 0
        self._agc = True  # tuner.h:46
        self._gain_db = 0
        self.serial = ""
        self.manufacturer = ""
        self.product = ""

    # ---- identity -------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def type(self) -> str:
        return self.driver

    # ---- stream parameters ---------------------------------------
    @property
    def sample_rate(self) -> int:
        return self.source.sample_rate

    def set_sample_rate(self, hz: int) -> None:
        self.source.sample_rate = int(hz)

    @property
    def block_frames(self) -> int:
        return self.source.block_frames

    def set_block_frames(self, n: int) -> None:
        self.source.block_frames = int(n)

    # ---- control (live-settable; applied to next block) -----------
    @property
    def centre_frequency(self) -> int:
        return self._centre_frequency

    def set_centre_frequency(self, hz: int) -> None:
        self._centre_frequency = int(hz)

    @property
    def offset_ppm(self) -> int:
        return self._offset_ppm

    def set_offset_ppm(self, ppm: int) -> None:
        self._offset_ppm = int(ppm)

    @property
    def agc(self) -> bool:
        return self._agc

    def set_agc(self, on: bool) -> None:
        self._agc = bool(on)

    @property
    def gain_db(self) -> int:
        return self._gain_db

    def set_gain_db(self, db: int) -> None:
        self._gain_db = int(db)

    # ---- lifecycle -------------------------------------------------
    def start(self) -> bool:
        return self.source.start()

    def stop(self) -> None:
        self.source.stop()

    def read_block(self):
        return self.source.read_block()


class RandTuner(Tuner):
    """White-noise tuner (the reference's RandSource seam made a driver)."""

    driver = "rand"

    def __init__(self, subdevice: str = ""):
        super().__init__(RandSource(), name="Random noise source")
        self.product = "RandSource"


class ToneTuner(Tuner):
    """Synthetic-carrier tuner for demos/tests."""

    driver = "tone"

    def __init__(self, subdevice: str = ""):
        super().__init__(ToneSource(), name="Synthetic carrier source")
        self.product = "ToneSource"


class FileTuner(Tuner):
    """Capture-replay tuner: subdevice = capture path."""

    driver = "file"

    def __init__(self, subdevice: str):
        super().__init__(FileSource(subdevice), name="IQ capture replay")
        self.product = "FileSource"
        self.serial = subdevice


class _RtlTcpSource(SampleSource):
    """Reader half of the rtl_tcp stream: u8 interleaved IQ -> complex64.

    The conversion matches the reference driver: ``(x - 128) / 128``
    (rtlsdrtuner.cxx:92-95).
    """

    def __init__(self, sock: socket.socket):
        super().__init__()
        self._sock = sock
        self._lock = threading.Lock()

    def read_block(self) -> np.ndarray | None:
        need = self.block_frames * 2
        buf = bytearray(need)
        view = memoryview(buf)
        got = 0
        with self._lock:
            while got < need:
                n = self._sock.recv_into(view[got:], need - got)
                if n == 0:
                    return None
                got += n
        raw = np.frombuffer(buf, dtype=np.uint8).astype(np.float32)
        f = (raw - 128.0) / 128.0
        return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


class _NativeRtlTcpSource(SampleSource):
    """Native-backed rtl_tcp source: the socket reader and the u8 -> float
    plane conversion run in a C++ thread (native/src/ingest.cpp), so blocks
    arrive GIL-free as ready-to-ship ``[2, N]`` float32 planes."""

    def __init__(self, session):
        super().__init__()
        self._session = session

    def read_block(self):
        return self._session.pop(timeout=5.0)


class RtlTcpTuner(Tuner):
    """RTL-SDR over the rtl_tcp wire protocol (host[:port] subdevice).

    Commands are the standard single-byte opcodes + u32 big-endian argument:
    0x01 set frequency, 0x02 set sample rate, 0x03 tuner gain mode,
    0x04 tuner gain (tenths of dB), 0x05 ppm, 0x08 RTL AGC.

    When the native ingest library is built, capture runs through
    :class:`webradio_tpu.io.native.NativeRtlTcp` (C++ reader thread);
    otherwise a pure-Python socket reader with identical semantics.
    """

    driver = "rtltcp"

    CMD_FREQ = 0x01
    CMD_RATE = 0x02
    CMD_GAIN_MODE = 0x03
    CMD_GAIN = 0x04
    CMD_PPM = 0x05
    CMD_AGC = 0x08

    def __init__(self, subdevice: str = "127.0.0.1:1234"):
        host, _, port = subdevice.partition(":")
        self._addr = (host or "127.0.0.1", int(port or 1234))
        self._sock: socket.socket | None = None
        self._native = None
        super().__init__(RandSource(), name="RTL-SDR (rtl_tcp)")
        self.product = "rtl_tcp"
        self.serial = subdevice

    def _cmd(self, op: int, arg: int) -> None:
        if self._native is not None:
            self._native.command(op, arg)
        elif self._sock is not None:
            self._sock.sendall(struct.pack(">BI", op, arg & 0xFFFFFFFF))

    def _push_settings(self) -> None:
        """Push cached control state on connect, as the reference does on
        init (rtlsdrtuner.cxx:226-235)."""
        self._cmd(self.CMD_RATE, self.source.sample_rate)
        self._cmd(self.CMD_FREQ, self._centre_frequency)
        self._cmd(self.CMD_PPM, self._offset_ppm)
        self._cmd(self.CMD_AGC, 1 if self._agc else 0)
        self._cmd(self.CMD_GAIN_MODE, 0 if self._agc else 1)
        if not self._agc:
            self._cmd(self.CMD_GAIN, self._gain_db * 10)

    def start(self) -> bool:
        from . import native as native_mod

        if native_mod.available():
            old = self.source
            try:
                session = native_mod.NativeRtlTcp(
                    self._addr[0], self._addr[1], old.block_frames
                )
            except (ConnectionError, OSError, RuntimeError):
                return False
            self._native = session
            self.source = _NativeRtlTcpSource(session)
            self.source.sample_rate = old.sample_rate
            self.source.block_frames = old.block_frames
            self._push_settings()
            return self.source.start()
        try:
            self._sock = socket.create_connection(self._addr, timeout=5.0)
        except OSError:
            return False
        self._sock.settimeout(10.0)
        hdr = self._sock.recv(12)  # "RTL0" + tuner type + gain count
        if not hdr.startswith(b"RTL0"):
            self._sock.close()
            self._sock = None
            return False
        old = self.source
        self.source = _RtlTcpSource(self._sock)
        self.source.sample_rate = old.sample_rate
        self.source.block_frames = old.block_frames
        self._push_settings()
        return self.source.start()

    def stop(self) -> None:
        super().stop()
        if self._native is not None:
            self._native.close()
            self._native = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def set_centre_frequency(self, hz: int) -> None:
        super().set_centre_frequency(hz)
        self._cmd(self.CMD_FREQ, hz)

    def set_offset_ppm(self, ppm: int) -> None:
        super().set_offset_ppm(ppm)
        self._cmd(self.CMD_PPM, ppm)

    def set_agc(self, on: bool) -> None:
        super().set_agc(on)
        self._cmd(self.CMD_AGC, 1 if on else 0)
        self._cmd(self.CMD_GAIN_MODE, 0 if on else 1)

    def set_gain_db(self, db: int) -> None:
        super().set_gain_db(db)
        self._cmd(self.CMD_GAIN, db * 10)


TUNER_DRIVERS = {
    "rand": RandTuner,
    "tone": ToneTuner,
    "file": FileTuner,
    "rtltcp": RtlTcpTuner,
}
