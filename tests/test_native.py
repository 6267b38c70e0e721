"""Native ingest runtime: conversion semantics + ring behavior.

The C++ library auto-builds via make (g++ is in the image); tests skip if
the toolchain is genuinely unavailable.
"""

import numpy as np
import pytest

from webradio_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_u8_conversion_matches_reference_formula():
    raw = np.arange(256, dtype=np.uint8).repeat(2)[:512]
    planes = native.convert_u8_iq(raw)
    # (x - 128) / 128 per rtlsdrtuner.cxx:92-95
    np.testing.assert_array_equal(
        planes[0], (raw[0::2].astype(np.float32) - 128) / 128
    )
    np.testing.assert_array_equal(
        planes[1], (raw[1::2].astype(np.float32) - 128) / 128
    )


def test_complex_deinterleave():
    z = (np.random.default_rng(0).standard_normal(128)
         + 1j * np.random.default_rng(1).standard_normal(128)).astype(np.complex64)
    p = native.convert_planes(z)
    np.testing.assert_array_equal(p[0], z.real)
    np.testing.assert_array_equal(p[1], z.imag)


def test_ring_fifo_and_drop_oldest():
    r = native.NativeRing(32, depth=2)
    blocks = [np.full((2, 32), i, np.float32) for i in range(3)]
    for b in blocks:
        r.push(b)
    assert r.dropped_blocks == 1  # block 0 dropped (depth 2)
    assert r.total_blocks == 3
    np.testing.assert_array_equal(r.pop(0.1), blocks[1])
    np.testing.assert_array_equal(r.pop(0.1), blocks[2])
    assert r.pop(0.02) is None  # timeout on empty


def test_ring_close_unblocks():
    r = native.NativeRing(8)
    r.close()
    assert r.pop(1.0) is None


class _FakeRtlTcpServer:
    """Minimal rtl_tcp server: RTL0 header, streams a u8 ramp, records
    commands."""

    def __init__(self):
        import socket
        import threading

        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.commands = []
        self._stop = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        import struct

        conn, _ = self.sock.accept()
        conn.sendall(b"RTL0" + bytes(8))
        conn.settimeout(0.05)
        data = bytes(range(256)) * 64  # 16384 bytes = 8192 frames
        while not self._stop:
            try:
                try:
                    cmd = conn.recv(5)
                    while len(cmd) >= 5:
                        self.commands.append(struct.unpack(">BI", cmd[:5]))
                        cmd = cmd[5:]
                except TimeoutError:
                    pass
                conn.sendall(data)
            except OSError:
                break
        conn.close()

    def close(self):
        self._stop = True
        self.sock.close()


def test_rtltcp_native_session_end_to_end():
    from webradio_tpu.io.tuner import RtlTcpTuner

    srv = _FakeRtlTcpServer()
    try:
        tuner = RtlTcpTuner(f"127.0.0.1:{srv.port}")
        tuner.set_sample_rate(1_024_000)
        tuner.set_block_frames(4096)
        tuner.set_centre_frequency(100_000_000)
        assert tuner.start()
        assert tuner._native is not None, "native path should be used"
        block = tuner.read_block()
        assert block is not None and block.shape == (2, 4096)
        # u8 ramp -> (x-128)/128 in [-1, 1)
        assert block.min() >= -1.0 and block.max() < 1.0
        # stream content is the interleaved ramp
        raw = (np.frombuffer(bytes(range(256)) * 32, dtype=np.uint8)
               .astype(np.float32) - 128) / 128
        np.testing.assert_array_equal(block[0], raw[0::2])
        np.testing.assert_array_equal(block[1], raw[1::2])
        tuner.set_centre_frequency(101_000_000)  # live command
        import time
        time.sleep(0.2)
        ops = [op for op, _ in srv.commands]
        assert 0x01 in ops and 0x02 in ops  # freq + rate pushed
        assert (0x01, 101_000_000) in srv.commands
        tuner.stop()
    finally:
        srv.close()


class TestSoundcard:
    def test_pulse_gated(self):
        from webradio_tpu.io import soundcard

        # image has no sound stack: the driver must gate, not crash
        if not soundcard.pulse_available():
            with pytest.raises(RuntimeError):
                soundcard.PulseAudioSink()

    def test_file_sink_wav_roundtrip(self, tmp_path):
        from webradio_tpu.io.soundcard import FileAudioSink

        p = tmp_path / "out.wav"
        sink = FileAudioSink(p, sample_rate=8_000)
        t = np.arange(8_000) / 8_000
        sink.write(np.sin(2 * np.pi * 440 * t).astype(np.float32))
        sink.close()
        raw = p.read_bytes()
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        pcm = np.frombuffer(raw[44:], "<i2").astype(np.float32) / 32767
        assert len(pcm) == 8_000
        f = np.fft.rfftfreq(len(pcm), 1 / 8_000)
        peak = f[np.abs(np.fft.rfft(pcm)).argmax()]
        assert abs(peak - 440) < 2
