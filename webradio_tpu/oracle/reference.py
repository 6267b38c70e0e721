"""NumPy golden models of the reference DSP loops (test oracle only).

Each function is a behavioural transliteration of one C++ inner loop from the
reference tree, cited by file:line. Scalar quirks are reproduced deliberately:

* FIR design uses C++ *unsigned integer division*, evaluated left-to-right,
  for the cutoff bin (``src/dsp/lowpass.cxx:167``) — with the stock defaults
  (64 taps, 80 kHz passband @ 2.4 Msps; 8 kHz @ 240 ksps) this yields
  ``maxbin == 1`` so the "brick wall" passes only the DC bin and the designed
  FIR degenerates to a normalized Hamming window.
* The NCO is a 31-bit phase accumulator indexing a 2^16-entry sine table
  (``src/dsp/downconverter.cxx:35-52,97-111``); the mixer multiplies by the
  LO's complex conjugate.
* FM demod multiplies by the conjugate of the previous sample and evaluates
  ``atan2(ii, qq)`` — the reference's swapped-argument convention
  (``src/dsp/demodulator.cxx:92-97``), i.e. pi/2 minus the phase delta.
* USB/LSB are the naive ``i±q`` forms (``src/dsp/demodulator.cxx:99-104``).
* The spectrum sink windows (Hamming) and FFTs every 512-frame fill, keeping
  only the latest frame; dB conversion subtracts ``20*log10(N)``
  (``src/io/spectrumsink.cxx:88-142``).

All arithmetic is float32, matching ``typedef float sample_t``
(``src/dsp/dspblock.h:45``).
"""

from __future__ import annotations

import numpy as np

FIR_LENGTH = 64  # src/dsp/lowpass.cxx:39
PHASE_BITS = 31  # src/dsp/downconverter.cxx:35
LOOKUP_BITS = 16  # src/dsp/downconverter.cxx:36
PHASE_MASK = (1 << PHASE_BITS) - 1
LOOKUP_MASK = (1 << LOOKUP_BITS) - 1
LOOKUP_SHIFT = PHASE_BITS - LOOKUP_BITS


def hamming_window(n: int) -> np.ndarray:
    """Hamming window as computed at src/dsp/lowpass.cxx:108 (float32)."""
    k = np.arange(n, dtype=np.float32)
    return (0.54 - 0.46 * np.cos(2 * np.pi * k / np.float32(n - 1))).astype(
        np.float32
    )


def design_lowpass_fir(
    passband_hz: int, input_rate_hz: int, fir_length: int = FIR_LENGTH
) -> np.ndarray:
    """FIR design per src/dsp/lowpass.cxx:164-197 (``recalculate``).

    Brick-wall spectrum with conjugate-symmetric mirroring, inverse DFT,
    fftshift reorder, then a Hamming window carrying the 1/N IDFT scale
    (src/dsp/lowpass.cxx:104-110). ``maxbin`` uses C++ unsigned integer
    division evaluated left-to-right.
    """
    n = fir_length
    maxbin = (n * int(passband_hz)) // int(input_rate_hz) // 2
    spec = np.zeros(n, dtype=np.complex64)
    mask = n - 1
    for k in range(n // 2 + 1):
        v = 1.0 if k < maxbin else 0.0
        spec[k] = v
        spec[(n - k) & mask] = v
    # FFTW_BACKWARD with no normalization == numpy ifft * n
    impulse = (np.fft.ifft(spec) * n).astype(np.complex64)
    window = hamming_window(n) / np.float32(n)
    coeff = np.empty(n, dtype=np.float32)
    for k in range(n):
        bin_ = (k + n // 2) & (n - 1)
        coeff[k] = np.float32(impulse[bin_].real) * window[k]
    return coeff


def lowpass_process(
    coeff: np.ndarray,
    history: np.ndarray,
    x: np.ndarray,
    decimation: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Decimating FIR per src/dsp/lowpass.cxx:131-162.

    ``x`` is ``[frames, channels]`` float32; ``history`` is the retained
    ``fir_length - 1`` previous frames (zeros initially). Output frame n,
    channel c is ``sum_k coeff[K-1-k] * block[n*D + k, c]`` where ``block``
    is history followed by input. Returns (output, new_history).
    """
    x = np.asarray(x, dtype=np.float32)
    k_len = len(coeff)
    block = np.concatenate([history, x], axis=0)
    n_out = x.shape[0] // decimation
    rev = coeff[::-1].astype(np.float32)
    out = np.zeros((n_out, x.shape[1]), dtype=np.float32)
    for n in range(n_out):
        seg = block[n * decimation : n * decimation + k_len]
        # float32 accumulation in C++ order
        acc = np.zeros(x.shape[1], dtype=np.float32)
        for k in range(k_len):
            acc += rev[k] * seg[k]
        out[n] = acc
    new_history = block[block.shape[0] - (k_len - 1) :].copy()
    return out, new_history


def make_sin_table() -> np.ndarray:
    """2^16-entry sine lookup per src/dsp/downconverter.cxx:48-52."""
    n = np.arange(1 << LOOKUP_BITS, dtype=np.float32)
    return np.sin(n * np.float32(2 * np.pi) / np.float32(1 << LOOKUP_BITS)).astype(
        np.float32
    )


_SIN_TABLE = None


def downconvert_process(
    iq: np.ndarray, phase: int, if_hz: int, fs_hz: int
) -> tuple[np.ndarray, int]:
    """NCO mix per src/dsp/downconverter.cxx:91-114.

    ``iq`` is ``[frames, 2]`` float32. Returns (mixed, new_phase). The phase
    step is ``int(if_hz * 2^31 / fs)`` with C-style truncation
    (src/dsp/downconverter.cxx:80); the mixer multiplies by the conjugate of
    the LO: I' = i*cos + q*sin, Q' = q*cos - i*sin.
    """
    global _SIN_TABLE
    if _SIN_TABLE is None:
        _SIN_TABLE = make_sin_table()
    table = _SIN_TABLE
    # C++ int64 division truncates toward zero (src/dsp/downconverter.cxx:80)
    if if_hz >= 0:
        step = (if_hz * (1 << PHASE_BITS)) // fs_hz
    else:
        step = -((-if_hz * (1 << PHASE_BITS)) // fs_hz)
    out = np.empty_like(iq, dtype=np.float32)
    p = phase & PHASE_MASK
    for n in range(iq.shape[0]):
        sinidx = p >> LOOKUP_SHIFT
        cosidx = (sinidx + (1 << LOOKUP_BITS) // 4) & LOOKUP_MASK
        p = (p + step) & PHASE_MASK
        i, q = np.float32(iq[n, 0]), np.float32(iq[n, 1])
        c, s = table[cosidx], table[sinidx]
        out[n, 0] = i * c + q * s
        out[n, 1] = q * c - i * s
    return out, p


def demodulate_process(
    iq: np.ndarray, mode: str, prev_i: float, prev_q: float
) -> tuple[np.ndarray, float, float]:
    """Demodulation per src/dsp/demodulator.cxx:77-115.

    Modes: AM (envelope), FM (conjugate product + atan2(ii, qq)/2pi with the
    reference's swapped argument order), USB (i+q), LSB (i-q). The previous
    sample carries across blocks and is *not* reset on init
    (src/dsp/demodulator.cxx:60-70).
    """
    out = np.empty(iq.shape[0], dtype=np.float32)
    pi, pq = np.float32(prev_i), np.float32(prev_q)
    for n in range(iq.shape[0]):
        i, q = np.float32(iq[n, 0]), np.float32(iq[n, 1])
        if mode == "AM":
            out[n] = np.sqrt(i * i + q * q)
        elif mode == "FM":
            ii = i * pi + q * pq
            qq = q * pi - i * pq
            out[n] = np.arctan2(ii, qq, dtype=np.float32) / np.float32(np.pi) / 2
        elif mode == "USB":
            out[n] = i + q
        elif mode == "LSB":
            out[n] = i - q
        else:
            raise ValueError(mode)
        pi, pq = i, q
    return out, float(pi), float(pq)


def spectrum_process(
    iq: np.ndarray,
    fill: np.ndarray,
    offset: int,
    latest: np.ndarray | None,
    fft_size: int = 512,
) -> tuple[np.ndarray, int, np.ndarray | None]:
    """Spectrum accumulation per src/io/spectrumsink.cxx:88-123.

    Frames accumulate into a ``fft_size``-frame buffer across block
    boundaries; each time it fills, a Hamming window is applied and a forward
    complex FFT executes; only the latest raw FFT output survives. Returns
    (fill, offset, latest_fft).
    """
    win = hamming_window(fft_size)
    pos = 0
    n = iq.shape[0]
    fill = fill.copy()
    while pos < n:
        take = min(fft_size - offset, n - pos)
        fill[offset : offset + take] = iq[pos : pos + take]
        offset += take
        pos += take
        if offset == fft_size:
            z = (fill[:, 0] + 1j * fill[:, 1]).astype(np.complex64) * win
            latest = np.fft.fft(z).astype(np.complex64)
            offset = 0
    return fill, offset, latest


def spectrum_get(latest: np.ndarray, fft_size: int = 512) -> np.ndarray:
    """dB conversion + fftshift per src/io/spectrumsink.cxx:125-142."""
    scaledb = np.float32(20.0) * np.log10(np.float32(fft_size))
    power = (latest.real.astype(np.float32) ** 2
             + latest.imag.astype(np.float32) ** 2)
    with np.errstate(divide="ignore"):
        db = np.float32(10.0) * np.log10(power) - scaledb
    out = np.empty(fft_size, dtype=np.float32)
    half = fft_size // 2
    idx = np.arange(fft_size)
    out[np.where(idx < half, idx + half, idx - half)] = db
    return out


class OracleReceiver:
    """Full single-receiver chain golden model.

    Mirrors the chain built at src/radio.cxx:68-82: DownConverter ->
    channel LowPass (decimate to 240 ksps default) -> Demodulator ->
    audio LowPass (decimate to 48 ksps default), with per-block state carried
    exactly as the C++ blocks carry it.
    """

    def __init__(
        self,
        fs_hz: int,
        if_hz: int = 0,
        mode: str = "AM",
        channel_rate_hz: int = 240000,
        audio_rate_hz: int = 48000,
        channel_passband_hz: int = 80000,
        audio_passband_hz: int = 8000,
    ):
        if fs_hz % channel_rate_hz or channel_rate_hz % audio_rate_hz:
            raise ValueError("rates must be integer related (dspblock.cxx:126)")
        self.fs = fs_hz
        self.if_hz = if_hz
        self.mode = mode
        self.dec1 = fs_hz // channel_rate_hz
        self.dec2 = channel_rate_hz // audio_rate_hz
        self.coeff1 = design_lowpass_fir(channel_passband_hz, fs_hz)
        self.coeff2 = design_lowpass_fir(audio_passband_hz, channel_rate_hz)
        self.phase = 0
        self.hist1 = np.zeros((FIR_LENGTH - 1, 2), dtype=np.float32)
        self.hist2 = np.zeros((FIR_LENGTH - 1, 1), dtype=np.float32)
        self.prev_i = 0.0
        self.prev_q = 0.0

    def process(self, iq: np.ndarray) -> np.ndarray:
        mixed, self.phase = downconvert_process(iq, self.phase, self.if_hz, self.fs)
        filt, self.hist1 = lowpass_process(self.coeff1, self.hist1, mixed, self.dec1)
        demod, self.prev_i, self.prev_q = demodulate_process(
            filt, self.mode, self.prev_i, self.prev_q
        )
        audio, self.hist2 = lowpass_process(
            self.coeff2, self.hist2, demod[:, None], self.dec2
        )
        return audio[:, 0]
