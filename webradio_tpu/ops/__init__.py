"""Pure-functional DSP operator library (JAX, TPU-first).

Every op is a pure function over arrays with explicit state, designed to be
``jit``/``vmap``/``shard_map`` composed. Time is the trailing axis; channel
batches lead. All signal arithmetic is float32/complex64, matching the
reference's ``typedef float sample_t`` (src/dsp/dspblock.h:45).

Block-based equivalents of the reference's sample-at-a-time loops:

===================  =====================================================
``firdesign``        brick-wall/IDFT/Hamming FIR design (lowpass.cxx:164)
``fir``              decimating FIR: strided-conv + overlap-save variants
``nco``              quantized-phase NCO complex mixer (downconverter.cxx)
``demod``            AM/FM/USB/LSB demodulation laws (demodulator.cxx)
``spectrum``         windowed FFT spectrum + dB/fftshift (spectrumsink.cxx)
``channelizer``      polyphase FFT channelizer (many-channel path)
===================  =====================================================
"""

from .window import hamming
from .firdesign import design_lowpass_fir
from .fir import fir_decimate, fir_decimate_streaming, overlap_save_decimate
from .nco import nco_phase_step, nco_mix, nco_advance
from .demod import MODES, MODE_AM, MODE_FM, MODE_USB, MODE_LSB, demodulate
from .spectrum import spectrum_accumulate, spectrum_db

__all__ = [
    "hamming",
    "design_lowpass_fir",
    "fir_decimate",
    "fir_decimate_streaming",
    "overlap_save_decimate",
    "nco_phase_step",
    "nco_mix",
    "nco_advance",
    "MODES",
    "MODE_AM",
    "MODE_FM",
    "MODE_USB",
    "MODE_LSB",
    "demodulate",
    "spectrum_accumulate",
    "spectrum_db",
]
