"""Host-side I/O: sample sources, tuner drivers, ingest ring.

The device compute path never blocks on hardware: a capture thread fills a
bounded ring of fixed-size blocks (drop-with-log on overrun — the reference's
backpressure policy, rtlsdrtuner.cxx:99-102) and the pipeline thread pops
blocks and feeds the jitted step.
"""

from .source import SampleSource, RandSource, FileSource, ToneSource
from .tuner import Tuner, FileTuner, RandTuner, ToneTuner, RtlTcpTuner, TUNER_DRIVERS
from .ring import BlockRing, CaptureThread

__all__ = [
    "SampleSource",
    "RandSource",
    "FileSource",
    "ToneSource",
    "Tuner",
    "FileTuner",
    "RandTuner",
    "ToneTuner",
    "RtlTcpTuner",
    "TUNER_DRIVERS",
    "BlockRing",
    "CaptureThread",
]
