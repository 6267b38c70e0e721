"""The block-program: one jitted step per front-end.

Instead of the reference's push-based graph of virtual-dispatch blocks
(src/dsp/dspblock.cxx:206-209), the whole signal chain — spectrum FFTs plus
every receiver's mix/filter/demod/resample — is a single pure function

    step(params, state, iq_block) -> (state, audio, spectra)

jit-compiled once per static configuration, with receivers batched on a
leading channel axis and all cross-block state in an explicit pytree
(SURVEY §7 design stance #1-#4).
"""

from .state import (
    ChainConfig,
    ReceiverParams,
    ReceiverState,
    FrontEndParams,
    FrontEndState,
    init_state,
    make_receiver_params,
)
from .frontend import FrontEndPipeline, frontend_step
from .stream import run_capture

__all__ = [
    "ChainConfig",
    "ReceiverParams",
    "ReceiverState",
    "FrontEndParams",
    "FrontEndState",
    "init_state",
    "make_receiver_params",
    "FrontEndPipeline",
    "frontend_step",
    "run_capture",
]
