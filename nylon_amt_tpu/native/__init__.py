"""Native (C++) runtime components, loaded via ctypes.

Currently: the peak-picking note decoder (``native/decoder.cpp``). The
library is built on demand with the system g++ and cached; every consumer
falls back to the pure-Python implementation when the toolchain or binary
is unavailable, so the native layer is an accelerator, never a requirement.
Set ``NYLON_NATIVE=0`` to force the Python paths.
"""

from nylon_amt_tpu.native.build import load_decoder_library

__all__ = ["load_decoder_library"]
