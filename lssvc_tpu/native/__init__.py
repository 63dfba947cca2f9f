"""Native runtime: builds/loads the C++ rANS library via ctypes.

The library is compiled on first import (g++ -O3, cached next to the
source); Python<->C crossings are one call per tensor with contiguous int32
numpy buffers — never per element (the reference's biggest hot-path sin,
SURVEY.md §3.4).
"""

from .rans import (
    BufferedRansEncoder,
    RansEncoder,
    RansDecoder,
    pmf_to_quantized_cdf,
)
