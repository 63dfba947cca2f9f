"""Import helper for using the reference implementation as a test oracle.

The reference's estimated-bpp paths are pure torch and importable; the
missing `pytorch_msssim` dependency is stubbed (it is only used for loss
computation, never in the eval paths we compare against).
"""

import sys
import types

REF_PATH = "/root/reference"


def import_reference():
    if "pytorch_msssim" not in sys.modules:
        stub = types.ModuleType("pytorch_msssim")

        class MS_SSIM:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise NotImplementedError

        def ms_ssim(*a, **k):
            raise NotImplementedError

        stub.MS_SSIM = MS_SSIM
        stub.ms_ssim = ms_ssim
        sys.modules["pytorch_msssim"] = stub
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
