from .intra_noar import IntraNoAR

model_architectures = {
    "IntraNoAR": IntraNoAR,
}

# Models filled in as they land; imports kept lazy-tolerant during buildout.
try:
    from .intra_ss import IntraSS  # noqa: F401
except ImportError:
    pass
try:
    from .dmc import DMC, DMCExtend  # noqa: F401
except ImportError:
    pass
try:
    from .lssvc import LSSVC, LSSVCExtend  # noqa: F401
except ImportError:
    pass
try:
    from .cheng2020 import Cheng2020Anchor  # noqa: F401

    model_architectures["cheng2020-anchor"] = Cheng2020Anchor
except ImportError:
    pass
