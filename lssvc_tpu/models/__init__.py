from .cheng2020 import Cheng2020Anchor
from .dmc import DMC, DMCExtend
from .intra_noar import IntraNoAR
from .intra_ss import IntraSS
from .lssvc import LSSVC, LSSVCExtend

model_architectures = {
    "IntraNoAR": IntraNoAR,
    "cheng2020-anchor": Cheng2020Anchor,
}
