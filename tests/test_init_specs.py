"""Init-spec completeness: from-scratch params must match the converted
reference state_dicts key-for-key and shape-for-shape."""

import numpy as np
import pytest
import torch

from lssvc_tpu.convert import convert_state_dict
from lssvc_tpu.models.dmc import DMC
from lssvc_tpu.models.lssvc import LSSVC
from lssvc_tpu.models.init import (
    init_dmc, init_intra_noar, init_intra_ss, init_lssvc,
)
from ref_oracle import import_reference


_CONSTANT_BUFFER_SUFFIXES = (
    # fixed constants the reference registers as buffers; baked into our
    # implementations (ops.nn GDN bounds, entropy likelihood bound)
    ".pedestal", ".lower_bound.bound", "likelihood_lower_bound.bound",
    ".scale_bound",
)


def _compare(ours: dict, ref: dict, skip_prefixes=()):
    ref = {k: v for k, v in ref.items()
           if not any(k.startswith(s) for s in skip_prefixes)
           and not k.endswith(_CONSTANT_BUFFER_SUFFIXES)}
    missing = sorted(set(ref) - set(ours))
    extra = sorted(set(ours) - set(ref))
    assert not missing, f"missing {len(missing)}: {missing[:10]}"
    assert not extra, f"extra {len(extra)}: {extra[:10]}"
    bad = [(k, ours[k].shape, ref[k].shape) for k in ref
           if tuple(ours[k].shape) != tuple(ref[k].shape)]
    assert not bad, f"shape mismatches: {bad[:10]}"


def test_dmc_init_spec():
    import_reference()
    from src.models.dmc_net import DMC as RefDMC

    torch.manual_seed(0)
    sd = {k: v for k, v in RefDMC().state_dict().items()
          if not k.startswith("ms_ssim_loss")}
    ref = convert_state_dict(sd, DMC.TRANSPOSED_CONV_KEYS)
    _compare(init_dmc(), ref)


def test_lssvc_init_spec():
    import_reference()
    from src.models.LSSVC_net import LSSVC as RefLSSVC

    torch.manual_seed(0)
    sd = {k: v for k, v in RefLSSVC().state_dict().items()
          if "ms_ssim_loss" not in k}
    ref = convert_state_dict(sd, LSSVC.TRANSPOSED_CONV_KEYS)
    _compare(init_lssvc(), ref)


def test_intra_noar_init_spec():
    import_reference()
    from src.models.priors import IntraNoAR as RefIntraNoAR

    torch.manual_seed(0)
    sd = RefIntraNoAR(N=192).state_dict()
    ref = convert_state_dict(sd)
    # CDF buffers and scale-table are runtime state, not init params
    skip = ("entropy_bottleneck._offset", "entropy_bottleneck._quantized_cdf",
            "entropy_bottleneck._cdf_length", "entropy_bottleneck.target",
            "gaussian_conditional.")
    _compare(init_intra_noar(192), ref, skip_prefixes=skip)


def test_intra_ss_init_spec():
    import_reference()
    from src.models.IntraSS import IntraSS as RefIntraSS

    torch.manual_seed(0)
    sd = RefIntraSS(channel_BL=192).state_dict()
    ref = convert_state_dict(sd)
    skip = tuple(
        p + s
        for p in ("", "base_layer_model.")
        for s in ("entropy_bottleneck._offset",
                  "entropy_bottleneck._quantized_cdf",
                  "entropy_bottleneck._cdf_length",
                  "entropy_bottleneck.target",
                  "gaussian_conditional."))
    _compare(init_intra_ss(192), ref, skip_prefixes=skip)
