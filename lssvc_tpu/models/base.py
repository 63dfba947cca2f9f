"""Model base: parameter containers + torch-checkpoint loading.

Models are thin stateful wrappers (params + cached jitted functions) around
pure forward functions; all state that the reference keeps on nn.Module
attributes (scale info, pad sizes, CDF tables) lives here explicitly.
"""

from __future__ import annotations

import jax

from ..convert import P, convert_state_dict, strip_module_prefix


class Model:
    #: torch parameter names that are ConvTranspose2d weights (layout differs)
    TRANSPOSED_CONV_KEYS: frozenset = frozenset()

    def __init__(self, params: dict):
        self.params = params

    @classmethod
    def from_torch_state_dict(cls, state_dict: dict, **kwargs):
        state_dict = strip_module_prefix(state_dict)
        params = convert_state_dict(state_dict, cls.TRANSPOSED_CONV_KEYS)
        return cls(params=params, **kwargs)

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs):
        from ..convert import load_torch_checkpoint

        return cls.from_torch_state_dict(load_torch_checkpoint(path), **kwargs)

    def scope(self) -> P:
        return P(self.params)

    def _invalidate_derived(self):
        """Drop caches derived from self.params — the lazily-built
        base-layer submodel and the update()-time rANS coder tables.
        Without this, load_dict/load_partial silently keep a previous
        checkpoint's BL weights and CDF tables in the stream paths."""
        for attr in ("_bl", "_coder"):
            if getattr(self, attr, None) is not None:
                setattr(self, attr, None)

    def load_dict(self, state_dict: dict):
        """Reference-compatible alias (`LSSVC_net.py:141-149`)."""
        state_dict = strip_module_prefix(state_dict)
        self.params = convert_state_dict(state_dict, self.TRANSPOSED_CONV_KEYS)
        self._invalidate_derived()

    def load_partial(self, state_dict: dict, src_prefix: str = "",
                     dst_prefix: str = ""):
        """Checkpoint surgery: graft a sub-network's weights from another
        checkpoint (the reference's pretrain loaders, `dmc_net.py:312-350`,
        `IntraSS.py:216-220`).  Keys starting with `src_prefix` are loaded
        into `dst_prefix` of this model."""
        state_dict = strip_module_prefix(state_dict)
        sub = {dst_prefix + k[len(src_prefix):]: v
               for k, v in state_dict.items() if k.startswith(src_prefix)}
        transposed = {k for k in self.TRANSPOSED_CONV_KEYS
                      if k in sub}
        converted = convert_state_dict(sub, frozenset(transposed))
        if not sub:
            raise KeyError(
                f"load_partial: src_prefix {src_prefix!r} matched no "
                f"checkpoint keys (e.g. available: "
                f"{sorted(state_dict)[:3]}) — a silent no-op here would "
                "surface only as inexplicably bad RD")
        unknown = set(converted) - set(self.params)
        if unknown:
            raise KeyError(f"load_partial: {len(unknown)} unknown keys, "
                           f"e.g. {sorted(unknown)[:5]}")
        self.params = {**self.params, **converted}
        self._invalidate_derived()

    def param_label_fn(self, inter_module_names=None):
        """Partition labeler for selective freezing (the reference's
        `control_is_prediction_parameter`, `dmc_net.py:283-290`)."""
        return label_params(self.params, inter_module_names
                            or INTER_PREDICTION_MODULES)


# The motion-prediction submodules of the reference's selective-freeze
# stages (`dmc_net.py:283-290`) — the ONE place this list lives; train.py
# and param_label_fn both use it.
INTER_PREDICTION_MODULES = ("mv_encoder", "mv_decoder", "mv_prior_encoder",
                            "mv_prior_decoder", "bit_estimator_z_mv",
                            "optic_flow")


def label_params(params, inter_module_names=INTER_PREDICTION_MODULES):
    """'prediction' / 'other' label per param name by substring match."""
    return {k: ("prediction"
                if any(m in k for m in inter_module_names) else "other")
            for k in params}
