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

    def load_dict(self, state_dict: dict):
        """Reference-compatible alias (`LSSVC_net.py:141-149`)."""
        state_dict = strip_module_prefix(state_dict)
        self.params = convert_state_dict(state_dict, self.TRANSPOSED_CONV_KEYS)
