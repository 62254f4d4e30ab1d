"""Shared NNX module base with a torch-like train/eval mode flag.

Every quantizer exposes a static `training` attribute (static => train and
eval trace to different, appropriately specialized XLA programs, which is
what you want on TPU: the eval graph has no EMA collectives at all).

The flag is *backed by* flax NNX's standard `deterministic` attribute so
that mode switches propagate through plain `nnx.Module` parents: a user
calling `.eval()` on their own model (which is not a ModeModule) triggers
`nnx.Module.eval()` -> `set_attributes(deterministic=True, ...)`, which
reaches every nested quantizer. With a bespoke flag name, quantizers nested
inside user models would silently stay in training mode (EMA updates firing
during eval) — the reference relies on torch's universal `module.training`
for this (e.g. /root/reference/vector_quantize_pytorch/
vector_quantize_pytorch.py:703 gates kmeans init / EMA on self.training).
"""

from __future__ import annotations

from flax import nnx


class ModeModule(nnx.Module):
    deterministic: bool = False

    @property
    def training(self) -> bool:
        return not self.deterministic

    @training.setter
    def training(self, value: bool) -> None:
        self.deterministic = not bool(value)

    def train(self, **attributes):
        """Switch this module and all submodules to training mode."""
        super().train(**attributes)  # sets deterministic=False recursively
        return self

    def eval(self, **attributes):
        """Switch this module and all submodules to inference mode."""
        super().eval(**attributes)  # sets deterministic=True recursively
        return self
