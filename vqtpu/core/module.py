"""Shared NNX module base with a torch-like train/eval mode flag.

Every quantizer carries a static `training` attribute (static => train and
eval trace to different, appropriately specialized XLA programs, which is
what you want on TPU: the eval graph has no EMA collectives at all).
"""

from __future__ import annotations

from flax import nnx


class ModeModule(nnx.Module):
    training: bool = True

    def train(self, **attributes):
        """Switch this module and all submodules to training mode."""
        super().train(**attributes)
        self.set_attributes(training=True, raise_if_not_found=False)
        return self

    def eval(self, **attributes):
        """Switch this module and all submodules to inference mode."""
        super().eval(**attributes)
        self.set_attributes(training=False, raise_if_not_found=False)
        return self
