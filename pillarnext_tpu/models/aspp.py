"""ASPP neck with a weight-shared dilated 3x3 conv bank.

Parity with the reference ASPPNeck (det3d/models/necks/aspp.py:8-40):
pre residual block; parallel branches [input, 1x1 conv, shared-weight 3x3 at
dilations 1/6/12/18]; concat (6C) -> 1x1 ConvBlock.  The shared 3x3 weight is
a single parameter applied four times with different dilation — XLA fuses the
four dilated convs over the same VMEM-resident input.

During training the whole neck is rematerialized (jax.checkpoint), matching
the reference's torch.utils.checkpoint wrapping (aspp.py:34-40) and trading
FLOPs for HBM on the large BEV grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pillarnext_tpu.models.layers import BasicBlock, ConvBlock


class ASPPNeck(nn.Module):
    in_channels: int
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    def _forward(self, x, train: bool):
        c = self.in_channels
        x = BasicBlock(c, axis_name=self.axis_name, dtype=self.dtype)(x, train)
        branch_1x1 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(x)

        shared = self.param(
            "shared_dilated_kernel",
            nn.initializers.normal(1.0),  # reference inits with randn (aspp.py:16)
            (3, 3, c, c),
        )
        kernel = shared if self.dtype is None else shared.astype(self.dtype)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        dilated = [
            jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(1, 1),
                padding="SAME",
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            for d in (1, 6, 12, 18)
        ]
        x = jnp.concatenate([x, branch_1x1] + dilated, axis=-1)
        x = ConvBlock(c, kernel_size=1, axis_name=self.axis_name, dtype=self.dtype)(
            x, train
        )
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train:
            return nn.remat(ASPPNeck._forward, static_argnums=(2,))(self, x, True)
        return self._forward(x, False)
