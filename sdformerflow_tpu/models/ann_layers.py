"""ANN conv primitives (channels-last [..., H, W, C]).

Parity targets: /root/reference/models/submodules.py (ConvLayer,
TransposedConvLayer, UpsampleConvLayer, ResidualBlock).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.interpolate import resize_bilinear
from .common import xavier_uniform
from .spiking_layers import conv2d, conv_transpose2d

_ACTS = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def apply_activation(x, name: Optional[str]):
    if name is None:
        return x
    return _ACTS[name](x)


class Norm2d(nn.Module):
    """BN / IN over [..., H, W, C] with torch semantics."""

    norm: Optional[str]
    momentum: float = 0.1  # torch momentum

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm is None:
            return x
        if self.norm == "BN":
            from .spiking_layers import TorchBatchNorm
            return TorchBatchNorm(momentum=self.momentum,
                                  name="BatchNorm_0")(x, not train)
        if self.norm == "IN":
            # per-sample instance norm over (H, W)
            return nn.GroupNorm(num_groups=x.shape[-1],
                                reduction_axes=(-3, -2, -1))(x)
        raise ValueError(f"unknown norm {self.norm!r}")


class ConvLayer(nn.Module):
    """conv -> (BN/IN) -> activation."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.out_channels, self.kernel_size, self.stride,
                   use_bias=self.norm != "BN", name="conv2d")(x)
        x = Norm2d(self.norm, name="norm_layer")(x, train)
        return apply_activation(x, self.activation)


class TransposedConvLayer(nn.Module):
    """transposed conv x2 -> (norm) -> activation."""

    out_channels: int
    kernel_size: int
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv_transpose2d(self.out_channels, self.kernel_size, 2,
                             use_bias=self.norm != "BN",
                             name="transposed_conv2d")(x)
        x = Norm2d(self.norm, name="norm_layer")(x, train)
        return apply_activation(x, self.activation)


class UpsampleConvLayer(nn.Module):
    """bilinear x2 upsample -> conv -> (norm) -> activation."""

    out_channels: int
    kernel_size: int
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear(x, (h * self.scale_factor, w * self.scale_factor))
        x = conv2d(self.out_channels, self.kernel_size, 1,
                   use_bias=self.norm != "BN", name="conv2d")(x)
        x = Norm2d(self.norm, name="norm_layer")(x, train)
        return apply_activation(x, self.activation)


class ResidualBlock(nn.Module):
    """conv3x3 -> (norm) -> act -> conv3x3 -> (norm) -> +residual -> act."""

    out_channels: int
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.out_channels, 3, self.stride,
                     use_bias=self.norm != "BN", name="conv1")(x)
        out = Norm2d(self.norm, name="bn1")(out, train)
        out = apply_activation(out, self.activation)
        out = conv2d(self.out_channels, 3, 1, use_bias=self.norm != "BN",
                     name="conv2")(out)
        out = Norm2d(self.norm, name="bn2")(out, train)
        out = out + residual
        return apply_activation(out, self.activation)
