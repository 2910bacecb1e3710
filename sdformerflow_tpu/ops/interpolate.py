"""Spatial resizing with torch-compatible sampling semantics.

- ``resize_bilinear``: half-pixel centers, edge clamp — identical to torch
  ``F.interpolate(mode='bilinear', align_corners=False)``; implemented with
  ``jax.image.resize`` (same definition).
- ``resize_nearest``: torch's legacy 'nearest' (src = floor(dst * in/out)),
  which is what the reference's final flow upsampling uses because it calls
  ``F.interpolate`` without a mode argument
  (/root/reference/models/STSwinNet_SNN/Spiking_STSwinNet.py:295-302 and
  /root/reference/models/STSwinNet/STSwinNet.py:461-470).

Both operate on channels-last ``[..., H, W, C]`` arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, out_hw):
    """Bilinear resize of [..., H, W, C] to [..., out_h, out_w, C]."""
    out_shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear")


def resize_nearest(x, out_hw):
    """torch-exact nearest resize of [..., H, W, C]."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    src_i = jnp.clip(jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32), 0, h - 1)
    src_j = jnp.clip(jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32), 0, w - 1)
    x = jnp.take(x, src_i, axis=-3)
    return jnp.take(x, src_j, axis=-2)
