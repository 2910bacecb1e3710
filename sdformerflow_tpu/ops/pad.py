"""Skip-connection joins and pad/crop helpers (channels-last).

Parity targets: skip_concat / skip_sum with centered zero padding
(/root/reference/models/model_util.py:14-27) and the CropSize pad-to-divisible
helper (model_util.py:106-146). Channels-last equivalents: features are
``[..., H, W, C]``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _pad_match(x1, x2):
    """Zero-pad (or crop, for negative deltas — torch ZeroPad2d semantics)
    x1's H/W to x2's, centered."""
    dy = x2.shape[-3] - x1.shape[-3]
    dx = x2.shape[-2] - x1.shape[-2]
    if dy == 0 and dx == 0:
        return x1
    lo_y, hi_y = dy // 2, dy - dy // 2
    lo_x, hi_x = dx // 2, dx - dx // 2
    # crop first (negative pads), then zero-pad the positive remainder
    h, w = x1.shape[-3], x1.shape[-2]
    y0, y1 = max(0, -lo_y), h - max(0, -hi_y)
    x0_, x1_ = max(0, -lo_x), w - max(0, -hi_x)
    x1 = x1[..., y0:y1, x0_:x1_, :]
    pads = [(0, 0)] * x1.ndim
    pads[-3] = (max(0, lo_y), max(0, hi_y))
    pads[-2] = (max(0, lo_x), max(0, hi_x))
    return jnp.pad(x1, pads)


def skip_concat(x1, x2, axis=-1):
    """Pad x1 to x2's spatial size, then concatenate along ``axis``.

    The reference concatenates along the channel axis of [.., C, H, W]
    (dim=1 for ANN, dim=2 for [T, B, C, H, W]); with channels-last layouts the
    equivalent is axis=-1.
    """
    return jnp.concatenate([_pad_match(x1, x2), x2], axis=axis)


def skip_sum(x1, x2, axis=None):
    """Pad x1 to x2's spatial size, then add."""
    del axis
    return _pad_match(x1, x2) + x2


def optimal_crop_size(max_size, factor, safety_margin=0):
    """Smallest multiple of ``factor`` that is >= max_size."""
    crop = int(factor * math.ceil(max_size / factor))
    return crop + safety_margin * factor


class CropSize:
    """Pad [..., H, W, C] up to dimensions divisible by a patch factor and
    crop back after the network. Centered padding, matching the reference.
    """

    def __init__(self, width, height, factor):
        self.height, self.width = height, width
        self.height_crop = optimal_crop_size(height, factor["h"])
        self.width_crop = optimal_crop_size(width, factor["w"])
        self.padding_top = math.ceil(0.5 * (self.height_crop - height))
        self.padding_bottom = math.floor(0.5 * (self.height_crop - height))
        self.padding_left = math.ceil(0.5 * (self.width_crop - width))
        self.padding_right = math.floor(0.5 * (self.width_crop - width))
        cx, cy = math.floor(self.width_crop / 2), math.floor(self.height_crop / 2)
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)

    def pad(self, x):
        pads = [(0, 0)] * x.ndim
        pads[-3] = (self.padding_top, self.padding_bottom)
        pads[-2] = (self.padding_left, self.padding_right)
        return jnp.pad(x, pads)

    def crop(self, x):
        return x[..., self.iy0:self.iy1, self.ix0:self.ix1, :]
