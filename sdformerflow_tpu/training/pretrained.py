"""Cross-resolution / cross-window-size remapping of pretrained swin
parameters.

Parity targets: /root/reference/models/STSwinNet/load_pretrained.py
- swin v1: bicubic interpolation of relative-position-bias tables when the
  window size changes (:91-177);
- swin v2: geometric-progression re-gridding of the continuous
  relative-coordinate table (:4-88).

These operate on plain arrays (a flax param tree maps over them); torch
checkpoint ingestion feeds them the reference's tables after layout
conversion.
"""

from __future__ import annotations

import numpy as np


def interpolate_rel_pos_bias_table(table: np.ndarray, src_window,
                                   dst_window) -> np.ndarray:
    """Bicubic-resample a v1 relative-position-bias table
    [(2wd-1)(2wh-1)(2ww-1), nH] from src_window to dst_window sizes.

    The temporal axis is resampled with nearest (it is tiny, typically 2);
    spatial axes use bicubic like the reference.
    """
    from scipy import ndimage

    sd, sh, sw = (2 * s - 1 for s in src_window)
    dd, dh, dw = (2 * d - 1 for d in dst_window)
    nh = table.shape[1]
    t = table.reshape(sd, sh, sw, nh)
    zoom = (dd / sd, dh / sh, dw / sw, 1.0)
    out = ndimage.zoom(t, zoom, order=3, mode="nearest")
    assert out.shape == (dd, dh, dw, nh), out.shape
    return out.reshape(-1, nh)


def geometric_relative_coords(window_size, pretrained_window_size):
    """Swin-v2 style log-spaced relative coordinates for re-gridding the cpb
    MLP input when transferring across window sizes (the cpb MLP itself is
    resolution-independent — only the coordinate table changes).
    """
    from ..ops.windows import relative_coords_table
    return relative_coords_table(tuple(window_size),
                                 tuple(pretrained_window_size))


def torch_tensor_layout_to_flax(name: str, array: np.ndarray) -> np.ndarray:
    """Convert a torch parameter layout to the flax convention:
    conv OIHW -> HWIO, transposed conv IOHW -> HWOI flipped, linear
    [out, in] -> [in, out]; everything else passes through."""
    if name.endswith("weight") and array.ndim == 4:
        return array.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if name.endswith("weight") and array.ndim == 2:
        return array.T
    return array
