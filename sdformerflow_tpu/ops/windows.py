"""3D shifted-window helpers: partition/reverse, cyclic shifts, shift masks.

All pure reshape/transpose code — XLA turns these into layout changes that
fuse with adjacent ops. The attention mask is computed at trace time with
numpy (static shapes), so it is a compile-time constant baked into the
program rather than per-step work.

Parity targets:
- window_partition / window_reverse:
  /root/reference/models/STSwinNet/swin_transformer3D_v2.py:37-65
- window_partition_v2 (temporal window axis doubles as SNN time axis):
  /root/reference/models/STSwinNet_SNN/Spiking_swin_transformer3D.py:100-113
- compute_mask: swin_transformer3D_v2.py:408-421
- get_window_size: swin_transformer3D_v2.py:68-81
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window/shift to the actual extent when the input is smaller."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i, s in enumerate(x_size):
        if s <= window_size[i]:
            use_window[i] = s
            if use_shift is not None:
                use_shift[i] = 0
    if use_shift is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def window_partition(x, window_size):
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C]."""
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, C)


def window_partition_v2(x, window_size):
    """[B, D, H, W, C] -> [wd, B*nW, wh, ww, C].

    The temporal window axis is pulled out front so it can serve directly as
    the SNN time axis inside spiking window attention.
    """
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(wd, -1, wh, ww, C)


def window_partition_v2_tm(x, window_size):
    """Time-major variant: [D, B, H, W, C] -> [wd, B*nW, wh, ww, C].

    Bit-identical element mapping to ``window_partition_v2`` (verified in
    tests/test_windows.py) — including the reference's RAW-REFOLD quirk: the
    final reshape regroups the row-major ravel of (B, nD, nH, nW, wd, wh,
    ww, C) into a leading ``wd`` axis (Spiking_swin_transformer3D.py:100-113
    does ``permute(0,1,3,5,2,4,6,7).view(wd, -1, wh, ww, C)``), so the
    "time" axis inside spiking attention is NOT the clean window-time axis.
    Starting from time-major stage features removes the [B, D] <-> [D, B]
    full-tensor transposes the stages used to need (PERF_NOTES.md).
    """
    D, B, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(D // wd, wd, B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(2, 0, 3, 5, 1, 4, 6, 7)  # B, nD, nH, nW, wd, wh, ww, C
    return x.reshape(wd, -1, wh, ww, C)      # raw refold (reference quirk)


def window_reverse_tm(windows, window_size, B, D, H, W):
    """Inverse of ``window_partition_v2_tm`` + the reference's raw
    ``view(B_, N, C)`` fold of the attention output:
    [wd, B*nW, wh, ww, C] -> [D, B, H, W, C]."""
    wd, wh, ww = window_size
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, -1)  # raw
    x = x.transpose(1, 4, 0, 2, 5, 3, 6, 7)  # nD, wd, B, nH, wh, nW, ww, C
    return x.reshape(D, B, H, W, -1)


def pad_to_windows_tm(x, window_size):
    """Zero-pad time-major [D, B, H, W, C] so D/H/W are window multiples."""
    D, B, H, W, C = x.shape
    wd, wh, ww = window_size
    pad_d = (wd - D % wd) % wd
    pad_h = (wh - H % wh) % wh
    pad_w = (ww - W % ww) % ww
    if pad_d or pad_h or pad_w:
        x = jnp.pad(x, ((0, pad_d), (0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return x, (D, H, W)


def window_reverse(windows, window_size, B, D, H, W):
    """[B*nW, wd, wh, ww, C] (any trailing layout reshapeable to it) ->
    [B, D, H, W, C]."""
    wd, wh, ww = window_size
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


def compute_mask(D, H, W, window_size, shift_size):
    """Attention mask for shifted windows: [nW, N, N] with 0 / -100 entries.

    Computed with numpy at trace time (all arguments are static Python ints),
    so under jit this is a constant.
    """
    img_mask = np.zeros((1, D, H, W, 1), np.float32)
    cnt = 0
    for d in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0]),
              slice(-shift_size[0], None)):
        for h in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1]),
                  slice(-shift_size[1], None)):
            for w in (slice(-window_size[2]), slice(-window_size[2], -shift_size[2]),
                      slice(-shift_size[2], None)):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    wd, wh, ww = window_size
    m = img_mask.reshape(1, D // wd, wd, H // wh, wh, W // ww, ww, 1)
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww)
    attn_mask = m[:, None, :] - m[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return jnp.asarray(attn_mask)


def pad_to_windows(x, window_size):
    """Zero-pad [B, D, H, W, C] so D/H/W are multiples of window_size.

    Returns (padded, (D, H, W) original sizes).
    """
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    pad_d = (wd - D % wd) % wd
    pad_h = (wh - H % wh) % wh
    pad_w = (ww - W % ww) % ww
    if pad_d or pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
    return x, (D, H, W)


def relative_position_index(window_size):
    """Pairwise relative-position index [N, N] into a flattened bias table
    of size (2wd-1)(2wh-1)(2ww-1). Static numpy; used by both swin v1 and v2.
    """
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # 3, wd, wh, ww
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 3, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= (2 * ww - 1)
    return rel.sum(-1)  # N, N


def relative_coords_table(window_size, pretrained_window_size=(0, 0, 0)):
    """Log-spaced continuous relative coordinates for the swin-v2 cpb MLP:
    [1, 2wd-1, 2wh-1, 2ww-1, 3].

    QUIRK (deliberate, reference-parity): the reference normalizes with
    ``table[:, :, :, i] /= (ws[i] - 1)`` on the 5-D table
    (/root/reference/models/STSwinNet/swin_transformer3D_v2.py:126-133),
    which — inherited from the 4-D 2-D-swin code — indexes the *Ww axis*,
    not the coords channel. So only the first three W-offset slices are
    divided (each across ALL three coordinate channels) and the remaining
    W-offsets keep raw coordinates. Verified bit-exact against the
    reference module in tests/test_reference_parity.py. We only guard the
    0-divisor case (wd == 1) which would produce inf on the torch side.
    """
    wd, wh, ww = window_size
    rd = np.arange(-(wd - 1), wd, dtype=np.float32)
    rh = np.arange(-(wh - 1), wh, dtype=np.float32)
    rw = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(rd, rh, rw, indexing="ij"))
    table = table.transpose(1, 2, 3, 0)[None]  # 1, 2wd-1, 2wh-1, 2ww-1, 3
    ref = pretrained_window_size if pretrained_window_size[0] > 0 else window_size
    for i in range(3):
        denom = max(ref[i] - 1, 1)
        table[:, :, :, i] /= denom  # sic: W-axis slice, not coords channel
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)
