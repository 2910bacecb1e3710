"""On-device event -> voxel-grid rasterization.

The reference rasterizes events on CPU in an offline preprocessing pass
(trilinear ``tensor.put_(accumulate=True)`` scatter-adds, see
/root/reference/DSEC_dataloader/event_representations.py:241-368 and
/root/reference/MDR_dataloader/loader_utils.py:421-577). Here the same math is
expressed as XLA scatter-adds (``array.at[idx].add(w)``) over fixed-size,
possibly zero-padded event buffers, so voxelization runs on the TPU inside the
jitted input path — arbitrary event counts stream through a static-shape
program.

All functions take flat event arrays ``x, y, t, p`` of shape ``[N]`` plus an
optional boolean ``valid`` mask (padding slots carry zero weight). Shapes are
static under jit; pad the event buffer to a bucket size on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _t_norm(t, num_bins, t_range=None):
    """Normalize timestamps to [0, num_bins-1] like the reference:
    ``(C-1) * (t - t_first) / (t_last - t_first)``."""
    if t_range is None:
        t0, t1 = t[0], t[-1]
    else:
        t0, t1 = t_range
    denom = t1 - t0
    denom = jnp.where(denom == 0, 1.0, denom)
    return (num_bins - 1) * (t - t0) / denom


def _trunc_int(v):
    """torch ``.int()`` truncates toward zero."""
    return jnp.trunc(v).astype(jnp.int32)


def voxel_grid_signed(x, y, t, p, *, num_bins, height, width, valid=None,
                      t_range=None):
    """Signed trilinear voxel grid, value = 2p - 1. Returns [num_bins, H, W].

    Parity: VoxelGrid.convert_CHW (event_representations.py:248-277).
    """
    t_n = _t_norm(t.astype(jnp.float32), num_bins, t_range)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    value = 2.0 * p.astype(jnp.float32) - 1.0
    x0, y0, t0 = _trunc_int(x), _trunc_int(y), _trunc_int(t_n)

    grid = jnp.zeros((num_bins * height * width,), jnp.float32)
    base_valid = jnp.ones(x.shape, bool) if valid is None else valid
    for dx in (0, 1):
        for dy in (0, 1):
            for dt in (0, 1):
                xl, yl, tl = x0 + dx, y0 + dy, t0 + dt
                mask = ((xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                        & (tl >= 0) & (tl < num_bins) & base_valid)
                w = (value
                     * (1.0 - jnp.abs(xl.astype(jnp.float32) - x))
                     * (1.0 - jnp.abs(yl.astype(jnp.float32) - y))
                     * (1.0 - jnp.abs(tl.astype(jnp.float32) - t_n)))
                idx = (tl * height + yl) * width + xl
                grid = grid.at[jnp.where(mask, idx, -1)].add(
                    jnp.where(mask, w, 0.0), mode="drop")
    return grid.reshape(num_bins, height, width)


def voxel_grid_polarities(x, y, t, p, *, num_bins, height, width, valid=None,
                          t_range=None):
    """Per-polarity trilinear voxel grid. Returns [num_bins, 2, H, W] with
    channel 0 = positive, channel 1 = negative events.

    Parity: VoxelGrid.convert_CHW_polarities (event_representations.py:279-313).
    """
    t_n = _t_norm(t.astype(jnp.float32), num_bins, t_range)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0, y0, t0 = _trunc_int(x), _trunc_int(y), _trunc_int(t_n)

    pos = p.astype(jnp.float32) == 1.0
    base_valid = jnp.ones(x.shape, bool) if valid is None else valid
    grids = []
    for pol_mask in (pos, ~pos):
        grid = jnp.zeros((num_bins * height * width,), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dt in (0, 1):
                    xl, yl, tl = x0 + dx, y0 + dy, t0 + dt
                    mask = ((xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                            & (tl >= 0) & (tl < num_bins)
                            & base_valid & pol_mask)
                    w = ((1.0 - jnp.abs(xl.astype(jnp.float32) - x))
                         * (1.0 - jnp.abs(yl.astype(jnp.float32) - y))
                         * (1.0 - jnp.abs(tl.astype(jnp.float32) - t_n)))
                    idx = (tl * height + yl) * width + xl
                    grid = grid.at[jnp.where(mask, idx, -1)].add(
                        jnp.where(mask, w, 0.0), mode="drop")
        grids.append(grid.reshape(num_bins, height, width))
    return jnp.stack(grids, axis=1)


def events_to_voxel_grid_v2(x, y, t, p, *, num_bins, height, width,
                            valid=None, t_range=None, normalize=True):
    """e2vid-style voxel grid: bilinear in time only, x/y truncated to int.
    Polarity 0 means -1. Returns [num_bins, H, W].

    Parity: events_to_voxel_grid_v2 (event_representations.py:315-368).
    """
    t_n = _t_norm(t.astype(jnp.float32), num_bins, t_range)
    xs = _trunc_int(x.astype(jnp.float32))
    ys = _trunc_int(y.astype(jnp.float32))
    pols = jnp.where(p.astype(jnp.float32) == 0, -1.0, p.astype(jnp.float32))

    tis = _trunc_int(t_n)
    dts = t_n - tis
    base_valid = jnp.ones(x.shape, bool) if valid is None else valid

    grid = jnp.zeros((num_bins * height * width,), jnp.float32)
    flat_xy = xs + ys * width

    m_left = (tis < num_bins) & base_valid
    idx_left = flat_xy + tis * width * height
    grid = grid.at[jnp.where(m_left, idx_left, -1)].add(
        jnp.where(m_left, pols * (1.0 - dts), 0.0), mode="drop")

    m_right = (tis + 1 < num_bins) & base_valid
    idx_right = flat_xy + (tis + 1) * width * height
    grid = grid.at[jnp.where(m_right, idx_right, -1)].add(
        jnp.where(m_right, pols * dts, 0.0), mode="drop")

    grid = grid.reshape(num_bins, height, width)
    if normalize:
        grid = normalize_nonzero_std(grid)
    return grid


def events_to_frames(x, y, t, p, *, num_frames, height, width, valid=None,
                     t_range=None):
    """Per-bin bilinear (x, y) event-count frames. Returns
    [num_frames, 2, H, W] (channel 0 = ON, channel 1 = OFF).

    Parity: events_to_frames (event_representations.py:45-76).
    """
    t_n = _t_norm(t.astype(jnp.float32), 2, t_range)  # (2-1)*frac -> [0, 1]
    ts = _trunc_int((num_frames - 1) * t_n)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0, y0 = _trunc_int(x), _trunc_int(y)
    base_valid = jnp.ones(x.shape, bool) if valid is None else valid

    grid = jnp.zeros((num_frames * 2 * height * width,), jnp.float32)
    for pol_idx, pol_mask in ((0, p == 1), (1, p == 0)):
        for dx in (0, 1):
            for dy in (0, 1):
                xl, yl = x0 + dx, y0 + dy
                mask = ((xl >= 0) & (xl < width) & (yl >= 0) & (yl < height)
                        & base_valid & pol_mask)
                w = (jax.nn.relu(1.0 - jnp.abs(xl.astype(jnp.float32) - x))
                     * jax.nn.relu(1.0 - jnp.abs(yl.astype(jnp.float32) - y)))
                idx = ((ts * 2 + pol_idx) * height + yl) * width + xl
                grid = grid.at[jnp.where(mask, idx, -1)].add(
                    jnp.where(mask, w, 0.0), mode="drop")
    return grid.reshape(num_frames, 2, height, width)


def normalize_nonzero_std(grid):
    """Zero-mean/unit-std over nonzero entries only (masked reductions, fully
    jittable — the reference uses boolean indexing which is not)."""
    mask = grid != 0
    count = jnp.maximum(mask.sum(), 1)
    mean = jnp.sum(jnp.where(mask, grid, 0.0)) / count
    var = jnp.sum(jnp.where(mask, (grid - mean) ** 2, 0.0)) / count
    std = jnp.sqrt(var)
    normed = jnp.where(mask, (grid - mean) / std, grid)
    return jnp.where(std > 0, normed, grid)


def pad_events(x, y, t, p, target_len: int):
    """Host-side helper: pad flat event arrays to ``target_len`` and return
    (x, y, t, p, valid). Use bucketed lengths to bound recompilation."""
    import numpy as np
    n = len(x)
    if n > target_len:
        raise ValueError(f"{n} events exceed buffer {target_len}")
    valid = np.zeros(target_len, bool)
    valid[:n] = True

    def pad(a):
        out = np.zeros(target_len, a.dtype)
        out[:n] = a
        return out

    return pad(x), pad(y), pad(t), pad(p), valid
