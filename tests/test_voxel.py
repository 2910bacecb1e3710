"""Golden-value tests for the on-device voxelizers.

The numpy oracles below re-derive the reference math independently (trilinear
scatter-add with value 2p-1, t-bilinear e2vid grid, bilinear count frames) —
the same cross-validation strategy as the reference's own triple-
implementation check (/root/reference/DSEC_dataloader/event_representations.py:371-449).
"""

import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.ops import voxel

import pytest

pytestmark = pytest.mark.smoke


def _random_events(n=500, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, w - 1, n).astype(np.float32)
    y = rng.uniform(0, h - 1, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 1e6, n)).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    return x, y, t, p


def _np_voxel_signed(x, y, t, p, num_bins, h, w):
    grid = np.zeros(num_bins * h * w, np.float64)
    tn = (num_bins - 1) * (t - t[0]) / (t[-1] - t[0])
    x0, y0, t0 = x.astype(int), y.astype(int), tn.astype(int)
    val = 2 * p - 1
    for dx in (0, 1):
        for dy in (0, 1):
            for dt in (0, 1):
                xl, yl, tl = x0 + dx, y0 + dy, t0 + dt
                m = (xl >= 0) & (xl < w) & (yl >= 0) & (yl < h) & (tl >= 0) & (tl < num_bins)
                wgt = val * (1 - np.abs(xl - x)) * (1 - np.abs(yl - y)) * (1 - np.abs(tl - tn))
                np.add.at(grid, (tl[m] * h + yl[m]) * w + xl[m], wgt[m])
    return grid.reshape(num_bins, h, w)


def test_voxel_signed_matches_oracle():
    h, w, bins = 32, 48, 5
    x, y, t, p = _random_events(h=h, w=w)
    got = voxel.voxel_grid_signed(jnp.asarray(x), jnp.asarray(y),
                                  jnp.asarray(t), jnp.asarray(p),
                                  num_bins=bins, height=h, width=w)
    want = _np_voxel_signed(x, y, t, p, bins, h, w)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_voxel_polarities_sum_equals_abs_mass():
    h, w, bins = 16, 24, 4
    x, y, t, p = _random_events(n=300, h=h, w=w, seed=3)
    grid = voxel.voxel_grid_polarities(jnp.asarray(x), jnp.asarray(y),
                                       jnp.asarray(t), jnp.asarray(p),
                                       num_bins=bins, height=h, width=w)
    assert grid.shape == (bins, 2, h, w)
    # positive minus negative equals the signed grid
    signed = voxel.voxel_grid_signed(jnp.asarray(x), jnp.asarray(y),
                                     jnp.asarray(t), jnp.asarray(p),
                                     num_bins=bins, height=h, width=w)
    np.testing.assert_allclose(np.asarray(grid[:, 0] - grid[:, 1]),
                               np.asarray(signed), atol=1e-3)


def test_voxel_padding_invariance():
    h, w, bins = 16, 24, 4
    x, y, t, p = _random_events(n=200, h=h, w=w, seed=4)
    base = voxel.voxel_grid_signed(jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(t), jnp.asarray(p),
                                   num_bins=bins, height=h, width=w)
    xp, yp, tp, pp, valid = voxel.pad_events(x, y, t, p, 512)
    padded = voxel.voxel_grid_signed(jnp.asarray(xp), jnp.asarray(yp),
                                     jnp.asarray(tp), jnp.asarray(pp),
                                     num_bins=bins, height=h, width=w,
                                     valid=jnp.asarray(valid),
                                     t_range=(t[0], t[-1]))
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), atol=1e-3)


def test_voxel_v2_matches_oracle():
    h, w, bins = 20, 30, 5
    x, y, t, p = _random_events(n=400, h=h, w=w, seed=5)
    got = voxel.events_to_voxel_grid_v2(jnp.asarray(x), jnp.asarray(y),
                                        jnp.asarray(t), jnp.asarray(p),
                                        num_bins=bins, height=h, width=w,
                                        normalize=False)
    # oracle: t-bilinear only, x/y truncated, polarity -1/+1
    grid = np.zeros(bins * h * w, np.float64)
    tn = (bins - 1) * (t - t[0]) / (t[-1] - t[0])
    xs, ys = x.astype(int), y.astype(int)
    pol = np.where(p == 0, -1.0, 1.0)
    tis = tn.astype(int)
    dts = tn - tis
    m = tis < bins
    np.add.at(grid, xs[m] + ys[m] * w + tis[m] * w * h, (pol * (1 - dts))[m])
    m = tis + 1 < bins
    np.add.at(grid, xs[m] + ys[m] * w + (tis[m] + 1) * w * h, (pol * dts)[m])
    np.testing.assert_allclose(np.asarray(got), grid.reshape(bins, h, w), atol=1e-3)


def test_events_to_frames_counts_mass():
    h, w, frames = 16, 16, 3
    x, y, t, p = _random_events(n=250, h=h, w=w, seed=6)
    fr = voxel.events_to_frames(jnp.asarray(x), jnp.asarray(y), jnp.asarray(t),
                                jnp.asarray(p), num_frames=frames, height=h,
                                width=w)
    assert fr.shape == (frames, 2, h, w)
    # interior events deposit total weight 1 each (bilinear partition of unity)
    interior = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    np.testing.assert_allclose(float(fr.sum()), interior.sum(), rtol=1e-4)


def test_normalize_nonzero_std():
    g = jnp.asarray([[0.0, 2.0], [4.0, 0.0]])
    out = np.asarray(voxel.normalize_nonzero_std(g))
    nz = out[out != 0]
    np.testing.assert_allclose(nz.mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(nz.std(), 1.0, atol=1e-6)
    assert out[0, 0] == 0.0 and out[1, 1] == 0.0
