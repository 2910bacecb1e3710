"""Pallas voxelizer vs the XLA-scatter oracle (golden path, ops/voxel.py).

Runs the kernel in interpret mode on CPU; the on-chip A/B + timing lives in
scripts/bench_voxelize.py (PERF_NOTES.md records the numbers).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.ops.voxel import voxel_grid_signed
from sdformerflow_tpu.ops import pallas_voxel


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl
    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pallas_voxel.pl, "pallas_call", interp_call)
    yield


def _events(n, h, w, bins, seed=0, valid_frac=1.0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, w - 1, n).astype(np.float32)
    y = rng.uniform(0, h - 1, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    valid = (rng.uniform(size=n) < valid_frac)
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
            jnp.asarray(valid))


@pytest.mark.parametrize("n,h,w,bins", [(977, 24, 32, 5), (2048, 17, 40, 3)])
def test_pallas_matches_xla_oracle(n, h, w, bins):
    x, y, t, p, valid = _events(n, h, w, bins)
    want = voxel_grid_signed(x, y, t, p, num_bins=bins, height=h, width=w,
                             t_range=(0.0, 1.0))
    got = pallas_voxel.voxel_grid_signed_pallas(
        x, y, t, p, num_bins=bins, height=h, width=w, t_range=(0.0, 1.0),
        chunk=128)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(want).sum()) > 0  # non-vacuous


def test_pallas_respects_valid_mask():
    n, h, w, bins = 1500, 20, 24, 4
    x, y, t, p, valid = _events(n, h, w, bins, seed=1, valid_frac=0.6)
    want = voxel_grid_signed(x, y, t, p, num_bins=bins, height=h, width=w,
                             valid=valid, t_range=(0.0, 1.0))
    got = pallas_voxel.voxel_grid_signed_pallas(
        x, y, t, p, num_bins=bins, height=h, width=w, valid=valid,
        t_range=(0.0, 1.0), chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pallas_edge_coordinates():
    """Events exactly on the last row/col/bin boundary must not leak."""
    h, w, bins = 8, 16, 3
    x = jnp.asarray([0.0, 15.0, 14.5, 7.25])
    y = jnp.asarray([0.0, 7.0, 6.5, 3.75])
    t = jnp.asarray([0.0, 1.0, 0.5, 0.25])
    p = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    want = voxel_grid_signed(x, y, t, p, num_bins=bins, height=h, width=w,
                             t_range=(0.0, 1.0))
    got = pallas_voxel.voxel_grid_signed_pallas(
        x, y, t, p, num_bins=bins, height=h, width=w, t_range=(0.0, 1.0),
        chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pallas_polarities_matches_xla_oracle():
    from sdformerflow_tpu.ops.voxel import voxel_grid_polarities
    n, h, w, bins = 1777, 20, 28, 4
    x, y, t, p, valid = _events(n, h, w, bins, seed=5, valid_frac=0.8)
    want = voxel_grid_polarities(x, y, t, p, num_bins=bins, height=h,
                                 width=w, valid=valid, t_range=(0.0, 1.0))
    got = pallas_voxel.voxel_grid_polarities_pallas(
        x, y, t, p, num_bins=bins, height=h, width=w, valid=valid,
        t_range=(0.0, 1.0), chunk=128)
    assert got.shape == want.shape == (bins, 2, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # both polarity channels carry mass
    assert float(jnp.abs(want[:, 0]).sum()) > 0
    assert float(jnp.abs(want[:, 1]).sum()) > 0


def test_pallas_v2_grid_matches_xla_oracle():
    from sdformerflow_tpu.ops.voxel import events_to_voxel_grid_v2
    n, h, w, bins = 1555, 18, 26, 5
    x, y, t, p, valid = _events(n, h, w, bins, seed=6, valid_frac=0.85)
    for norm in (False, True):
        want = events_to_voxel_grid_v2(
            x, y, t, p, num_bins=bins, height=h, width=w, valid=valid,
            t_range=(0.0, 1.0), normalize=norm)
        got = pallas_voxel.events_to_voxel_grid_v2_pallas(
            x, y, t, p, num_bins=bins, height=h, width=w, valid=valid,
            t_range=(0.0, 1.0), normalize=norm, chunk=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(want).sum()) > 0


def test_pallas_frames_matches_xla_oracle():
    from sdformerflow_tpu.ops.voxel import events_to_frames
    n, h, w, frames = 1333, 16, 22, 6
    x, y, t, p, valid = _events(n, h, w, frames, seed=7, valid_frac=0.9)
    want = events_to_frames(x, y, t, p, num_frames=frames, height=h,
                            width=w, valid=valid, t_range=(0.0, 1.0))
    got = pallas_voxel.events_to_frames_pallas(
        x, y, t, p, num_frames=frames, height=h, width=w, valid=valid,
        t_range=(0.0, 1.0), chunk=128)
    assert got.shape == want.shape == (frames, 2, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(want).sum()) > 0


def test_pallas_degenerate_distributions():
    """All events concentrated in one row (max chunks in one grid step) and
    a fully-invalid window (empty grid)."""
    h, w, bins = 12, 16, 3
    n = 700
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(0, w - 1, n).astype(np.float32))
    y = jnp.full((n,), 5.25, jnp.float32)  # single row
    t = jnp.asarray(np.sort(rng.uniform(0, 1, n)).astype(np.float32))
    p = jnp.asarray(rng.integers(0, 2, n).astype(np.float32))
    want = voxel_grid_signed(x, y, t, p, num_bins=bins, height=h, width=w,
                             t_range=(0.0, 1.0))
    got = pallas_voxel.voxel_grid_signed_pallas(
        x, y, t, p, num_bins=bins, height=h, width=w, t_range=(0.0, 1.0),
        chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # fully masked -> zero grid
    zero = pallas_voxel.voxel_grid_signed_pallas(
        x, y, t, p, num_bins=bins, height=h, width=w,
        valid=jnp.zeros((n,), bool), t_range=(0.0, 1.0), chunk=128)
    assert float(jnp.abs(zero).sum()) == 0.0


def test_pallas_out_of_range_coordinates():
    """Out-of-range coords (y <= -1, y >= H, x out of range) are zero-weight
    but stay in the sorted stream; the offsets must come from the same
    clipped key the sort used or boundary-row events get dropped
    (advisor finding r2). Mix plenty of out-of-range events with valid
    events concentrated in the first and last rows."""
    h, w, bins = 10, 16, 4
    rng = np.random.default_rng(11)
    n_valid, n_oob = 600, 400
    xv = rng.uniform(0, w - 1, n_valid).astype(np.float32)
    # valid events only in boundary rows 0 and h-1
    yv = np.where(rng.uniform(size=n_valid) < 0.5,
                  rng.uniform(0, 0.999, n_valid),
                  np.full(n_valid, h - 1.0)).astype(np.float32)
    xo = rng.uniform(-5, w + 5, n_oob).astype(np.float32)
    yo = np.where(rng.uniform(size=n_oob) < 0.5,
                  rng.uniform(-6, -1, n_oob),
                  rng.uniform(h, h + 6, n_oob)).astype(np.float32)
    x = np.concatenate([xv, xo])
    y = np.concatenate([yv, yo])
    n = n_valid + n_oob
    t = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    perm = rng.permutation(n)
    x, y, t, p = (jnp.asarray(a[perm]) for a in (x, y, t, p))
    want = voxel_grid_signed(x, y, t, p, num_bins=bins, height=h, width=w,
                             t_range=(0.0, 1.0))
    got = pallas_voxel.voxel_grid_signed_pallas(
        x, y, t, p, num_bins=bins, height=h, width=w, t_range=(0.0, 1.0),
        chunk=128)
    assert float(jnp.abs(want).sum()) > 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pallas_frames_out_of_range_relu():
    """events_to_frames masks per CORNER with relu'd weights and no
    event-level range check (event_representations.py:45-76): border events
    with coords in (-1, 0) or (W-1, W) still contribute their in-grid
    corner."""
    from sdformerflow_tpu.ops.voxel import events_to_frames
    h, w, frames = 8, 12, 3
    rng = np.random.default_rng(13)
    n = 500
    x = jnp.asarray(rng.uniform(-0.99, w - 0.01, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(-0.99, h - 0.01, n).astype(np.float32))
    t = jnp.asarray(np.sort(rng.uniform(0, 1, n)).astype(np.float32))
    p = jnp.asarray(rng.integers(0, 2, n).astype(np.float32))
    want = events_to_frames(x, y, t, p, num_frames=frames, height=h,
                            width=w, t_range=(0.0, 1.0))
    got = pallas_voxel.events_to_frames_pallas(
        x, y, t, p, num_frames=frames, height=h, width=w,
        t_range=(0.0, 1.0), chunk=128)
    assert float(jnp.abs(want).sum()) > 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_presorted_skips_sort_and_matches_oracle():
    """presorted=True on host-row-grouped buffers (native.pack_window_sorted)
    must equal the XLA oracle, including out-of-range coords and a padded
    tail carrying y = height."""
    from sdformerflow_tpu import native

    rng = np.random.default_rng(11)
    n, cap, h, w, bins = 3000, 4096, 24, 32, 5
    x = rng.uniform(-1.5, w + 0.5, n).astype(np.float32)
    y = rng.uniform(-1.5, h + 0.5, n).astype(np.float32)
    t = rng.uniform(0, 1, n).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    xs, ys, ts, ps, valid = native.pack_window_sorted(
        x, y, t, p, cap, height=h, t0=0.0)
    want = voxel_grid_signed(jnp.asarray(x), jnp.asarray(y), jnp.asarray(t),
                             jnp.asarray(p), num_bins=bins, height=h,
                             width=w, t_range=(0.0, 1.0))
    got = pallas_voxel.voxel_grid_signed_pallas(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts), jnp.asarray(ps),
        num_bins=bins, height=h, width=w, valid=jnp.asarray(valid),
        t_range=(0.0, 1.0), chunk=128, presorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(want).sum()) > 0


def test_presorted_polarities_matches_unsorted():
    from sdformerflow_tpu import native

    rng = np.random.default_rng(12)
    n, cap, h, w, bins = 2000, 2048, 20, 24, 4
    x = rng.uniform(0, w - 1, n).astype(np.float32)
    y = rng.uniform(0, h - 1, n).astype(np.float32)
    t = rng.uniform(0, 1, n).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    xs, ys, ts, ps, valid = native.pack_window_sorted(
        x, y, t, p, cap, height=h, t0=0.0)
    kw = dict(num_bins=bins, height=h, width=w, t_range=(0.0, 1.0),
              chunk=128)
    want = pallas_voxel.voxel_grid_polarities_pallas(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p), **kw)
    got = pallas_voxel.voxel_grid_polarities_pallas(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts), jnp.asarray(ps),
        valid=jnp.asarray(valid), presorted=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
