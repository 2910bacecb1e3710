"""C++ event-ops (sdformerflow_tpu/native) vs numpy reference semantics.

Parity target: the reference's numba loader internals
(/root/reference/DSEC_dataloader/event_representations.py:174-232).
"""

import numpy as np
import pytest

from sdformerflow_tpu import native

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(0)
    n = 200_000
    t = np.sort(rng.integers(0, 5_000_000, n)).astype(np.int64)  # 5 s in us
    x = rng.integers(0, 640, n).astype(np.uint16)
    y = rng.integers(0, 480, n).astype(np.uint16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    return x, y, t, p


def test_native_builds():
    # the environment ships g++; the native path must actually be active
    assert native.available()


def test_compute_ms_to_idx_matches_searchsorted(stream):
    _, _, t, _ = stream
    n_ms = 5_001
    got = native.compute_ms_to_idx(t, n_ms)
    want = np.searchsorted(t, np.arange(n_ms, dtype=np.int64) * 1000,
                           side="left")
    np.testing.assert_array_equal(got, want)
    # reference invariant: t[ms_to_idx[ms]] >= ms*1000 > t[ms_to_idx[ms]-1]
    ms = 1234
    i = got[ms]
    assert t[i] >= ms * 1000
    assert i == 0 or t[i - 1] < ms * 1000


def test_slice_windows_matches_searchsorted(stream):
    _, _, t, _ = stream
    bounds = np.arange(0, 5_000_001, 100_000, dtype=np.int64)  # 50 windows
    lo, hi = native.slice_windows(t, bounds)
    idx = np.searchsorted(t, bounds, side="left")
    np.testing.assert_array_equal(lo, idx[:-1])
    np.testing.assert_array_equal(hi, idx[1:])
    # windows tile the stream
    assert lo[0] == np.searchsorted(t, 0)
    np.testing.assert_array_equal(hi[:-1], lo[1:])


def test_pack_window_dsec_dtypes(stream):
    x, y, t, p = stream
    n = 1000
    cap = 1 << 11
    ox, oy, ot, op, valid = native.pack_window(
        x[:n], y[:n], t[:n], p[:n], cap)
    assert valid[:n].all() and not valid[n:].any()
    np.testing.assert_array_equal(ox[:n], x[:n].astype(np.float32))
    np.testing.assert_array_equal(oy[:n], y[:n].astype(np.float32))
    np.testing.assert_array_equal(op[:n], p[:n].astype(np.float32))
    np.testing.assert_array_equal(
        ot[:n], (t[:n] - t[0]).astype(np.float32))
    assert (ox[n:] == 0).all() and (ot[n:] == 0).all()


def test_pack_window_truncates_and_f32_path(stream):
    x, y, t, p = stream
    cap = 512
    n = 1000  # > cap: truncation
    ox, oy, ot, op, valid = native.pack_window(
        x[:n].astype(np.float32), y[:n].astype(np.float32),
        t[:n].astype(np.float32), p[:n].astype(np.float32), cap, t0=0.0)
    assert valid.all()
    np.testing.assert_array_equal(ox, x[:cap].astype(np.float32))
    np.testing.assert_allclose(ot, t[:cap].astype(np.float32))


def test_numpy_fallback_matches_native(stream, monkeypatch):
    x, y, t, p = stream
    n, cap = 300, 512
    want = native.pack_window(x[:n], y[:n], t[:n], p[:n], cap)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    assert not native.available()
    got = native.pack_window(x[:n], y[:n], t[:n], p[:n], cap)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    lo_w, hi_w = native.slice_windows(
        t, np.arange(0, 5_000_001, 500_000, dtype=np.int64))
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)


def test_pack_window_i64_times_generic_path_keeps_resolution():
    """int64 absolute-microsecond stamps with float x must rebase in f64
    BEFORE the f32 narrowing (advisor finding r2): 1 us deltas on a ~2e9 us
    base vanish if t is cast to f32 first."""
    base = 2_000_000_000
    t = base + np.array([0, 1, 2, 5, 10], np.int64)
    n = t.size
    x = np.linspace(0, 10, n).astype(np.float32)  # float x -> generic path
    y = np.linspace(0, 5, n).astype(np.float32)
    p = np.array([0, 1, 0, 1, 1], np.uint8)
    ox, oy, ot, op, valid = native.pack_window(x, y, t, p, cap=8)
    np.testing.assert_array_equal(ot[:n], np.array([0, 1, 2, 5, 10],
                                                   np.float32))


def test_pack_window_signed_polarity_avoids_u16_fast_path():
    """int8 -1/+1 polarities must NOT be reinterpreted through the u16 fast
    path's uint8 cast (-1 -> 255); the generic path preserves the sign."""
    rng = np.random.default_rng(3)
    n = 64
    x = rng.integers(0, 100, n).astype(np.uint16)
    y = rng.integers(0, 80, n).astype(np.uint16)
    t = np.sort(rng.integers(0, 10_000, n)).astype(np.int64)
    p = rng.choice(np.array([-1, 1], np.int8), n)
    ox, oy, ot, op, valid = native.pack_window(x, y, t, p, cap=128)
    np.testing.assert_array_equal(op[:n], p.astype(np.float32))
    assert set(np.unique(op[:n])) <= {-1.0, 1.0}


def _group_key(y, height):
    return np.clip(np.trunc(np.asarray(y, np.float64)), -1, height - 1) + 1


def test_pack_window_sorted_u16_groups_and_pads(stream):
    x, y, t, p = stream
    n, cap, height = 10_000, 16_384, 480
    ox, oy, ot, op, valid = native.pack_window_sorted(
        x[:n], y[:n], t[:n], p[:n], cap, height=height)
    # valid prefix, tail padded with y = height (last group, zero weight)
    assert valid[:n].all() and not valid[n:].any()
    np.testing.assert_array_equal(oy[n:], float(height))
    # row key non-decreasing over the WHOLE buffer (incl. padding)
    key = _group_key(oy, height)
    assert (np.diff(key) >= 0).all()
    # permutation: same multiset of (x, y, t, p) tuples
    want = np.stack([x[:n].astype(np.float32), y[:n].astype(np.float32),
                     (t[:n] - t[0]).astype(np.float32),
                     p[:n].astype(np.float32)])
    got = np.stack([ox[:n], oy[:n], ot[:n], op[:n]])
    order_w = np.lexsort(want[::-1])
    order_g = np.lexsort(got[::-1])
    np.testing.assert_array_equal(want[:, order_w], got[:, order_g])


def test_pack_window_sorted_f32_negative_and_overflow_y():
    # float path: y in (-2, H+2) exercises groups 0 (trunc==-1) and the
    # clipped last group; grouping must match the device key exactly
    rng = np.random.default_rng(3)
    n, cap, height = 5_000, 8_192, 33
    x = rng.uniform(0, 63, n).astype(np.float32)
    y = rng.uniform(-2, height + 2, n).astype(np.float32)
    t = rng.uniform(0, 1, n).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    ox, oy, ot, op, valid = native.pack_window_sorted(
        x, y, t, p, cap, height=height, t0=0.0)
    key = _group_key(oy, height)
    assert (np.diff(key) >= 0).all()
    assert valid[:n].all() and not valid[n:].any()
    # multiset preserved
    np.testing.assert_array_equal(np.sort(oy[:n]), np.sort(y))


def test_pack_window_sorted_numpy_fallback_matches_native(stream, monkeypatch):
    x, y, t, p = stream
    n, cap, height = 3_000, 4_096, 480
    got_nat = native.pack_window_sorted(x[:n], y[:n], t[:n], p[:n], cap,
                                        height=height)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    got_np = native.pack_window_sorted(x[:n], y[:n], t[:n], p[:n], cap,
                                       height=height)
    # both are stable counting sorts by the same key -> identical order
    for a, b in zip(got_nat, got_np):
        np.testing.assert_array_equal(a, b)
