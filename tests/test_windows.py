import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.ops import windows
from sdformerflow_tpu.ops.normalization import (
    normalize_nonzero_minmax, polarity_split, spike_binarize)


def test_window_partition_reverse_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 18, 18, 8)).astype(np.float32))
    ws = (2, 9, 9)
    wins = windows.window_partition(x, ws)
    assert wins.shape == (2 * 2 * 2 * 2, 2 * 9 * 9, 8)
    back = windows.window_reverse(wins, ws, 2, 4, 18, 18)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_v2_time_axis():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 9, 9, 3)).astype(np.float32))
    ws = (2, 9, 9)
    wins = windows.window_partition_v2(x, ws)
    assert wins.shape == (2, 2, 9, 9, 3)  # wd, B*nW, wh, ww, C
    # temporal slice 0 of window 0 is depth slice 0 of the input
    np.testing.assert_array_equal(np.asarray(wins[0, 0]), np.asarray(x[0, 0]))
    np.testing.assert_array_equal(np.asarray(wins[1, 1]), np.asarray(x[0, 3]))


def test_compute_mask_zero_shift_all_visible():
    m = windows.compute_mask(2, 18, 18, (2, 9, 9), (1, 4, 4))
    assert m.shape == (4, 162, 162)
    # mask entries are either 0 or -100
    vals = set(np.unique(np.asarray(m)))
    assert vals <= {0.0, -100.0}
    # some masking must occur for shifted windows
    assert (np.asarray(m) == -100.0).any()


def test_get_window_size_clamps():
    ws, ss = windows.get_window_size((1, 8, 8), (2, 9, 9), (1, 4, 4))
    assert ws == (1, 8, 8)
    assert ss == (0, 0, 0)


def test_relative_position_index_range():
    idx = windows.relative_position_index((2, 3, 3))
    n = 2 * 3 * 3
    assert idx.shape == (n, n)
    assert idx.min() >= 0
    assert idx.max() < (2 * 2 - 1) * (2 * 3 - 1) * (2 * 3 - 1)


def test_polarity_split_and_minmax():
    x = jnp.asarray([[[[1.0, -2.0], [0.0, 4.0]]]])  # [B=1, bins=1, H=2, W=2]
    s = polarity_split(x)
    assert s.shape == (1, 1, 2, 2, 2)
    np.testing.assert_array_equal(np.asarray(s[0, 0, 0]), [[1, 0], [0, 4]])
    np.testing.assert_array_equal(np.asarray(s[0, 0, 1]), [[0, 2], [0, 0]])
    normed = normalize_nonzero_minmax(s)
    nz = np.asarray(normed)[np.asarray(s) != 0]
    assert nz.min() == 0.0 and nz.max() == 1.0
    # zeros untouched
    assert np.asarray(normed)[np.asarray(s) == 0].sum() == 0.0


def test_spike_binarize_keeps_threshold_values():
    x = jnp.asarray([0.05, 0.1, 0.2])
    out = np.asarray(spike_binarize(x, 0.1))
    np.testing.assert_allclose(out, [0.0, 0.1, 1.0])
