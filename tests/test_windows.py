import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.ops import windows
from sdformerflow_tpu.ops.normalization import (
    normalize_nonzero_minmax, polarity_split, spike_binarize)

import pytest

pytestmark = pytest.mark.smoke


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


def test_window_partition_v2_tm_matches_batch_major():
    """The time-major partition must reproduce the reference's raw-refold
    element mapping EXACTLY (Spiking_swin_transformer3D.py:100-113): the
    leading "time" axis regroups the row-major ravel of
    (B, nD, nH, nW, wd, wh, ww, C), it is NOT the clean window-time axis.
    A clean fold passes shape checks and even full-model PSN parity, but
    breaks stateful-neuron (IF/LIF) parity — this locks the quirk."""
    from sdformerflow_tpu.ops.windows import (window_partition_v2,
                                              window_partition_v2_tm,
                                              window_reverse_tm)
    B, D, H, Wd, C = 2, 10, 6, 12, 4
    ws = (2, 3, 3)
    x = jnp.arange(B * D * H * Wd * C, dtype=jnp.float32).reshape(
        B, D, H, Wd, C)
    x_tm = x.transpose(1, 0, 2, 3, 4)
    old = np.asarray(window_partition_v2(x, ws))
    new = np.asarray(window_partition_v2_tm(x_tm, ws))
    np.testing.assert_array_equal(old, new)
    # reverse_tm inverts partition (+ the raw (B_, N, C) fold the reference
    # applies to the attention output) back to time-major features
    rt = np.asarray(window_reverse_tm(jnp.asarray(new), ws, B, D, H, Wd))
    np.testing.assert_array_equal(rt, np.asarray(x_tm))
