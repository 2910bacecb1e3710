"""Resize semantics vs torch: the reference's final flow upsample uses
F.interpolate without a mode (-> 'nearest'); decoders use bilinear with
align_corners=False."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sdformerflow_tpu.ops.interpolate import resize_bilinear, resize_nearest

import pytest

pytestmark = pytest.mark.smoke


def _rand(h, w, c=3, seed=0):
    return np.random.default_rng(seed).normal(size=(2, h, w, c)).astype(
        np.float32)


def test_nearest_matches_torch_default_interpolate():
    for (h, w), (oh, ow) in [((9, 12), (288, 384)), ((18, 24), (288, 384)),
                             ((7, 5), (21, 20))]:
        x = _rand(h, w)
        got = np.asarray(resize_nearest(jnp.asarray(x), (oh, ow)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.interpolate(xt, scale_factor=(oh / h, ow / w))
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(got, want)


def test_bilinear_matches_torch_align_corners_false():
    x = _rand(10, 14, seed=1)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (20, 28)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, scale_factor=2, mode="bilinear",
                         align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
