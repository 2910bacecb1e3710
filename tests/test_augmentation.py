"""Augmentation pipeline tests: rotation_flip semantics + config wiring.

Reference: /root/reference/DSEC_dataloader/data_augmentation.py:143-219
(RandomRotationFlip — affine grid_sample + flow-vector rotation by the
inverse transform).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.data.augmentation import (build_train_augmentation,
                                                rotation_flip)

import pytest

pytestmark = pytest.mark.smoke


def _data(rng, b=2, bins=4, h=8, w=12):
    k1, k2 = jax.random.split(jax.random.PRNGKey(rng))
    events = jax.random.normal(k1, (b, bins, h, w))
    flow = jax.random.normal(k2, (b, 2, h, w))
    mask = jnp.ones((b, 1, h, w))
    return events, flow, mask


def test_rotation_identity_when_zero_degrees_no_flip():
    events, flow, mask = _data(0)
    ev, fl, mk = rotation_flip(jax.random.PRNGKey(1), events, flow, mask,
                               degrees=(0.0, 0.0), p_hflip=0.0, p_vflip=0.0)
    np.testing.assert_allclose(ev, events, atol=1e-5)
    np.testing.assert_allclose(fl, flow, atol=1e-5)
    np.testing.assert_allclose(mk, mask, atol=1e-5)


def test_rotation_pure_hflip_matches_mirror_and_negates_flow_x():
    events, flow, mask = _data(1)
    ev, fl, _ = rotation_flip(jax.random.PRNGKey(2), events, flow, mask,
                              degrees=(0.0, 0.0), p_hflip=1.0, p_vflip=0.0)
    np.testing.assert_allclose(ev, jnp.flip(events, axis=-1), atol=1e-5)
    # flow field mirrored in x; x-component negated (inverse-transform rotate)
    exp = jnp.flip(flow, axis=-1).at[:, 0].multiply(-1.0)
    np.testing.assert_allclose(fl, exp, atol=1e-5)


def test_rotation_pure_vflip_matches_mirror_and_negates_flow_y():
    events, flow, mask = _data(2)
    ev, fl, _ = rotation_flip(jax.random.PRNGKey(3), events, flow, mask,
                              degrees=(0.0, 0.0), p_hflip=0.0, p_vflip=1.0)
    np.testing.assert_allclose(ev, jnp.flip(events, axis=-2), atol=1e-5)
    exp = jnp.flip(flow, axis=-2).at[:, 1].multiply(-1.0)
    np.testing.assert_allclose(fl, exp, atol=1e-5)


def test_build_train_augmentation_wires_rotation():
    """A "Rotation" augment name reaches rotation_flip (VERDICT r1 #6)."""
    events, flow, mask = _data(3)
    aug = build_train_augmentation(["Rotation"], [1.0],
                                   rotation_degrees=(0.0, 0.0))
    ev, fl, mk = jax.jit(aug)(jax.random.PRNGKey(4), events, flow, mask)
    # p=1.0: both flips applied deterministically (angle fixed at 0)
    np.testing.assert_allclose(
        ev, jnp.flip(events, axis=(-1, -2)), atol=1e-5)
    exp = jnp.flip(flow, axis=(-1, -2)) * jnp.array(
        [-1.0, -1.0]).reshape(1, 2, 1, 1)
    np.testing.assert_allclose(fl, exp, atol=1e-5)
    assert mk.shape == mask.shape


def test_build_train_augmentation_rotation_composes_with_crop():
    events, flow, mask = _data(4, h=12, w=16)
    aug = build_train_augmentation(["Rotation", "Horizontal"], [0.0, 0.0],
                                   crop=(8, 8), rotation_degrees=(-10.0, 10.0))
    ev, fl, mk = jax.jit(aug)(jax.random.PRNGKey(5), events, flow, mask)
    assert ev.shape == (2, 4, 8, 8)
    assert fl.shape == (2, 2, 8, 8)
    assert mk.shape == (2, 1, 8, 8)
    assert np.isfinite(np.asarray(ev)).all()
