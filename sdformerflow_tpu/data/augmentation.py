"""Jittable data augmentation over (events, flow, mask) batches.

The reference augments torch tensors on device with Python RNG
(/root/reference/DSEC_dataloader/data_augmentation.py); here every transform
is a pure function of a PRNG key with static output shapes, so the whole
augmentation pipeline fuses into the jitted train step.

Tensor contracts: events [B, bins, H, W] (or [B, bins, 2, H, W]),
flow [B, 2, H, W], mask [B, 1, H, W]. Flow-vector sign fixes on flips match
data_augmentation.py:228-269.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def center_crop(events, flow, mask, size: Tuple[int, int]):
    h, w = events.shape[-2], events.shape[-1]
    th, tw = size
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    sl = (..., slice(i, i + th), slice(j, j + tw))
    return events[sl], flow[sl], mask[sl]


def random_crop(rng, events, flow, mask, size: Tuple[int, int]):
    """Shared random crop across the batch (static output size)."""
    h, w = events.shape[-2], events.shape[-1]
    th, tw = size
    ri, rj = jax.random.split(rng)
    i = jax.random.randint(ri, (), 0, h - th + 1)
    j = jax.random.randint(rj, (), 0, w - tw + 1)

    def crop(x):
        start = (0,) * (x.ndim - 2) + (i, j)
        sizes = x.shape[:-2] + (th, tw)
        return jax.lax.dynamic_slice(x, start, sizes)

    return crop(events), crop(flow), crop(mask)


def random_hflip(rng, events, flow, mask, p: float = 0.5):
    flip = jax.random.uniform(rng, ()) <= p

    def do(x):
        return jnp.where(flip, jnp.flip(x, axis=-1), x)

    flow_f = jnp.flip(flow, axis=-1).at[:, 0].multiply(-1.0)
    return do(events), jnp.where(flip, flow_f, flow), do(mask)


def random_vflip(rng, events, flow, mask, p: float = 0.5):
    flip = jax.random.uniform(rng, ()) <= p

    def do(x):
        return jnp.where(flip, jnp.flip(x, axis=-2), x)

    flow_f = jnp.flip(flow, axis=-2).at[:, 1].multiply(-1.0)
    return do(events), jnp.where(flip, flow_f, flow), do(mask)


def random_event_drop(rng, events, min_rate=0.0, max_rate=0.6, p=0.5):
    """Randomly zero event-tensor entries with a uniformly drawn drop rate."""
    r_apply, r_rate, r_mask = jax.random.split(rng, 3)
    apply = jax.random.uniform(r_apply, ()) <= p
    q = (min_rate - max_rate) * jax.random.uniform(r_rate, ()) + max_rate
    keep = jax.random.uniform(r_mask, events.shape) > q
    return jnp.where(apply, events * keep, events)


def rotation_flip(rng, events, flow, mask, degrees=(0.0, 0.0),
                  p_hflip=0.5, p_vflip=0.5):
    """Affine rotate+flip with bilinear resampling and flow-vector rotation
    (reference RandomRotationFlip, data_augmentation.py:143-219). Shared
    transform across the batch."""
    ra, rh, rv = jax.random.split(rng, 3)
    angle = jax.random.uniform(ra, (), minval=degrees[0], maxval=degrees[1])
    angle = angle * jnp.pi / 180.0
    c, s = jnp.cos(angle), jnp.sin(angle)
    hflip = jnp.where(jax.random.uniform(rh, ()) < p_hflip, -1.0, 1.0)
    vflip = jnp.where(jax.random.uniform(rv, ()) < p_vflip, -1.0, 1.0)
    # forward matrix in normalized coords (torch affine_grid convention)
    A = jnp.array([[c * hflip, -s * hflip], [s * vflip, c * vflip]])

    h, w = events.shape[-2], events.shape[-1]
    ys = (jnp.arange(h) + 0.5) / h * 2.0 - 1.0
    xs = (jnp.arange(w) + 0.5) / w * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = A[0, 0] * gx + A[0, 1] * gy
    src_y = A[1, 0] * gx + A[1, 1] * gy
    # back to pixel coords
    px = (src_x + 1.0) * w / 2.0 - 0.5
    py = (src_y + 1.0) * h / 2.0 - 0.5

    def sample(img):  # [..., H, W]
        flat = img.reshape(-1, h, w)
        out = jax.vmap(lambda ch: jax.scipy.ndimage.map_coordinates(
            ch, [py, px], order=1, mode="constant"))(flat)
        return out.reshape(img.shape)

    ev = sample(events)
    fl = sample(flow)
    mk = sample(mask.astype(jnp.float32))
    # rotate flow vectors by the inverse transform
    Ainv = jnp.linalg.inv(A)
    vx, vy = fl[:, 0], fl[:, 1]
    fl = fl.at[:, 0].set(Ainv[0, 0] * vx + Ainv[0, 1] * vy)
    fl = fl.at[:, 1].set(Ainv[1, 0] * vx + Ainv[1, 1] * vy)
    return ev, fl, mk


def downsample_data(arrays, scale_factor: float):
    """Bilinearly downscale a tuple of [..., C, H, W] tensors (reference
    downsample_data, data_augmentation.py:291-298)."""
    from ..ops.interpolate import resize_bilinear
    out = []
    for a in arrays:
        h = int(a.shape[-2] * scale_factor)
        w = int(a.shape[-1] * scale_factor)
        chl = jnp.moveaxis(a, -3, -1)  # channels-last for resize
        res = resize_bilinear(chl, (h, w))
        out.append(jnp.moveaxis(res, -1, -3))
    return tuple(out)


def build_train_augmentation(augment_names, augment_prob, crop=None,
                             max_drop_rate=0.6, rotation_degrees=(0.0, 0.0)):
    """Compose the reference's configured train transforms into one jittable
    fn(rng, events, flow, mask). Config parity: loader.augment /
    loader.augment_prob (e.g. ["Horizontal", "Vertical", "Polarity"]).

    A "Rotation" entry maps to :func:`rotation_flip` (the reference's
    RandomRotationFlip, data_augmentation.py:143-219 — dormant there: only
    commented-out driver lines and a __main__ smoke block construct it); its
    augment_prob entry supplies p_hflip, ``rotation_degrees`` (config key
    loader.rotation_degrees) the angle range. Rotation runs BEFORE the crop,
    matching the reference composition order (DSEC_dataset_lite.py:147-151).
    """
    names = [n.lower() for n in (augment_names or [])]
    probs = list(augment_prob or [])

    def apply(rng, events, flow, mask):
        keys = jax.random.split(rng, 5)
        for i, n in enumerate(names):
            if n.startswith("rotation"):
                p = probs[i] if i < len(probs) else 0.5
                events, flow, mask = rotation_flip(
                    keys[4], events, flow, mask,
                    degrees=tuple(rotation_degrees),
                    p_hflip=p, p_vflip=p)
        if crop is not None:
            events, flow, mask = random_crop(keys[0], events, flow, mask,
                                             tuple(crop))
        for i, n in enumerate(names):
            p = probs[i] if i < len(probs) else 0.5
            if n.startswith("horizontal"):
                events, flow, mask = random_hflip(keys[1], events, flow,
                                                  mask, p)
            elif n.startswith("vertical"):
                events, flow, mask = random_vflip(keys[2], events, flow,
                                                  mask, p)
            elif n.startswith("polarity") and p > 0:
                # polarity flip: negate signed voxel values
                flip = jax.random.uniform(keys[3], ()) <= p
                events = jnp.where(flip, -events, events)
            elif n.startswith("drop"):
                events = random_event_drop(keys[3], events,
                                           max_rate=max_drop_rate, p=p)
        return events, flow, mask

    return apply
