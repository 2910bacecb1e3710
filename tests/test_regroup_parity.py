"""sfn/chunk regroup parity against torch re-implementations of the
reference's loops (Spiking_modules.py:1139-1154 and :1285-1293)."""

import numpy as np
import jax.numpy as jnp
import torch

from sdformerflow_tpu.models.spiking_patch_embed import (chunk_regroup,
                                                         sfn_regroup)

import pytest

pytestmark = pytest.mark.smoke


def _torch_sfn(x, num_steps):
    # reference: event_reprs [B, bins, 2, H, W] -> permute(0,2,3,4,1);
    # new[:, i] = event_reprs[:, i % 2, :, :, (i//2)*T:(i//2+1)*T]
    ev = x.permute(0, 2, 3, 4, 1)
    B, P, H, W, bins = ev.shape
    num_ch = bins * 2 // num_steps
    new = torch.zeros(B, num_ch, H, W, num_steps, dtype=x.dtype)
    for i in range(num_ch):
        s, e = i // 2 * num_steps, (i // 2 + 1) * num_steps
        new[:, i] = ev[:, i % 2, :, :, s:e]
    return new.permute(4, 0, 1, 2, 3)  # [T, B, C, H, W]


def _torch_chunk(x, num_steps):
    # reference: x.view(B, -1, H, W).chunk(T, 1) -> stack -> [T, B, C, H, W]
    x = x.reshape(x.shape[0], -1, x.shape[3], x.shape[4])
    xs = x.chunk(num_steps, 1)
    return torch.stack(list(xs), dim=1).permute(1, 0, 2, 3, 4)


def test_sfn_regroup_matches_reference():
    for bins, T in [(10, 10), (10, 5), (20, 10)]:
        x = torch.from_numpy(
            np.random.default_rng(0).normal(size=(2, bins, 2, 6, 8))
            .astype(np.float32))
        want = _torch_sfn(x, T).numpy()  # [T, B, C, H, W]
        got = np.asarray(sfn_regroup(jnp.asarray(x.numpy()), T))
        # ours is channels-last [T, B, H, W, C]
        np.testing.assert_array_equal(got.transpose(0, 1, 4, 2, 3), want)


def test_chunk_regroup_matches_reference():
    for bins, T in [(10, 10), (10, 5)]:
        x = torch.from_numpy(
            np.random.default_rng(1).normal(size=(2, bins, 2, 6, 8))
            .astype(np.float32))
        want = _torch_chunk(x, T).numpy()
        got = np.asarray(chunk_regroup(jnp.asarray(x.numpy()), T))
        np.testing.assert_array_equal(got.transpose(0, 1, 4, 2, 3), want)
