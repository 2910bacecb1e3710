"""Space-to-depth (block 2) re-expression of the full-resolution embed head.

The flagship embed (models/spiking_patch_embed.py:MSPEDSpikingPatchEmbedConvSfn,
parity: /root/reference/models/STSwinNet_SNN/Spiking_modules.py:1710-1837) runs

    conv 2->48 (s1) -> BN -> PSN -> heaviside -> conv 48->96 (s2) -> BN

at the full input resolution (288x384 for the DSEC eval protocol). On
(8,128)-tiled TPU memory the C=48 tensors either pad lanes 48->128 (2.67x
physical traffic) or force relayout copies around the neuron site — the
1.05 ms pred copy + 0.62 ms bf16 twin in the round-2/3 profiles
(PERF_NOTES.md). Space-to-depth relabels 2x2 pixel blocks into channels,
``[T, B, H, W, C] -> [T, B, H/2, W/2, 4C]``, so the same segment runs at
C in {8, 192} (lane pad 256/192 = 1.33x) and C stays on lanes for both the
convs and the elementwise chain. The transform is EXACT — a rearrangement
of weights, not an approximation:

- stride-1 3x3 conv  -> 3x3 conv in block space, kernel [3, 3, 4ci, 4co]
  with structured zeros: original tap row r = di + ki - 1 lands in block
  offset Ki = floor(r/2) + 1, intra-block row bi = r mod 2.
- stride-2 3x3 conv  -> stride-1 2x2 conv consuming the s2d tensor and
  emitting the half-resolution output in NORMAL layout (the natural exit
  from block space): ki = 2*Ki + bi - 1, asymmetric padding (1, 0).
- BN affine / conv bias: per-channel -> tile by 4 (block-major channel
  order).
- PSN / heaviside / any per-element op: unchanged (pixels were relabeled,
  not mixed).

Channel order convention everywhere: s2d channel index = (bi*2 + bj)*C + c.

The VARIABLE-TRANSFORM flavor (cfg.s2d_embed, training/s2d_embed.py) is
eval-only: train-mode BN would compute batch statistics per s2d channel.
The re-reduction that fixes this — per-block-channel moments combined
exactly across the 4 equal-count block positions — is implemented by the
train-capable flavor (cfg.s2d_train, models/spiking_patch_embed.py
``_S2DBlockBatchNorm``), which instead keeps reference-shaped parameters
and expands them inside apply; see tests/test_s2d_train.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x):
    """[..., H, W, C] -> [..., H//2, W//2, 4C], channel order (bi, bj, c)."""
    *lead, H, W, C = x.shape
    x = x.reshape(tuple(lead) + (H // 2, 2, W // 2, 2, C))
    # [..., h, bi, w, bj, c] -> [..., h, w, bi, bj, c]
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(tuple(lead) + (H // 2, W // 2, 4 * C))


def depth_to_space(x):
    """Inverse of space_to_depth."""
    *lead, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(tuple(lead) + (H, W, 2, 2, C))
    x = jnp.moveaxis(x, -3, -4)  # [..., h, bi, w, bj, c]
    return x.reshape(tuple(lead) + (H * 2, W * 2, C))


def s2d_kernel_s1(w):
    """[3,3,ci,co] stride-1 SAME kernel -> [3,3,4ci,4co] block-space kernel.

    conv(x, w, s=1, SAME) followed by space_to_depth equals
    conv(space_to_depth(x), s2d_kernel_s1(w), s=1, SAME).
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, "embed-head transform is for 3x3 kernels"
    wp = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for ki in range(3):
                for kj in range(3):
                    ri, rj = di + ki - 1, dj + kj - 1
                    Ki, bi = ri // 2 + 1, ri % 2
                    Kj, bj = rj // 2 + 1, rj % 2
                    ic, oc = (bi * 2 + bj) * ci, (di * 2 + dj) * co
                    wp = wp.at[Ki, Kj, ic:ic + ci, oc:oc + co].set(w[ki, kj])
    return wp


def s2d_kernel_s2(w):
    """[3,3,ci,co] stride-2 pad-1 kernel -> [2,2,4ci,co] block-space kernel.

    conv(x, w, s=2, pad 1) equals conv(space_to_depth(x), s2d_kernel_s2(w),
    s=1, padding ((1,0),(1,0))) — output in NORMAL half-resolution layout.
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3
    wp = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for Ki in (0, 1):
        for Kj in (0, 1):
            for bi in (0, 1):
                for bj in (0, 1):
                    ki, kj = 2 * Ki + bi - 1, 2 * Kj + bj - 1
                    if not (0 <= ki < 3 and 0 <= kj < 3):
                        continue
                    ic = (bi * 2 + bj) * ci
                    wp = wp.at[Ki, Kj, ic:ic + ci, :].set(w[ki, kj])
    return wp


def tile4(v):
    """Per-channel vector [C] -> [4C] matching the (block, c) channel order."""
    return jnp.tile(v, 4)
