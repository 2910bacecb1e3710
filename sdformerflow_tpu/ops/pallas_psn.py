"""Pallas TPU kernel: fused [affine -> PSN time-matmul -> heaviside spike].

The PSN neuron is ``spike = H(W[T,T] @ X[T, N] + b[T])`` over flattened time
(ops/neurons.py:psn_neuron). At every neuron site the input X is a BatchNorm
output, so the inference chain is affine -> tiny-matmul-over-T -> heaviside,
three elementwise/matmul passes over a tensor that can exceed 100 MB at
T=10. This kernel fuses them into one VMEM-resident pass per tile: X is read
once from HBM, the (T x T) weight stays in registers/SMEM-scale VMEM, and
only the 0/1 spikes are written back.

Backward (custom VJP) recomputes h in-kernel (W is tiny, recompute is free)
and emits dX = W^T @ (g * sg'(h)) in a second fused pass; dW/db are reduced
with XLA (they are [T,T]/[T] — negligible).

Layout: X as [T, N] with N a multiple of 128 (caller pads); tiles are
(T, BLOCK_N). T <= 16 keeps a tile within one sublane group for f32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 2048


def _fwd_kernel(w_ref, b_ref, scale_ref, bias_ref, x_ref, out_ref, *,
                alpha: float):
    x = x_ref[:]                                  # (T, BLOCK_N)
    x = x * scale_ref[:] + bias_ref[:]            # fused affine (BN inference)
    h = jnp.dot(w_ref[:], x, preferred_element_type=jnp.float32)
    h = h + b_ref[:]
    out_ref[:] = (h >= 0.0).astype(out_ref.dtype)


def _bwd_kernel(w_ref, b_ref, scale_ref, bias_ref, x_ref, g_ref, dx_ref,
                gh_ref, *, alpha: float):
    x = x_ref[:]
    xa = x * scale_ref[:] + bias_ref[:]
    h = jnp.dot(w_ref[:], xa, preferred_element_type=jnp.float32) + b_ref[:]
    sg = alpha / 2.0 / (1.0 + (math.pi / 2.0 * alpha * h) ** 2)  # ATan'
    gh = g_ref[:] * sg
    gh_ref[:] = gh
    # dX (pre-affine): W^T @ gh, then through the affine scale
    dxa = jnp.dot(w_ref[:].T, gh, preferred_element_type=jnp.float32)
    dx_ref[:] = dxa * scale_ref[:]


def _pad_n(x, block):
    n = x.shape[1]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_affine_psn(x, weight, bias, scale, shift, alpha=2.0):
    """spike = H(W @ (x * scale + shift) + b).

    x: [T, N]; weight: [T, T]; bias: [T, 1]; scale/shift: [1, N] or
    broadcastable (pass jnp.ones/zeros to skip the affine).
    """
    return _fused_fwd_impl(x, weight, bias, scale, shift, alpha)


def _fused_fwd_impl(x, weight, bias, scale, shift, alpha):
    T, n = x.shape
    xp, n_orig = _pad_n(x, BLOCK_N)
    scale_b = jnp.broadcast_to(scale, x.shape)
    shift_b = jnp.broadcast_to(shift, x.shape)
    sp, _ = _pad_n(scale_b, BLOCK_N)
    fp, _ = _pad_n(shift_b, BLOCK_N)
    grid = (xp.shape[1] // BLOCK_N,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, alpha=alpha),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(weight, bias.reshape(T, 1), sp, fp, xp)
    return out[:, :n_orig]


def _fused_fwd(x, weight, bias, scale, shift, alpha):
    out = _fused_fwd_impl(x, weight, bias, scale, shift, alpha)
    return out, (x, weight, bias, scale, shift)


def _fused_bwd(alpha, residuals, g):
    x, weight, bias, scale, shift = residuals
    T, n = x.shape
    xp, n_orig = _pad_n(x, BLOCK_N)
    gp, _ = _pad_n(g, BLOCK_N)
    scale_b = jnp.broadcast_to(scale, x.shape)
    shift_b = jnp.broadcast_to(shift, x.shape)
    sp, _ = _pad_n(scale_b, BLOCK_N)
    fp, _ = _pad_n(shift_b, BLOCK_N)
    grid = (xp.shape[1] // BLOCK_N,)
    dx_p, gh_p = pl.pallas_call(
        functools.partial(_bwd_kernel, alpha=alpha),
        out_shape=(jax.ShapeDtypeStruct(xp.shape, x.dtype),
                   jax.ShapeDtypeStruct(xp.shape, jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((T, BLOCK_N), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(weight, bias.reshape(T, 1), sp, fp, xp, gp)
    dx = dx_p[:, :n_orig]
    gh = gh_p[:, :n_orig]
    # small reductions outside the kernel
    xa = x * scale_b + shift_b
    dw = gh @ xa.T                       # [T, T]
    db = gh.sum(axis=1, keepdims=True)   # [T, 1]
    dscale = jnp.sum((weight.T @ gh) * x, axis=0, keepdims=True)
    dshift = jnp.sum(weight.T @ gh, axis=0, keepdims=True)
    # reduce dscale/dshift to the original broadcast shapes
    def _unbroadcast(grad, shape):
        if grad.shape == shape:
            return grad
        axes = tuple(i for i, (g_, s_) in enumerate(zip(grad.shape, shape))
                     if s_ == 1 and g_ != 1)
        out = grad.sum(axis=axes, keepdims=True)
        return out.reshape(shape)
    return (dx, dw, db.reshape(bias.shape),
            _unbroadcast(dscale, scale.shape),
            _unbroadcast(dshift, shift.shape))


fused_affine_psn.defvjp(_fused_fwd, _fused_bwd)


def psn_spike(x_seq, weight, bias, *, alpha=2.0, scale=None, shift=None):
    """Drop-in PSN over [T, ...] arrays using the fused Pallas kernel.

    ``scale``/``shift`` optionally fold a per-channel affine (inference BN)
    into the same pass; they must broadcast against the flattened [T, N]
    view's N axis layout, so pass full [T, N]-broadcastable arrays.
    """
    T = x_seq.shape[0]
    x = x_seq.reshape(T, -1)
    one = jnp.ones((1, 1), x.dtype) if scale is None else scale
    zero = jnp.zeros((1, 1), x.dtype) if shift is None else shift
    out = fused_affine_psn(x, weight, bias, one, zero, alpha)
    return out.reshape(x_seq.shape)


# ---------------------------------------------------------------------------
# v2 (round 2): layout-native [T, M, C] kernel. MEASURED NEGATIVE RESULT:
# 3.5 ms standalone vs 1.4 ms XLA at the head-site shape, and the full
# patch embed REGRESSES 7.75 -> 11.4 ms with it integrated — the unrolled
# T^2 FMA loop is VPU-bound (~100 vector passes per block) while XLA's
# einsum lowering uses the MXU. A winning kernel would need the MXU for
# the T-mix on native-layout blocks, which Mosaic's 2-D dot constraint
# blocks (rank-3 contraction over the leading axis / in-kernel
# sublane-lane merges are unsupported). Kept off every default path;
# see PERF_NOTES.md.

import numpy as _np


def _psn_tm_kernel(w_ref, b_ref, x_ref, o_ref, *, T: int):
    x = x_ref[...]                                   # [T, bm, bc] f32/bf16
    xf = x.astype(jnp.float32)
    for t in range(T):
        h = b_ref[t, 0]
        acc = None
        for s in range(T):
            term = xf[s] * w_ref[t, s]
            acc = term if acc is None else acc + term
        h = acc + h
        o_ref[t] = (h >= 0.0).astype(o_ref.dtype)


def psn_spike_tm(x_seq, weight, bias, *, block_m=512, block_c=None):
    """PSN + heaviside over time-major [T, ..., C] without relayouts.

    Blocks the [T, M, C] view on (M, C); each block computes the [T, T]
    time-mix with an unrolled FMA loop (T <= 16) and writes 0/1 spikes in
    the input's dtype/layout. Falls back to the XLA einsum when the
    geometry does not block evenly.
    """
    T = x_seq.shape[0]
    C = x_seq.shape[-1]
    mid = x_seq.shape[1:-1]
    M = int(_np.prod(mid)) if mid else 1
    if block_c is None:
        block_c = C if C * block_m * T * 4 * 2 <= (8 << 20) else 128
    if M % block_m or C % block_c:
        # fallback: XLA path (ops/neurons.psn_neuron)
        from . import neurons
        return neurons.psn_neuron(x_seq, weight, bias)

    x = x_seq.reshape(T, M, C)
    grid = (M // block_m, C // block_c)
    out = pl.pallas_call(
        functools.partial(_psn_tm_kernel, T=T),
        out_shape=jax.ShapeDtypeStruct((T, M, C), x_seq.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, T), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, block_m, block_c), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, block_m, block_c), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
    )(weight.astype(jnp.float32), bias.reshape(T, 1).astype(jnp.float32), x)
    return out.reshape(x_seq.shape)
