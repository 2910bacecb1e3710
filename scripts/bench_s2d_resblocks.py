"""Probe: does block space also pay for the embed's MS resblocks + PED?

The head segment won 1.29x at C in {2,48} -> {8,192} (bench_s2d_embed.py).
The remaining full-embed segment runs at [10,B,144,192,96] (lane occupancy
96/128): 2 MS resblocks (spike->conv3x3->affine, x2, ADD shortcut) + PED
(1x1 s2 conv residual + spike->3x3 s2 conv->affine). In block space those
become [10,B,72,96,384] (384 = 3x128 lanes exact) with 4x conv FLOPs for
the stride-1 convs; the PED convs exit block space (2x2 s1 / block-slice
1x1). Measures both forms, eval-mode affine BN, PSN spike.

Run on the TPU chip:  python scripts/bench_s2d_resblocks.py
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

from sdformerflow_tpu.ops.s2d import (space_to_depth, s2d_kernel_s1,
                                      s2d_kernel_s2, tile4)
from sdformerflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

T, B, H, W, C = 10, 1, 144, 192, 96
DTYPE = jnp.bfloat16


def conv(x, w, stride, pad):
    lead = x.shape[:-3]
    xr = x.reshape((-1,) + x.shape[-3:])
    y = jax.lax.conv_general_dilated(
        xr, w.astype(x.dtype), window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(lead + y.shape[-3:])


def psn_spike(y, wp, bp):
    nd = y.ndim
    perm_in = tuple(range(1, nd - 1)) + (0, nd - 1)
    ym = jnp.transpose(y, perm_in)
    hm = jnp.einsum("ts,...sc->...tc", wp.astype(y.dtype), ym) + bp.reshape(
        (y.shape[0], 1)).astype(y.dtype)
    perm_out = (nd - 2,) + tuple(range(0, nd - 2)) + (nd - 1,)
    h = jnp.transpose(hm, perm_out)
    return (h >= 0).astype(y.dtype)


def s2d_kernel_1x1_s2(w):
    """[1,1,ci,co] stride-2 conv -> [1,1,4ci,co] block-space conv reading
    only the (bi=0,bj=0) block channel group."""
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.zeros((1, 1, 4 * ci, co), w.dtype)
    return wp.at[0, 0, :ci, :].set(w[0, 0])


def resblock(x, p, i):
    idn = x
    s = psn_spike(x, p["wp"], p["bp"])
    y = conv(s, p[f"rw{i}a"], 1, ((1, 1), (1, 1))) * p[f"ra{i}a"] + p[f"rb{i}a"]
    s = psn_spike(y, p["wp"], p["bp"])
    y = conv(s, p[f"rw{i}b"], 1, ((1, 1), (1, 1))) * p[f"ra{i}b"] + p[f"rb{i}b"]
    return y + idn


def segment_base(x, p):
    for i in range(2):
        x = resblock(x, p, i)
    # PED
    x_res = conv(x, p["pw_res"], 2, ((0, 0), (0, 0)))
    s = psn_spike(x, p["wp"], p["bp"])
    y = conv(s, p["pw"], 2, ((1, 1), (1, 1))) * p["pa"] + p["pb"]
    return y + x_res


def resblock_s2d(x, p, i):
    idn = x
    s = psn_spike(x, p["wp"], p["bp"])
    y = conv(s, p[f"rw{i}a_s"], 1, ((1, 1), (1, 1))) * p[f"ra{i}a_s"] + p[f"rb{i}a_s"]
    s = psn_spike(y, p["wp"], p["bp"])
    y = conv(s, p[f"rw{i}b_s"], 1, ((1, 1), (1, 1))) * p[f"ra{i}b_s"] + p[f"rb{i}b_s"]
    return y + idn


def segment_s2d(x, p):
    x = space_to_depth(x)
    for i in range(2):
        x = resblock_s2d(x, p, i)
    x_res = conv(x, p["pw_res_s"], 1, ((0, 0), (0, 0)))
    s = psn_spike(x, p["wp"], p["bp"])
    y = conv(s, p["pw_s"], 1, ((1, 0), (1, 0))) * p["pa"] + p["pb"]
    return y + x_res


def make_params(rng):
    p = {"wp": jnp.asarray(rng.normal(size=(T, T)) * 0.3, jnp.float32),
         "bp": jnp.asarray(rng.normal(size=(T,)) * 0.5 - 0.5, jnp.float32)}
    for i in range(2):
        for tag in "ab":
            p[f"rw{i}{tag}"] = jnp.asarray(
                rng.normal(size=(3, 3, C, C)) * 0.05, jnp.float32)
            p[f"ra{i}{tag}"] = jnp.asarray(
                rng.normal(size=(C,)) * 0.2 + 1.0, jnp.float32)
            p[f"rb{i}{tag}"] = jnp.asarray(
                rng.normal(size=(C,)) * 0.1, jnp.float32)
            p[f"rw{i}{tag}_s"] = s2d_kernel_s1(p[f"rw{i}{tag}"])
            p[f"ra{i}{tag}_s"] = tile4(p[f"ra{i}{tag}"])
            p[f"rb{i}{tag}_s"] = tile4(p[f"rb{i}{tag}"])
    p["pw_res"] = jnp.asarray(rng.normal(size=(1, 1, C, C)) * 0.1, jnp.float32)
    p["pw"] = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.float32)
    p["pa"] = jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0, jnp.float32)
    p["pb"] = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    p["pw_res_s"] = s2d_kernel_1x1_s2(p["pw_res"])
    p["pw_s"] = s2d_kernel_s2(p["pw"])
    return p


def time_chained(fn, x, p, iters=20, repeats=5, tag=""):
    f = jax.jit(lambda z: fn(z, p))
    y = f(x)
    np.asarray(jax.device_get(y[0, 0, 0, 0, :4]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        z = x
        for _ in range(iters):
            z = x + f(z)[0, 0, 0, 0, 0].astype(x.dtype)
        np.asarray(jax.device_get(z[0, 0, 0, 0, :4]))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    med = statistics.median(ts)
    print(f"{tag:40s} {med:7.2f} ms")
    return med


def main():
    rng = np.random.default_rng(0)
    p = make_params(rng)
    x = jnp.asarray(rng.normal(size=(T, B, H, W, C)) * 0.5, jnp.float32)

    ref = jax.jit(segment_base)(x, p)
    got = jax.jit(segment_s2d)(x, p)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"s2d rel err vs baseline (f32): {err:.2e}")

    xb = x.astype(DTYPE)
    pb = jax.tree.map(lambda v: v.astype(DTYPE), p)
    t0 = time_chained(segment_base, xb, pb,
                      tag="baseline resblocks+PED (C=96 @144x192)")
    t1 = time_chained(segment_s2d, xb, pb,
                      tag="s2d resblocks+PED (C=384 @72x96)")
    print(f"speedup: {t0 / t1:.2f}x")


if __name__ == "__main__":
    main()
