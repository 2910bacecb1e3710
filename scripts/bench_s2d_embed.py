"""Space-to-depth probe for the full-resolution embed head segment.

Question: the round-3 profile pins ~3-5 ms of the 17.8 ms eval forward on
the structural layout tax of C=48 at 288x384 (lane pad 2.67x or relayout
copies around the head PSN site). Does re-expressing the segment in
space-to-depth block space (C in {8,192} at 144x192, ops/s2d.py — an EXACT
weight rearrangement) beat XLA's own layout choices?

Segment (flagship MSPEDSpikingPatchEmbedConvSfn front, eval-mode BN as a
folded affine):  conv 2->48 s1 -> affine -> PSN -> heaviside ->
conv 48->96 s2 -> affine.   Baseline at [T,10,288,384,*]; s2d at
[T,10,144,192,*] with transformed kernels.

Run on the TPU chip:  python scripts/bench_s2d_embed.py
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

T, B, H, W = 10, 1, 288, 384
C0, C1, C2 = 2, 48, 96
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


def segment_base(x, p):
    y = conv(x, p["w1"], 1, ((1, 1), (1, 1)))
    y = y * p["a1"] + p["b1"]
    s = psn_spike(y, p["wp"], p["bp"])
    z = conv(s, p["w2"], 2, ((1, 1), (1, 1)))
    return z * p["a2"] + p["b2"]


def segment_s2d(x, p):
    xs = space_to_depth(x)
    y = conv(xs, p["w1s"], 1, ((1, 1), (1, 1)))
    y = y * p["a1s"] + p["b1s"]
    s = psn_spike(y, p["wp"], p["bp"])
    z = conv(s, p["w2s"], 1, ((1, 0), (1, 0)))
    return z * p["a2"] + p["b2"]


def make_params(rng):
    p = {
        "w1": jnp.asarray(rng.normal(size=(3, 3, C0, C1)) * 0.3, jnp.float32),
        "a1": jnp.asarray(rng.normal(size=(C1,)) * 0.2 + 1.0, jnp.float32),
        "b1": jnp.asarray(rng.normal(size=(C1,)) * 0.1, jnp.float32),
        "wp": jnp.asarray(rng.normal(size=(T, T)) * 0.3, jnp.float32),
        "bp": jnp.asarray(rng.normal(size=(T,)) * 0.5 - 0.5, jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(3, 3, C1, C2)) * 0.1, jnp.float32),
        "a2": jnp.asarray(rng.normal(size=(C2,)) * 0.2 + 1.0, jnp.float32),
        "b2": jnp.asarray(rng.normal(size=(C2,)) * 0.1, jnp.float32),
    }
    p["w1s"] = s2d_kernel_s1(p["w1"])
    p["a1s"] = tile4(p["a1"])
    p["b1s"] = tile4(p["b1"])
    p["w2s"] = s2d_kernel_s2(p["w2"])
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
            # serialize via a scalar data dependency (shapes differ)
            z = x + f(z)[0, 0, 0, 0, 0].astype(x.dtype)
        np.asarray(jax.device_get(z[0, 0, 0, 0, :4]))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    med = statistics.median(ts)
    print(f"{tag:34s} {med:7.2f} ms")
    return med


def main():
    rng = np.random.default_rng(0)
    p = make_params(rng)
    x = jnp.asarray(rng.normal(size=(T, B, H, W, C0)), jnp.float32)

    ref = jax.jit(segment_base)(x, p)
    got = jax.jit(segment_s2d)(x, p)
    err = float(jnp.max(jnp.abs(ref - got)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"s2d rel err vs baseline (f32): {err:.2e}")

    xb = x.astype(DTYPE)
    pb = jax.tree.map(lambda v: v.astype(DTYPE), p)
    t0 = time_chained(segment_base, xb, pb, tag="baseline segment (C=48 @288x384)")
    t1 = time_chained(segment_s2d, xb, pb, tag="s2d segment (C=192 @144x192)")
    print(f"speedup: {t0 / t1:.2f}x")


if __name__ == "__main__":
    main()
