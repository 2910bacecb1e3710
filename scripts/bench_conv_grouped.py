"""Grouped-conv probe: can moving T into channels beat the lane-padding tax?

The round-3 floor analysis (PERF_NOTES.md) attributes the forward's conv
ceiling (~20-24 TFLOPS at the hot shapes) to the structural (8,128)-tile
padding of C in {48, 96}. The one untried re-expression: fold the T=10
time axis (batched over in every conv) into the channel axis with
``feature_group_count=T`` — input [1, H, W, T*C] fills 960/1024 lanes
instead of 96/128, at the cost of T-times-replicated weights (weights are
tiny next to activations).

Variants at the model's hottest conv ([10,144,192,96] 3x3 96->96, bf16,
45.9 GFLOP) and at the embed's stride-2 site ([10,288,384,48] 3x3 48->48
s2):
  x) XLA conv NHWC, T on batch (what the model uses)
  g) XLA conv NHWC, T folded into channels, feature_group_count=T

Timing: device-serialized chains (outputs feed inputs), median of
repeats, as bench_conv_band.py; through-the-tunnel dispatch ~1.5 ms/call
cancels out in the per-iteration division.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sdformerflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def time_chained_samesig(fn, x, iters=20, repeats=5, tag="", flop=None):
    f = jax.jit(fn)
    y = f(x)
    np.asarray(jax.device_get(y.reshape(-1)[:4]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        z = x
        for _ in range(iters):
            z = f(z)
        np.asarray(jax.device_get(z.reshape(-1)[:4]))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    med = statistics.median(ts)
    eff = f"  ({flop/med/1e9:7.1f} TFLOPS eff)" if flop else ""
    print(f"{tag:36s} {med:7.2f} ms{eff}")
    return med


def probe(T, H, W, CIN, COUT, stride, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    flop = 2 * T * (H // stride) * (W // stride) * CIN * COUT * 9
    print(f"\n== [{T},{H},{W},{CIN}] 3x3 {CIN}->{COUT} s{stride} "
          f"({flop/1e9:.1f} GFLOP) ==")
    x = jnp.asarray(rng.normal(size=(T, H, W, CIN)), dtype)
    k = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)) * 0.05, dtype)

    def conv_batch(z):
        return jax.lax.conv_general_dilated(
            z, k.astype(z.dtype), (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # grouped, channels ordered (t, c): group g handles timestep g
    xg_tc = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, H, W, T * CIN)
    kg = jnp.concatenate([k] * T, axis=-1)  # [3,3,CIN, T*COUT]

    def conv_grouped_tc(z):
        return jax.lax.conv_general_dilated(
            z, kg.astype(z.dtype), (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=T)

    # correctness (f32): grouped(t,c) == per-timestep conv
    ref = conv_batch(x.astype(jnp.float32))
    got = conv_grouped_tc(xg_tc.astype(jnp.float32))
    got = got.reshape(H // stride, W // stride, T, COUT).transpose(2, 0, 1, 3)
    err = float(jnp.max(jnp.abs(ref - got)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"grouped(t,c) rel err vs batched: {err:.2e}")

    def chain_batch(z):
        y = conv_batch(z)
        if stride > 1 or CIN != COUT:
            # chain via scalar dependency when shapes differ
            return z + y[0, 0, 0, 0].astype(z.dtype)
        return y.astype(z.dtype)

    def chain_grouped(z):
        y = conv_grouped_tc(z)
        if stride > 1 or CIN != COUT:
            return z + y[0, 0, 0, 0].astype(z.dtype)
        return y.astype(z.dtype)

    time_chained_samesig(chain_batch, x, tag="x) T on batch (model form)",
                         flop=flop)
    time_chained_samesig(chain_grouped, xg_tc,
                         tag="g) T in channels, fgc=T", flop=flop)


def main():
    probe(10, 144, 192, 96, 96, 1)   # hottest stage conv
    probe(10, 288, 384, 48, 48, 2)   # embed downsample site
    probe(10, 72, 96, 192, 192, 1)   # stage-1 conv


if __name__ == "__main__":
    main()
