"""Micro-bench: PSN contraction layouts on the real TPU chip.

The PSN is h = W[T,T] @ x[T, N] over the leading (major) time axis of
time-major activations — PERF_NOTES.md suspects this contraction pattern is
the main gap to the HBM roofline. This script measures realistic
conv -> BN -> PSN chains under several formulations:

  A. tensordot over leading axis (current ops/neurons.psn_neuron)
  B. explicit transpose to time-minor, matmul, transpose back
  C. einsum 'st,sbhwc->tbhwc'
  D. dot_general with x reshaped [T, N] (the round-1 slow layout, control)
  E. time-minor END-TO-END: x stored [B, H, W, C, T]; PSN = x @ W^T
     (no transposes; conv runs on [B*T? no — conv consumes [B,H,W,C] slices)

Timing through the axon tunnel: serialize by data dependency, fetch once
(see bench.py); median of R runs.

Usage: python scripts/bench_psn_layouts.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.utils.cache import enable_compilation_cache


def timed(fn, x, iters=30, repeats=5):
    fn = jax.jit(fn)
    o = fn(x)
    jax.block_until_ready(o)
    rates = []
    for _ in range(repeats):
        o = x
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(o)
        float(jnp.sum(o[0] if isinstance(o, tuple) else o))
        dt = time.perf_counter() - t0
        rates.append(dt / iters * 1e3)
    return statistics.median(rates)


def main():
    enable_compilation_cache()
    T, B, H, Wd, C = 10, 1, 144, 192, 96  # stage-0 shapes, en4 eval size
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (T, T), jnp.bfloat16) * 0.3
    bias = jnp.full((T, 1), -1.0, jnp.bfloat16)
    conv_w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05

    x_tm = jax.random.normal(key, (T, B, H, Wd, C), jnp.bfloat16)

    def conv(x):  # batched 2d conv over leading dims
        xr = x.reshape((-1,) + x.shape[-3:])
        y = jax.lax.conv_general_dilated(
            xr, conv_w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(x.shape[:-3] + y.shape[-3:])

    bshape = (T,) + (1,) * 4

    def chain_A(x):
        y = conv(x)
        h = jnp.tensordot(w, y, axes=((1,), (0,))) + bias.reshape(bshape)
        return conv((h >= 0).astype(x.dtype))

    def chain_B(x):
        y = conv(x)
        ym = jnp.moveaxis(y, 0, -1)                       # [B,H,W,C,T]
        hm = ym @ w.T + bias.reshape((T,))
        h = jnp.moveaxis(hm, -1, 0)
        return conv((h >= 0).astype(x.dtype))

    def chain_C(x):
        y = conv(x)
        h = jnp.einsum("st,tbhwc->sbhwc", w, y) + bias.reshape(bshape)
        return conv((h >= 0).astype(x.dtype))

    def chain_D(x):
        y = conv(x)
        h = (w @ y.reshape(T, -1) + bias).reshape(y.shape)
        return conv((h >= 0).astype(x.dtype))

    results = {}
    for name, fn in [("A_tensordot_leading", chain_A),
                     ("B_transpose_fused", chain_B),
                     ("C_einsum", chain_C),
                     ("D_flatten_TN", chain_D)]:
        ms = timed(fn, x_tm)
        results[name] = ms
        print(f"{name}: {ms:.3f} ms")

    # E: time-minor resident layout [B,H,W,C,T]; conv over T*C? convs need
    # [.., H, W, C]; emulate by folding T into channels for the conv
    # (different network semantics — layout probe only, measures the
    # transpose-free PSN cost).
    x_mn = jnp.moveaxis(x_tm, 0, -1)  # [B,H,W,C,T]
    conv_w_big = jax.random.normal(key, (3, 3, C * T, C * T),
                                   jnp.bfloat16) * 0.02

    def chain_E(x):
        B_, H_, W_, C_, T_ = x.shape
        xr = x.reshape(B_, H_, W_, C_ * T_)
        y = jax.lax.conv_general_dilated(
            xr, conv_w_big, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B_, H_, W_, C_, T_)
        h = y @ w.T + bias.reshape((T_,))
        return ((h >= 0).astype(x.dtype))

    ms = timed(chain_E, x_mn)
    print(f"E_time_minor_resident(probe): {ms:.3f} ms")

    # pure PSN op cost (no convs), leading vs minor
    def psn_lead(x):
        h = jnp.tensordot(w, x, axes=((1,), (0,))) + bias.reshape(bshape)
        return (h >= 0).astype(x.dtype)

    def psn_minor_roundtrip(x):
        ym = jnp.moveaxis(x, 0, -1)
        hm = ym @ w.T + bias.reshape((T,))
        return (jnp.moveaxis(hm, -1, 0) >= 0).astype(x.dtype)

    print(f"psn_lead_only: {timed(psn_lead, x_tm):.3f} ms")
    print(f"psn_minor_roundtrip_only: {timed(psn_minor_roundtrip, x_tm):.3f} ms")


if __name__ == "__main__":
    main()
