"""Probe: does int8 quantized convolution beat bf16 at this model's hot shapes?

Motivation: the bf16 eval forward is pinned at its measured ceiling
(PERF_NOTES round 3) — conv compute at XLA's per-shape MXU efficiency plus
the (8,128)-tile layout tax of C in {48, 96}. The MXU has 2x int8 peak and
int8 halves activation HBM bytes; in the MS architecture every conv consumes
SPIKES (exactly 0/1), so conv *inputs* quantize losslessly — only weights
need rounding. This probe measures whether XLA:TPU actually lowers s8xs8
convs to the fast path at our shapes, before any model-level work.

Shapes probed (the forward's two dominant conv sites, PERF_NOTES):
  A: [10, 144, 192, 96] 3x3 96->96   (stage-0/resblock, 45.9 GFLOP)
  B: [10, 288, 384, 48] 3x3 48->96 stride 2 (embed downsample, 48.9 GFLOP)

Timing: device-serialized chains (output feeds next input), median of 5
runs of 20 iters, same methodology as bench_conv_band.py.
"""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from sdformerflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_q(x, k, stride=1, acc=jnp.int32):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc)


def time_chain(make_step, x0, tag, flop, iters=20, repeats=5):
    f = jax.jit(make_step)
    y = f(x0)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(y)[0][(0,) * y.ndim]))
    ts = []
    for _ in range(repeats):
        z = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            z = f(z)
        np.asarray(jax.device_get(z[(0,) * z.ndim]))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    med = statistics.median(ts)
    print(f"{tag:42s} {med:7.2f} ms  ({flop / med / 1e9:7.1f} TFLOPS eff)")
    return med


def probe(tag, T, H, W, cin, cout, stride):
    rng = np.random.default_rng(0)
    flop = 2 * T * (H // stride) * (W // stride) * cin * cout * 9
    spikes = (rng.random((T, H, W, cin)) < 0.2)
    kf = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.05

    xb = jnp.asarray(spikes, jnp.bfloat16)
    kb = jnp.asarray(kf, jnp.bfloat16)
    x8 = jnp.asarray(spikes, jnp.int8)
    # per-output-channel symmetric weight quant
    s = np.abs(kf).max(axis=(0, 1, 2)) / 127.0
    k8 = jnp.asarray(np.clip(np.round(kf / s), -127, 127), jnp.int8)

    print(f"== {tag}: [{T},{H},{W},{cin}] 3x3 -> {cout} stride {stride}")

    # bf16 baseline; chain via bf16 output -> threshold back to spikes
    def step_bf16(z):
        y = conv(z, kb, stride)
        y = jax.image.resize(y, (T, H, W, cin), "nearest") if (
            stride != 1 or cout != cin) else y
        return (y > 0).astype(jnp.bfloat16)
    t_b = time_chain(step_bf16, xb, "bf16 conv (+respike)", flop)

    def step_i8(z):
        y = conv_q(z, k8, stride)  # int32 accum
        y = y.astype(jnp.bfloat16)
        y = jax.image.resize(y, (T, H, W, cin), "nearest") if (
            stride != 1 or cout != cin) else y
        return (y > 0).astype(jnp.int8)
    t_8 = time_chain(step_i8, x8, "int8 conv -> i32 (+respike)", flop)

    # conv-only variants (chain through a scalar to isolate the conv)
    def chain_scalar(convfn, x, k, zero, tag2):
        def step(z):
            y = convfn(z, k, stride)
            return z + (y[(0,) * y.ndim] * zero).astype(z.dtype)
        return time_chain(step, x, tag2, flop)

    t_b2 = chain_scalar(conv, xb, kb, jnp.bfloat16(0), "bf16 conv only")
    t_82 = chain_scalar(conv_q, x8, k8, jnp.int32(0), "int8 conv only")
    print(f"   int8/bf16 speedup: full {t_b / t_8:.2f}x, conv-only "
          f"{t_b2 / t_82:.2f}x")


def main():
    print("devices:", jax.devices())
    probe("A stage conv", 10, 144, 192, 96, 96, 1)
    probe("B embed downsample", 10, 288, 384, 48, 96, 2)


if __name__ == "__main__":
    main()
