"""Probe: does the decoder/pred tail benefit from block (s2d) space?
(VERDICT r3 #9 — measure before trusting the "only 1.8 ms" attribution.)

The multi-res pred heads (models/spiking_layers.py:MSSpikingPredLayer,
parity /root/reference/models/STSwinNet_SNN/Spiking_modules.py:568-702)
emit C=2 maps at each decoder scale, then the flow wrapper T-sums,
nearest-upsamples to full res and transposes
(snn_flownet.py:234-238, Spiking_STSwinNet.py:291-302). C=2 pads 2->128
lanes (64x) on (8,128)-tiled memory at up to 144x192 (and 288x384 after
the resize).

For each en4 scale this measures, fwd AND fwd+grad (the backward doubles
the layout tax):
  A (current): spike -> 1x1 conv(ci->2) -> T-sum -> resize -> transpose
  B (block):   s2d(x) -> 1x1 conv(4ci->8, block-diagonal kernel) -> T-sum
               -> depth_to_space -> resize -> transpose
B is exact (block-diagonal kernel = the 1x1 analogue of ops/s2d.py's
kernel transforms; per-pixel spike fns commute with the pixel relabeling),
verified here before timing.

Usage: python scripts/bench_s2d_preds.py [--batch=N]
Closure recorded in PERF_NOTES.md "Pred-tail block-space probe (round 4)".
"""
import os, statistics, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from sdformerflow_tpu.ops.s2d import space_to_depth, depth_to_space
from sdformerflow_tpu.ops.interpolate import resize_nearest
from sdformerflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
H, W = 288, 384
SCALES = [(18, 24, 384), (36, 48, 192), (72, 96, 96), (144, 192, 96)]
T = 10


def psn_spike(x, wts, bias):
    """PSN over the T axis (axis 0): mix timesteps, threshold — elementwise
    in space, so it commutes with the s2d pixel relabeling."""
    h = jnp.einsum("ij,j...->i...", wts, x)
    return (h >= bias).astype(x.dtype)


def block_diag_1x1(w):
    """[1,1,ci,co] -> [1,1,4ci,4co] block-diagonal (the 1x1 s2d kernel)."""
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for b in range(4):
        wp = wp.at[:, :, b * ci:(b + 1) * ci, b * co:(b + 1) * co].set(w)
    return wp


def conv1x1(x, w, b):
    lead = x.shape[:-3]
    xr = x.reshape((-1,) + x.shape[-3:])
    y = jax.lax.conv_general_dilated(
        xr, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y + b).reshape(lead + y.shape[1:])


def main():
    batch = int(next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--batch=")), "1"))
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    for (h, w, ci) in SCALES:
        x = jnp.asarray(rng.normal(0, 1, (T, batch, h, w, ci)), dt)
        k = jnp.asarray(rng.normal(0, 0.1, (1, 1, ci, 2)), dt)
        bias = jnp.asarray(rng.normal(0, 0.1, (2,)), dt)
        pw = jnp.asarray(rng.normal(0, 0.3, (T, T)), dt)
        pb = jnp.asarray(0.5, dt)

        def seg_a(x, k):
            s = psn_spike(x, pw, pb)
            y = conv1x1(s, k, bias)          # [T,B,h,w,2]
            f = y.sum(axis=0)                # [B,h,w,2]
            f = resize_nearest(f, (H, W))
            return f.transpose(0, 3, 1, 2)

        def seg_b(x, k):
            xb = space_to_depth(x)           # [T,B,h/2,w/2,4ci]
            s = psn_spike(xb, pw, pb)
            y = conv1x1(s, block_diag_1x1(k), jnp.tile(bias, 4))
            f = y.sum(axis=0)                # [B,h/2,w/2,8]
            f = depth_to_space(f)            # [B,h,w,2]
            f = resize_nearest(f, (H, W))
            return f.transpose(0, 3, 1, 2)

        # exactness (f32 on the same values)
        a = jax.jit(seg_a)(x.astype(jnp.float32), k.astype(jnp.float32))
        b = jax.jit(seg_b)(x.astype(jnp.float32), k.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

        def timed(fn, n_out):
            # chain via data dependency; fetch ONE SCALAR per block (a full
            # np.asarray(x) fetch would drag ~50 MB through the tunnel and
            # dominate the timing — see CLAUDE.md tunnel notes)
            def chained(x, k):
                out = fn(x, k)
                return x + 0.0 * out.sum().astype(x.dtype), k
            cf = jax.jit(chained)
            scal = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
            xx, kk = cf(x, k)
            float(scal(xx))
            rr = []
            for _ in range(5):
                xx = x
                t0 = time.perf_counter()
                for _ in range(20):
                    xx, _ = cf(xx, k)
                float(scal(xx))
                rr.append((time.perf_counter() - t0) / 20 * 1e3)
            return statistics.median(rr)

        def grad_fn(seg):
            def f(x, k):
                return (seg(x, k).astype(jnp.float32) ** 2).sum()

            def g(x, k):
                gx, gk = jax.grad(f, argnums=(0, 1))(x, k)
                return gx + 0.0 * gk.sum().astype(gx.dtype)
            return g

        ta, tb = timed(seg_a, 1), timed(seg_b, 1)
        ga = timed(lambda x, k: grad_fn(seg_a)(x, k), 1)
        gb = timed(lambda x, k: grad_fn(seg_b)(x, k), 1)
        print(f"scale {h}x{w} ci={ci} b={batch}: "
              f"fwd A {ta:.3f} B {tb:.3f} ms | fwd+grad A {ga:.3f} "
              f"B {gb:.3f} ms")


if __name__ == "__main__":
    main()
