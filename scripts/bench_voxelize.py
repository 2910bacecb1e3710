"""On-chip A/B + timing: Pallas sorted-dense voxelizer vs the XLA scatter
path at DSEC scale (2^20 events, 480x640, 15 bins). Records the numbers
quoted in PERF_NOTES.md."""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.ops.voxel import voxel_grid_signed
from sdformerflow_tpu.ops.pallas_voxel import voxel_grid_signed_pallas
from sdformerflow_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    N = 1 << 20
    H, W, B = 480, 640, 15
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(0, W - 1, N).astype(np.float32))
    ys = jnp.asarray(rng.uniform(0, H - 1, N).astype(np.float32))
    ts = jnp.asarray(np.sort(rng.uniform(0, 1, N)).astype(np.float32))
    ps = jnp.asarray(rng.integers(0, 2, N).astype(np.float32))

    from sdformerflow_tpu import native
    sx, sy, st, sp, _ = native.pack_window_sorted(
        np.asarray(xs), np.asarray(ys), np.asarray(ts), np.asarray(ps), N,
        height=H, t0=0.0)
    sx, sy, st, sp = map(jnp.asarray, (sx, sy, st, sp))

    pall = jax.jit(lambda a, b, c, d: voxel_grid_signed_pallas(
        a, b, c, d, num_bins=B, height=H, width=W, t_range=(0.0, 1.0)))
    psrt = jax.jit(lambda a, b, c, d: voxel_grid_signed_pallas(
        a, b, c, d, num_bins=B, height=H, width=W, t_range=(0.0, 1.0),
        presorted=True))
    ref = jax.jit(lambda a, b, c, d: voxel_grid_signed(
        a, b, c, d, num_bins=B, height=H, width=W, t_range=(0.0, 1.0)))

    g1 = np.asarray(pall(xs, ys, ts, ps))
    g0 = np.asarray(ref(xs, ys, ts, ps))
    g2 = np.asarray(psrt(sx, sy, st, sp))
    print(f"A/B max|d| = {np.abs(g1 - g0).max():.3e} "
          f"presorted max|d| = {np.abs(g2 - g0).max():.3e} "
          f"(grid |max| = {np.abs(g0).max():.2f})")

    def timed(fn, *args, iters=5, repeats=3):
        def chained(a0, *rest):
            out = fn(a0, *rest)
            return a0 + (0.0 * jnp.sum(out)).astype(a0.dtype)
        cf = jax.jit(chained)
        o = cf(*args)
        float(jnp.sum(o))
        rr = []
        for _ in range(repeats):
            o = args[0]
            t0 = time.perf_counter()
            for _ in range(iters):
                o = cf(o, *args[1:])
            float(jnp.sum(o))
            rr.append((time.perf_counter() - t0) / iters * 1e3)
        return statistics.median(rr)

    t_p = timed(pall, xs, ys, ts, ps)
    t_s = timed(psrt, sx, sy, st, sp)
    t_x = timed(ref, xs, ys, ts, ps)
    t_host = _time_host_sort(np.asarray(xs), np.asarray(ys), np.asarray(ts),
                             np.asarray(ps), N, H)
    print(f"pallas: {t_p:.2f} ms   pallas presorted: {t_s:.2f} ms   "
          f"xla_scatter: {t_x:.2f} ms   speedup: {t_x / t_p:.1f}x / "
          f"{t_x / t_s:.1f}x   host counting sort: {t_host:.2f} ms")


def _time_host_sort(x, y, t, p, cap, height, iters=5):
    from sdformerflow_tpu import native
    t0 = time.perf_counter()
    for _ in range(iters):
        native.pack_window_sorted(x, y, t, p, cap, height=height, t0=0.0)
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    main()
