"""Band-strategy probe for the channels-second 3x3 conv kernel.

Question: why do the conv kernels/XLA fusions only reach ~30-35 TFLOPS at
[10, 96, 144, 192], and which im2col-avoidance strategy fixes it?

Variants (all same grid (T, H//bh), same manual double-buffered DMA):
  a) existing conv3x3_affine_cs: 9 tap copies (6 lane-rotating) + 1 big dot
  c) 3 sublane-shifted tap copies + 3 dots [cout, 3cin] + pltpu.roll merge
  d) dot ceiling: no tap copies, single dot on the raw buffer (wrong math,
     measures the MXU+DMA floor for this shape)
  x) XLA lax.conv_general_dilated on the same array (feature-last, TB-major)
"""
import functools, statistics, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from sdformerflow_tpu.ops.pallas_embed import conv3x3_affine_cs
from sdformerflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

T, CIN, COUT, H, W = 10, 96, 96, 144, 192
BH = 8
DTYPE = jnp.bfloat16
FLOP = 2 * T * H * W * CIN * COUT * 9


def _kernel_c(k3_ref, a_ref, b_ref, x_hbm, o_ref, xbuf, imcol3, sem, *,
              cin, cout, bh, wbuf, nsteps, wout):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    nrow = pl.num_programs(1)

    def win(s):
        t_, r_ = s // nrow, s % nrow
        return x_hbm.at[t_, :, pl.ds(r_ * bh, xbuf.shape[2]), :]

    def dma(s):
        slot = jax.lax.rem(s, 2)
        return pltpu.make_async_copy(win(s), xbuf.at[slot], sem.at[slot])

    @pl.when(step == 0)
    def _():
        dma(0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        dma(step + 1).start()

    dma(step).wait()
    x = xbuf[jax.lax.rem(step, 2)]
    for dy in range(3):
        imcol3[dy * cin:(dy + 1) * cin] = x[:, dy:dy + bh, :]
    im3 = imcol3[...].reshape(3 * cin, bh * wbuf)
    acc = None
    for dx in range(3):
        p = jax.lax.dot_general(k3_ref[dx], im3, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = p.reshape(cout, bh, wbuf)
        if dx:
            # left-rotate by dx == right-rotate by (len - dx)
            p = pltpu.roll(p, shift=p.shape[2] - dx, axis=2)
        acc = p if acc is None else acc + p
    acc = acc * a_ref[:, 0:1, 0:1] + b_ref[:, 0:1, 0:1]
    o_ref[0] = acc[:, :, :wout].astype(o_ref.dtype)


def conv3x3_variant_c(x, kernel, scale=None, shift=None, *, block_h=8):
    Tn, cin, Hn, Wn = x.shape
    cout = kernel.shape[-1]
    bh = block_h
    assert Hn % bh == 0
    Wp = -(-Wn // 128) * 128
    rows_buf = -(-(bh + 2) // 8) * 8
    bot_pad = (rows_buf - bh) + 1
    # cols: data at [1, 1 + Wn); need reads up to 2 + Wn <= buf_w
    buf_w = -(-(Wn + 2) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, bot_pad), (1, buf_w - Wn - 1)))
    # k3[dx][o, dy*cin + i] = kernel[dy, dx, i, o]
    k3 = kernel.transpose(1, 3, 0, 2).reshape(3, cout, 3 * cin)
    a = (jnp.ones((cout,), jnp.float32) if scale is None
         else scale.astype(jnp.float32))
    b = (jnp.zeros((cout,), jnp.float32) if shift is None
         else shift.astype(jnp.float32))
    nsteps = Tn * (Hn // bh)
    out = pl.pallas_call(
        functools.partial(_kernel_c, cin=cin, cout=cout, bh=bh, wbuf=buf_w,
                          nsteps=nsteps, wout=Wp),
        out_shape=jax.ShapeDtypeStruct((Tn, cout, Hn, Wp), x.dtype),
        grid=(Tn, Hn // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, cout, bh, Wp), lambda t, r: (t, 0, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, cin, rows_buf, buf_w), x.dtype),
            pltpu.VMEM((3 * cin, bh, buf_w), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(k3.astype(x.dtype), a.reshape(cout, 1, 1), b.reshape(cout, 1, 1), xp)
    return out[..., :Wn]


def _kernel_d(k_ref, x_hbm, o_ref, xbuf, sem, *, cout, bh, wbuf, nsteps):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    nrow = pl.num_programs(1)

    def dma(s):
        slot = jax.lax.rem(s, 2)
        t_, r_ = s // nrow, s % nrow
        return pltpu.make_async_copy(
            x_hbm.at[t_, :, pl.ds(r_ * bh, xbuf.shape[2]), :],
            xbuf.at[slot], sem.at[slot])

    @pl.when(step == 0)
    def _():
        dma(0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        dma(step + 1).start()

    dma(step).wait()
    x = xbuf[jax.lax.rem(step, 2)]
    # wrong math: dot over the buffer replicated 3x in K to match 864 depth
    xin = x[:, :bh, :].reshape(x.shape[0] * bh, wbuf)
    big = jnp.concatenate([xin, xin, xin], axis=0)[: k_ref.shape[1]]
    acc = jax.lax.dot_general(k_ref[...], big, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc[:, :o_ref.shape[3]].astype(o_ref.dtype)


def dot_ceiling(x, kernel):
    Tn, cin, Hn, Wn = x.shape
    cout = kernel.shape[-1]
    bh = BH
    Wp = -(-Wn // 128) * 128
    rows_buf = -(-bh // 8) * 8
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Wp - Wn)))
    km = kernel.reshape(9, cin, cout).transpose(2, 0, 1).reshape(cout, 9 * cin)
    nsteps = Tn * (Hn // bh)
    out = pl.pallas_call(
        functools.partial(_kernel_d, cout=cout, bh=bh, wbuf=Wp,
                          nsteps=nsteps),
        out_shape=jax.ShapeDtypeStruct((Tn, Hn // bh, cout, Wp), x.dtype),
        grid=(Tn, Hn // bh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, cout, Wp), lambda t, r: (t, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, cin, rows_buf, Wp), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
    )(km.astype(x.dtype), xp)
    return out


def time_chained(fn, x, iters=20, repeats=5, tag=""):
    f = jax.jit(lambda x: fn(x).astype(x.dtype)[..., :x.shape[-1]][:, :x.shape[1]])
    y = f(x)
    np.asarray(jax.device_get(y[0, 0, 0, :4]))  # compile+settle
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        z = x
        for _ in range(iters):
            z = f(z)
        np.asarray(jax.device_get(z[0, 0, 0, :4]))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    med = statistics.median(ts)
    print(f"{tag:28s} {med:7.2f} ms  ({FLOP/med/1e9:7.1f} TFLOPS eff)")
    return med


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, CIN, H, W)), DTYPE)
    k = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)) * 0.05, DTYPE)

    # correctness of variant c vs XLA (f32)
    xf = x.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    ref = jax.lax.conv_general_dilated(
        xf.reshape(T, CIN, H, W), kf.transpose(3, 2, 0, 1), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    got = conv3x3_variant_c(xf, kf)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"variant_c rel err vs XLA: {err:.2e}")

    def xla_conv(z):
        return jax.lax.conv_general_dilated(
            z, k.transpose(3, 2, 0, 1).astype(z.dtype), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    time_chained(xla_conv, x, tag="XLA conv (NCHW, TB-major)")
    xl = x.transpose(0, 2, 3, 1)  # [T, H, W, C]

    def xla_conv_nhwc(z):
        return jax.lax.conv_general_dilated(
            z, k.astype(z.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f = jax.jit(xla_conv_nhwc)
    y = f(xl)
    np.asarray(jax.device_get(y[0, 0, 0, :4]))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        z = xl
        for _ in range(20):
            z = f(z)
        np.asarray(jax.device_get(z[0, 0, 0, :4]))
        ts.append((time.perf_counter() - t0) / 20 * 1e3)
    med = statistics.median(ts)
    print(f"{'XLA conv (NHWC)':28s} {med:7.2f} ms  ({FLOP/med/1e9:7.1f} TFLOPS eff)")

    time_chained(lambda z: conv3x3_affine_cs(z, k.astype(z.dtype)), x,
                 tag="a) im2col9 + 1 dot")
    time_chained(lambda z: conv3x3_variant_c(z, k.astype(z.dtype)), x,
                 tag="c) im2col3 + 3 dots + roll")
    # chain via a scalar data dependency (output shape differs from input)
    fd = jax.jit(lambda z: dot_ceiling(z, k.astype(z.dtype)))
    y = fd(x)
    np.asarray(jax.device_get(y[0, 0, 0, :4]))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        z = x
        for _ in range(20):
            z = x + fd(z)[0, 0, 0, 0].astype(x.dtype)
        np.asarray(jax.device_get(z[0, 0, 0, :4]))
        ts.append((time.perf_counter() - t0) / 20 * 1e3)
    med = statistics.median(ts)
    print(f"{'d) dot ceiling (wrong math)':28s} {med:7.2f} ms  "
          f"({FLOP/med/1e9:7.1f} TFLOPS eff)")


if __name__ == "__main__":
    main()
