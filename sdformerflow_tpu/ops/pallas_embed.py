"""Pallas TPU kernels for the SDformerFlow patch-embed hot path (inference).

Round-2/3 profiling (PERF_NOTES.md) showed the embed pipeline — head conv at
288x384, stride-2 conv, two MS resblocks, PED projection — dominated by XLA
layout artifacts, not math: activations at C in {48, 96} with T=10 force XLA
into either C-on-lanes (96->128 pad) or T-on-sublanes (10->16 pad) tilings,
plus explicit relayout copies and bool-spike materialization around every PSN
site (~7 of 16 ms of the whole forward).

These kernels sidestep the layout question by computing CHANNELS-SECOND:
arrays flow as ``[T, C, H, W]`` so the minor (lane) dim is W (384 = 3*128
aligned at full res) and sublanes are spatial rows — T and C never touch the
tiled dims. Two small kernels, composed with cheap XLA glue (adds,
decimation, transposes):

- ``psn_spike_cs``: fused [per-channel affine ->] PSN T-mix -> heaviside,
  emitting 0/1 bf16 spikes directly (no pred tensors, no relayouts).
- ``conv3x3_affine_cs``: 3x3 (or 1x1) stride-1 conv as 9 accumulated MXU
  dots ``K_tap[Cout, Cin] @ x_tap[Cin, rows*W]`` per band, fused with the
  folded-BN per-channel affine epilogue. Stride-2 convs run at full
  resolution and are decimated by XLA (polyphase is a follow-up).

Inference-only: the affine comes from BN running statistics (the reference
evaluates with BN in eval mode, eval_DSEC_flow_SNN.py:199-217). Training and
non-TPU backends keep the XLA path. Parity: every composed forward is tested
against the flax module in tests/test_pallas_embed.py (interpret mode) and
verified on chip.

STATUS (round 3, measured): the composed per-layer path is SLOWER than the
XLA module end to end (~12 vs 8.1 ms standalone embed) — the im2col tap
copies (lane-rotates for dx != 0) and per-band DMA overhead cost more than
the XLA layout tax they remove, and the stride-2 convs pay 4x FLOPs via
decimation. Winning here needs a single polyphase megakernel keeping all
embed stages VMEM-resident per row band (est. ~2.5-3.5 ms); these kernels
are the building blocks for that and stay OFF every default path
(make_eval_step(fused_embed=True) opts in). Full numbers: PERF_NOTES.md
round-3 section.

Reference equivalent surface: MS_PED_Spiking_PatchEmbed_Conv_sfn
(/root/reference/models/STSwinNet_SNN/Spiking_modules.py:1710-1837).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# PSN spike kernel (channels-second)


def _psn_cs_kernel(w_ref, b_ref, x_ref, o_ref, *, T: int):
    # x block [T, bc, bh, W]; w [T, T]; b [T] in SMEM
    x = x_ref[...]
    for t in range(T):
        acc = x[0].astype(jnp.float32) * w_ref[t, 0]
        for s in range(1, T):
            acc = acc + x[s].astype(jnp.float32) * w_ref[t, s]
        o_ref[t] = ((acc + b_ref[t]) >= 0.0).astype(o_ref.dtype)


def psn_spike_cs(x, weight, bias, *, block_h: int = 8, out_dtype=None,
                 vmem_budget: int = 8 << 20):
    """PSN + heaviside on channels-second ``[T, C, H, W]`` arrays.

    ``weight`` [T, T], ``bias`` [T] (or [T, 1]). Returns 0/1 spikes with the
    same shape (dtype ``out_dtype`` or the input's). Lane dim is W: no
    T-on-sublane padding, no relayout pressure on the neighbors. Blocks are
    chosen to keep pipelined in+out buffers under ``vmem_budget`` bytes.
    """
    T, C, H, W = x.shape
    out_dtype = out_dtype or x.dtype
    bh = min(block_h, H)
    while H % bh:
        bh -= 1
    # split channels until the double-buffered in+out blocks fit
    itemsize = jnp.dtype(x.dtype).itemsize + jnp.dtype(out_dtype).itemsize
    bc = C
    while bc > 1 and 2 * T * bc * bh * W * itemsize > vmem_budget:
        for d in range(bc - 1, 0, -1):
            if C % d == 0 and d < bc:
                bc = d
                break
        else:
            break
    grid = (H // bh, C // bc)
    return pl.pallas_call(
        functools.partial(_psn_cs_kernel, T=T),
        out_shape=jax.ShapeDtypeStruct((T, C, H, W), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((T, bc, bh, W), lambda r, c: (0, c, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, bc, bh, W), lambda r, c: (0, c, r, 0),
                               memory_space=pltpu.VMEM),
    )(weight.astype(jnp.float32), bias.reshape(-1).astype(jnp.float32), x)


# ---------------------------------------------------------------------------
# 3x3 / 1x1 conv + affine kernel (channels-second)


def _conv_cs_kernel(k_ref, a_ref, b_ref, x_hbm, o_ref, xbuf, imcol, sem, *,
                    T: int, cin: int, cout: int, bh: int, width: int,
                    ksize: int, f32_dots: bool, nsteps: int):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    halo = ksize // 2
    nrow = pl.num_programs(1)  # grid is (T, H//bh): r fastest

    def win(s):
        # step s -> (t, r) with r fastest; rows [r*bh, r*bh + rows_buf) of
        # the pre-padded x[t]. Mosaic requires DMA slice sizes 8-aligned on
        # the sublane dim, so the buffer holds an aligned row window and the
        # kernel uses its first `bh + 2*halo` rows.
        t_, r_ = s // nrow, s % nrow
        return x_hbm.at[t_, :, pl.ds(r_ * bh, xbuf.shape[2]), :]

    def dma(s):
        slot = jax.lax.rem(s, 2)
        return pltpu.make_async_copy(win(s), xbuf.at[slot], sem.at[slot])

    # revolving double buffer: prefetch step+1 while computing this step
    @pl.when(step == 0)
    def _():
        dma(0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        dma(step + 1).start()

    dma(step).wait()
    x = xbuf[jax.lax.rem(step, 2)]
    prec = jax.lax.Precision.HIGHEST if f32_dots else None
    # im2col into a [k*k*cin, bh, width] scratch (one shifted copy per tap —
    # Mosaic rejects reshapes OF lane-offset slices, but reshaping the full
    # scratch value afterwards is an aligned relabel), then a single MXU dot
    # [cout, k*k*cin] @ [k*k*cin, bh*width] per grid step.
    for dy in range(ksize):
        for dx in range(ksize):
            tap = dy * ksize + dx
            imcol[tap * cin:(tap + 1) * cin] = x[:, dy:dy + bh,
                                                 dx:dx + width]
    im2 = imcol[...].reshape(ksize * ksize * cin, bh * width)
    acc = jax.lax.dot_general(
        k_ref[...], im2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    acc = acc * a_ref[:, 0:1] + b_ref[:, 0:1]
    o_ref[0] = acc.reshape(cout, bh, width).astype(o_ref.dtype)


def conv3x3_affine_cs(x, kernel, scale=None, shift=None, *, block_h: int = 8,
                      out_dtype=None, f32_dots: Optional[bool] = None):
    """3x3 (or 1x1) stride-1 conv + per-channel affine, channels-second.

    ``x`` [T, Cin, H, W]; ``kernel`` [k, k, Cin, Cout] (flax HWIO);
    ``scale``/``shift`` [Cout] fold the eval-mode BN (None -> 1/0; shift
    also carries a conv bias). Returns [T, Cout, H, W].
    """
    T, cin, H, W = x.shape
    ksize = kernel.shape[0]
    cout = kernel.shape[-1]
    halo = ksize // 2
    out_dtype = out_dtype or x.dtype
    if f32_dots is None:
        f32_dots = x.dtype == jnp.float32
    # bh must divide H and (for the 8-aligned DMA starts) be a multiple of 8;
    # otherwise fall back to one whole-H block.
    bh = min(block_h, H)
    while bh > 0 and (H % bh or bh % 8):
        bh -= 1
    if bh == 0:
        bh = H
    # pad W to a lane multiple, H by the halo (plus alignment slack for the
    # 8-row-aligned DMA window) so the kernel's DMA slices stay in range;
    # padded columns/rows produce garbage outputs that are cropped.
    Wp = -(-W // 128) * 128
    rows_buf = -(-(bh + 2 * halo) // 8) * 8
    bot_pad = (rows_buf - bh) + halo  # max DMA end = (H/bh-1)*bh + rows_buf
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, bot_pad), (0, 0)))
    # the DMA buffer's lane dim must itself be 128-aligned
    buf_w = -(-(Wp + 2 * halo) // 128) * 128
    # zero columns: data at [halo, halo + W), rest zero-padding
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (halo, buf_w - W - halo)))
    # [cout, k*k*cin] with rows matching the im2col tap order
    k_mat = (kernel.reshape(ksize * ksize, cin, cout)
             .transpose(2, 0, 1).reshape(cout, ksize * ksize * cin))
    a = (jnp.ones((cout,), jnp.float32) if scale is None
         else scale.astype(jnp.float32))
    b = (jnp.zeros((cout,), jnp.float32) if shift is None
         else shift.astype(jnp.float32))
    kw = Wp
    nsteps = T * (H // bh)
    out = pl.pallas_call(
        functools.partial(_conv_cs_kernel, T=T, cin=cin, cout=cout, bh=bh,
                          width=kw, ksize=ksize, f32_dots=f32_dots,
                          nsteps=nsteps),
        out_shape=jax.ShapeDtypeStruct((T, cout, H, kw), out_dtype),
        grid=(T, H // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_mat (small)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b
            pl.BlockSpec(memory_space=pl.ANY),       # x (manual DMA)
        ],
        out_specs=pl.BlockSpec((1, cout, bh, kw), lambda t, r: (t, 0, r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, cin, rows_buf, buf_w), x.dtype),
            pltpu.VMEM((ksize * ksize * cin, bh, kw), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(k_mat.astype(x.dtype), a.reshape(cout, 1), b.reshape(cout, 1), xp)
    if Wp != W:
        out = out[..., :W]
    return out


# ---------------------------------------------------------------------------
# Composed inference path for the flagship embed
# (MS_PED_Spiking_PatchEmbed_Conv_sfn: head -> MS conv /2 -> 2x MS resblock
#  -> PED projection /2), channels-second end to end.


def _bn_affine(bn_params, bn_stats, eps=1e-5):
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    b = bn_params["bias"] - bn_stats["mean"] * a
    return a, b


def _site_affine(p, s, name):
    """Affine from a SpikingNorm/TorchBatchNorm site, or conv bias if the
    variables are already BN-folded (training.bn_folding)."""
    if name in p:
        sub_p, sub_s = p[name], s[name]
        if "BatchNorm_0" in sub_p:
            return _bn_affine(sub_p["BatchNorm_0"], sub_s["BatchNorm_0"])
        return _bn_affine(sub_p, sub_s)
    return None, None


def _conv_affine(p, s, conv_name, norm_name, x, **kw):
    a, b = _site_affine(p, s, norm_name)
    kern = p[conv_name]["kernel"]
    if a is None and "bias" in p[conv_name]:
        a = jnp.ones((kern.shape[-1],), jnp.float32)
        b = p[conv_name]["bias"]
    return conv3x3_affine_cs(x, kern, a, b, **kw)


def fused_embed_forward(params, batch_stats, x, *, num_steps: int):
    """Inference forward of MS_PED_Spiking_PatchEmbed_Conv_sfn via the
    channels-second Pallas kernels.

    ``params``/``batch_stats``: the module's subtree (either raw or
    BN-folded). ``x``: [B, bins, 2, H, W] voxel input. Returns
    [T, B, H/4, W/4, C] (the module's output layout).
    """
    from ..models.spiking_patch_embed import sfn_regroup

    T = num_steps
    p, s = params, batch_stats
    xr = sfn_regroup(x, T)                     # [T, B, H, W, 2]
    Tn, B, H, W, _ = xr.shape
    outs = []
    for bi in range(B):
        y = xr[:, bi].transpose(0, 3, 1, 2)    # [T, 2, H, W]
        # head (SEW): conv -> BN -> PSN spike
        y = _conv_affine(p["head"], s.get("head", {}), "conv", "norm", y)
        hp = p["head"]["sn"]
        y = psn_spike_cs(y, hp["weight"], hp["bias"])
        # MS conv /2 (first_layer: no input spike): conv s2 -> BN
        y = _conv_affine(p["conv"], s.get("conv", {}), "conv", "norm", y)
        y = y[:, :, ::2, ::2]
        # 2x MS resblock: (sn -> conv -> BN) x2 + ADD
        for i in sorted(p["residual_encoding"].keys()):
            rp = p["residual_encoding"][i]
            rs = s.get("residual_encoding", {}).get(i, {})
            idt = y
            z = psn_spike_cs(y, rp["sn1"]["weight"], rp["sn1"]["bias"])
            z = _conv_affine(rp, rs, "conv1", "norm1", z)
            z = psn_spike_cs(z, rp["sn2"]["weight"], rp["sn2"]["bias"])
            z = _conv_affine(rp, rs, "conv2", "norm2", z)
            y = z + idt
        # PED projection /2: conv_res(y) + BN(conv s2 (sn(y)))
        pp = p["proj"]
        ps = s.get("proj", {})
        yr = conv3x3_affine_cs(
            y[:, :, ::2, ::2], pp["conv_res"]["kernel"],
            shift=pp["conv_res"].get("bias"))
        z = psn_spike_cs(y, pp["sn"]["weight"], pp["sn"]["bias"])
        z = _conv_affine(pp, ps, "conv", "norm", z)
        z = z[:, :, ::2, ::2]
        outs.append(z + yr)
    out = jnp.stack(outs, axis=1)              # [T, B, C, H', W']
    return out.transpose(0, 1, 3, 4, 2)        # [T, B, H', W', C]
