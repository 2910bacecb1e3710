"""Component-level timing breakdown of the flagship en4 eval forward on the
real TPU chip (bf16, eval protocol shapes). Times each sub-network as its own
jitted function with the real trained-shape params, using the
chained-dependency methodology (block_until_ready lies through the tunnel).

Components: patch embed | each swin stage | bottleneck resblocks | decoders
(= full - encoder approximation cross-checked against the sum).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import (SpikingformerFlowNet,
                                                 SpikingSwinTransformer3D)
from sdformerflow_tpu.models.spiking_patch_embed import \
    MSPEDSpikingPatchEmbedConvSfn
from sdformerflow_tpu.models.spiking_swin import SpikingSwinStage
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.utils.cache import enable_compilation_cache


def timed(fn, *args, iters=20, repeats=5):
    """Chain via output-sum feedback into a dummy addend of the first arg."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)

    def chained(x0, *rest):
        out = jfn(x0, *rest)
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
        return x0 + (0.0 * s).astype(x0.dtype)

    cfn = jax.jit(chained)
    o = cfn(*args)
    float(jnp.sum(o))
    rates = []
    for _ in range(repeats):
        o = args[0]
        t0 = time.perf_counter()
        for _ in range(iters):
            o = cfn(o, *args[1:])
        float(jnp.sum(o))
        rates.append((time.perf_counter() - t0) / iters * 1e3)
    return statistics.median(rates)


def main():
    enable_compilation_cache()
    h, w = 288, 384
    dt = jnp.bfloat16
    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(h, w), patch_size=(1, 1, 2, 2), depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24), out_indices=(0, 1, 2, 3),
        window_size=(2, 9, 9), qk_scale=0.125)
    cfg = SpikingConfig(num_steps=10, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    model = SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=10,
                                 base_num_channels=96, num_encoders=4,
                                 use_upsample_conv=False, ms=True)
    rng = jax.random.PRNGKey(0)
    chunk = jax.random.normal(rng, (1, 10, h, w), jnp.float32)
    x = encode_input(chunk).astype(dt)
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, False))(
        rng, x)
    params = jax.tree_util.tree_map(lambda a: a.astype(dt),
                                    variables["params"])
    bs = variables.get("batch_stats", {})

    # ---- full forward
    full = lambda xx: model.apply({"params": params, "batch_stats": bs},
                                  xx, False)["flow"][-1]
    t_full = timed(full, x)
    print(f"full_forward: {t_full:.2f} ms")

    # ---- backbone (patch embed + 4 stages)
    backbone = SpikingSwinTransformer3D(
        swin=swin, cfg=cfg, in_chans=10, embed_dim=96,
        spikformer_norm="BN", ms=True)
    p_enc = params["sttmultires_unet"]["encoders"]
    bs_enc = bs["sttmultires_unet"]["encoders"]
    bb = lambda xx: backbone.apply(
        {"params": p_enc, "batch_stats": bs_enc}, xx, False)
    t_bb = timed(bb, x)
    print(f"backbone(embed+4stages): {t_bb:.2f} ms")

    # ---- patch embed alone
    pe = MSPEDSpikingPatchEmbedConvSfn(
        img_size=(h, w), patch_size=(1, 1, 2, 2), in_chans=10,
        embed_dim=96, cfg=cfg)
    pe_fn = lambda xx: pe.apply(
        {"params": p_enc["patch_embed"],
         "batch_stats": bs_enc["patch_embed"]}, xx, False)
    t_pe = timed(pe_fn, x)
    print(f"patch_embed: {t_pe:.2f} ms")

    # ---- stages individually (time-major inputs)
    feat = jax.jit(pe_fn)(x)
    for i, depth in enumerate(swin.depths):
        stage = SpikingSwinStage(
            dim=int(96 * 2 ** i), depth=depth, num_heads=swin.num_heads[i],
            cfg=cfg, window_size=tuple(swin.window_size),
            mlp_ratio=swin.mlp_ratio, version=swin.arc_type,
            qk_scale=swin.qk_scale, norm="BN",
            drop_path_rates=tuple([0.0] * depth),
            downsample=i < 3, ms=True)
        st_fn = lambda xx, st=stage, j=i: st.apply(
            {"params": p_enc[f"stage{j}"],
             "batch_stats": bs_enc[f"stage{j}"]}, xx, False)[0]
        t_st = timed(st_fn, feat)
        print(f"stage{i} (depth={depth}, dim={int(96 * 2 ** i)}, "
              f"in={tuple(feat.shape)}): {t_st:.2f} ms")
        feat = jax.jit(st_fn)(feat)

    print(f"decoders+resblocks (full - backbone): {t_full - t_bb:.2f} ms")


if __name__ == "__main__":
    main()
