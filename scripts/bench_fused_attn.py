"""On-chip A/B: fused Pallas spiking-QK window attention vs the XLA module,
at all four en4 stage shapes (VERDICT r4 #1 closure evidence) plus the full
flagship forward with cfg.fused_qk_attn.

Protocol per CLAUDE.md: device-serialized chains (the attention output has
the input's shape, so iterations chain directly), one scalar fetch per
timed block, medians over repeats. bf16 operands (the eval numeric policy).

Stage shapes (en4 @ 288x384, patch (1,1,2,2), window (2,9,9), T=10):
  stage0: 144x192 C=96  nh=3  -> x_windows [2, 1760, 9, 9, 96]
  stage1:  72x 96 C=192 nh=6  -> [2, 440, 9, 9, 192]
  stage2:  36x 48 C=384 nh=12 -> [2, 120, 9, 9, 384]
  stage3:  18x 24 C=768 nh=24 -> [2,  30, 9, 9, 768]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sdformerflow_tpu.models.common import SpikingConfig
from sdformerflow_tpu.models.spiking_swin import SpikingQKWindowAttention3D
from sdformerflow_tpu.ops.pallas_attn import (QKAttnParams, bn_eval_affine,
                                              fused_qk_attention)
from sdformerflow_tpu.utils.cache import enable_compilation_cache

STAGES = [  # (name, M, C, nh)
    ("stage0", 1760, 96, 3),
    ("stage1", 440, 192, 6),
    ("stage2", 120, 384, 12),
    ("stage3", 30, 768, 24),
]


def _params_from_module(C, nh, key, dtype):
    cfg = SpikingConfig(num_steps=2, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    mod = SpikingQKWindowAttention3D(dim=C, window_size=(2, 9, 9),
                                     num_heads=nh, cfg=cfg, norm="BN")
    x0 = jax.random.normal(key, (2, 4, 9, 9, C), jnp.float32)
    variables = jax.jit(lambda r, z: mod.init({"params": r}, z, None,
                                              False))(key, x0)
    # randomize (PERF_NOTES: degenerate inits hide rerouting; for timing it
    # also keeps firing rates realistic)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    ks = jax.random.split(jax.random.fold_in(key, 3), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(0.4 * jax.random.normal(k, l.shape), l.dtype)
                  for k, l in zip(ks, leaves)])
    variables = {"params": variables["params"],
                 "batch_stats": jax.tree_util.tree_map(
                     lambda a: jnp.abs(a) + 0.3, variables["batch_stats"])}
    p = variables["params"]
    s = variables["batch_stats"]

    def aff(scope):
        bn = p[scope]["bn"]["BatchNorm_0"]
        st = s[scope]["bn"]["BatchNorm_0"]
        return bn_eval_affine(bn["scale"], bn["bias"], st["mean"],
                              st["var"])

    aq, cq = aff("q")
    ak, ck = aff("k")
    ap, cp = bn_eval_affine(p["proj_bn"]["BatchNorm_0"]["scale"],
                            p["proj_bn"]["BatchNorm_0"]["bias"],
                            s["proj_bn"]["BatchNorm_0"]["mean"],
                            s["proj_bn"]["BatchNorm_0"]["var"])
    kp = QKAttnParams(
        w_in=p["proj_sn"]["weight"].astype(dtype),
        b_in=p["proj_sn"]["bias"].astype(dtype),
        wq=p["q"]["linear"]["kernel"].astype(dtype), aq=aq, cq=cq,
        w_q=p["q"]["sn"]["weight"].astype(dtype),
        b_q=p["q"]["sn"]["bias"].astype(dtype),
        wk=p["k"]["linear"]["kernel"].astype(dtype), ak=ak, ck=ck,
        pe=p["k"]["positional_encoding"].reshape(2, -1, C).astype(dtype),
        w_k=p["k"]["sn"]["weight"].astype(dtype),
        b_k=p["k"]["sn"]["bias"].astype(dtype),
        w_t=p["sn2_q"]["weight"].astype(dtype),
        b_t=p["sn2_q"]["bias"].astype(dtype),
        wp=p["proj"]["kernel"].astype(dtype),
        bp=p["proj"]["bias"].astype(dtype), ap=ap, cp=cp)
    cast_vars = {
        "params": jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                         variables["params"]),
        "batch_stats": variables["batch_stats"],
    }
    return mod, cast_vars, kp


def _time_chain(step, x, iters, repeats):
    y = step(x)  # compile + warm
    float(jnp.sum(y.astype(jnp.float32)))
    rates = []
    for _ in range(repeats):
        o = x
        t0 = time.perf_counter()
        for _ in range(iters):
            o = step(o)
        float(jnp.sum(o.astype(jnp.float32)))
        rates.append((time.perf_counter() - t0) / iters * 1e3)
    return statistics.median(rates)


def full_model(args):
    """bench.py protocol (288x384 en4, bf16, s2d embed) with and without
    cfg.fused_qk_attn."""
    from sdformerflow_tpu.models.common import SwinConfig
    from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
    from sdformerflow_tpu.ops.normalization import encode_input
    from sdformerflow_tpu.training.s2d_embed import s2d_model_and_variables

    h, w = 288, 384
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
    variables = jax.jit(lambda r, z: model.init({"params": r}, z, False))(
        rng, encode_input(chunk))
    model, variables = s2d_model_and_variables(model, variables)
    bench_vars = {
        "params": jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables.get("batch_stats", {}),
    }

    variants = {"both": (False, True), "base": (False,),
                "fused": (True,)}[args.variant]
    for fused in variants:
        m = model.clone(cfg=model.cfg.replace(fused_qk_attn=fused))

        @jax.jit
        def step(v, c, m=m):
            out = m.apply(v, encode_input(c).astype(jnp.bfloat16),
                          False)["flow"][-1]
            return c + 0.0 * out.sum().astype(jnp.float32)

        o = step(bench_vars, chunk)
        float(o.sum())
        rates = []
        for _ in range(args.repeats):
            o = chunk
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = step(bench_vars, o)
            float(o.sum())
            dt = time.perf_counter() - t0
            rates.append(args.iters / dt)
        med = statistics.median(rates)
        print(f"full en4 fused_qk_attn={fused}: {med:.2f} windows/s "
              f"(spread {min(rates):.2f}-{max(rates):.2f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--check", action="store_true",
                    help="also assert fused == xla on-chip (routing guard)")
    ap.add_argument("--full", action="store_true",
                    help="full-flagship A/B instead of per-stage")
    ap.add_argument("--variant", default="both",
                    choices=["both", "base", "fused"],
                    help="--full: which variant to run (cold remote "
                         "compiles exceed a single run's budget; run "
                         "variants separately, the cache persists)")
    args = ap.parse_args()
    enable_compilation_cache()
    dtype = jnp.dtype(args.dtype)
    if args.full:
        full_model(args)
        return

    print(f"backend={jax.default_backend()} dtype={dtype}")
    print(f"{'stage':8s} {'M':>5s} {'C':>4s} {'xla ms':>8s} {'fused ms':>9s}"
          f" {'speedup':>8s}")
    stages = list(STAGES)
    if args.check:
        # check-only case exercising the PADDED-block Mosaic codegen on
        # chip in f32 (en4 stage3's own C=768 exceeds VMEM in f32 — the
        # kernel falls back to pair-local there, see ops/pallas_attn.py —
        # so a stage3-geometry case at a VMEM-feasible C pins the padding
        # path's on-chip exactness; production bf16 stage3 uses the same
        # codegen with halved buffers)
        stages.append(("s3pad", 30, 256, 8))
    for name, M, C, nh in stages:
        key = jax.random.fold_in(jax.random.PRNGKey(0), C)
        mod, variables, kp = _params_from_module(C, nh, key, dtype)
        x = (jax.random.uniform(key, (2, M, 9, 9, C)) < 0.2).astype(dtype)

        @jax.jit
        def xla_step(z, variables=variables, mod=mod):
            out, _ = mod.apply(variables, z, None, False)
            return out.astype(z.dtype)

        @jax.jit
        def fused_step(z, kp=kp, nh=nh):
            return fused_qk_attention(z, kp, nh).astype(z.dtype)

        if args.check:
            # ON-CHIP ROUTING GUARD. Spiking nets are bitwise-chaotic
            # across numeric paths: ANY rounding difference near a
            # heaviside threshold flips a whole spike, and deeper stages
            # amplify one flip across a head's hd lanes — so comparing the
            # kernel against the flax MODULE on chip measures precision
            # composition, not routing (measured f32 module-vs-kernel frac:
            # 1e-5 at stage0 but 4.1e-2 at stage1 — the module's dots run
            # at TPU default precision and its BN is not pre-folded into
            # one affine). The routing guard therefore compares the kernel
            # against qk_attention_pairlocal — the SAME folded affines and
            # f64-bit-parity-tested algebra — with matmuls forced to
            # HIGHEST on both sides; residual diffs are accumulation-order
            #-only and must be rare. Exact-parity evidence lives in the
            # f64 interpret suite (tests/test_pallas_attn.py) and the
            # on-chip metric-identity of the trained-task eval
            # (PERF_NOTES round 5).
            import numpy as np
            from sdformerflow_tpu.ops.pallas_attn import (
                qk_attention_pairlocal)
            cx = x.astype(jnp.float32)
            with jax.default_matmul_precision("highest"):
                a = np.asarray(jax.jit(
                    lambda z, kp=kp, nh=nh: qk_attention_pairlocal(
                        z, kp, nh))(cx), jnp.float32)
                b = np.asarray(fused_step(cx), jnp.float32)
            frac = float(np.mean(np.abs(a - b) > 1e-2))
            print(f"  {name} on-chip (f32) max|pairlocal-fused| = "
                  f"{np.max(np.abs(a - b)):.3e}, frac>1e-2 = {frac:.2e}",
                  flush=True)
            assert frac < 5e-3, f"{name}: routing-level divergence {frac}"
        ms_x = _time_chain(xla_step, x, args.iters, args.repeats)
        ms_f = _time_chain(fused_step, x, args.iters, args.repeats)
        print(f"{name:8s} {M:5d} {C:4d} {ms_x:8.3f} {ms_f:9.3f}"
              f" {ms_x / ms_f:8.2f}x", flush=True)


if __name__ == "__main__":
    main()
