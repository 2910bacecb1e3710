"""Full-model probe: flagship en4 eval forward (bench.py protocol) with and
without the s2d embed re-expression (cfg.s2d_embed + s2d_embed_variables).

Run on the TPU chip:  PYTHONPATH=... python scripts/bench_s2d_full.py
"""
import statistics
import time

import jax
import jax.numpy as jnp

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.s2d_embed import s2d_model_and_variables
from sdformerflow_tpu.utils.cache import enable_compilation_cache


def run(model, bench_vars, chunk, tag, iters=20, repeats=5):
    @jax.jit
    def step(v, c):
        out = model.apply(v, encode_input(c).astype(jnp.bfloat16),
                          False)["flow"][-1]
        return c + 0.0 * out.sum().astype(jnp.float32)

    float(step(bench_vars, chunk).sum())
    rates = []
    for _ in range(repeats):
        o = chunk
        start = time.perf_counter()
        for _ in range(iters):
            o = step(bench_vars, o)
        float(o.sum())
        rates.append(iters / (time.perf_counter() - start))
    med = statistics.median(rates)
    print(f"{tag:28s} {med:7.2f} windows/s  ({1e3 / med:.2f} ms)")
    return med


def main():
    enable_compilation_cache()
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
    variables = jax.jit(lambda r, x: model.init({"params": r}, x, False))(
        rng, encode_input(chunk))

    def to_bf16(v):
        return {"params": jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16), v["params"]),
                "batch_stats": v.get("batch_stats", {})}

    model_s, vars_s = s2d_model_and_variables(model, variables)
    base = run(model, to_bf16(variables), chunk, "baseline en4")
    s2d = run(model_s, to_bf16(vars_s), chunk, "s2d-embed en4")
    print(f"speedup: {s2d / base:.3f}x")


if __name__ == "__main__":
    main()
