"""Benchmark: SDformerFlow (MS_SpikingformerFlowNet_en4) inference throughput
on the DSEC eval protocol shapes (288x384 center crop, 10-bin per-polarity
voxels, T=10, PSN neurons) on one TPU chip, bf16 inference path.

Methodology note: through the axon TPU tunnel ``block_until_ready`` does not
reliably wait for execution, so iterations are serialized by feeding each
forward's output into the next input (device-side data dependency) and the
result is fetched once at the end — this measures true device time. Single
runs are noisy; the reported number is the median of R repeated timed runs.

Numeric policy matches ``make_eval_step`` (training/train_step.py): params
and activations cast to bf16, BatchNorm ``batch_stats`` kept in f32 — the
same HLO the eval driver executes — plus the two exact inference
re-expressions the eval driver exposes (``eval_dsec.py --s2d_embed
--fused_attn``):

- space-to-depth embed (training/s2d_embed.py, f64-parity-tested in
  tests/test_s2d_embed.py): the full-resolution embed segment runs in 2x2
  block space, avoiding the C=48 lane-padding tax (1.13x end-to-end);
- fused Pallas spiking-QK window attention (ops/pallas_attn.py,
  f64-bit-parity-tested in tests/test_pallas_attn.py /
  test_fused_attn_model.py, metric-identical on chip on the trained tiny
  task): one kernel per even block of window columns computes spikes, q/k
  linears+affines, positional encoding, att_token and the fold product in
  VMEM, eliminating the module path's window fold/refold relayout chain
  (+13% end-to-end, PERF_NOTES.md round 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numeric throughput baseline (BASELINE.md);
vs_baseline is the ratio against this framework's recorded round-1 number
(BENCH_r01.json: 53.828 windows/sec/chip).
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.s2d_embed import s2d_model_and_variables
from sdformerflow_tpu.utils.cache import enable_compilation_cache

R01_BASELINE = 53.828  # windows/sec/chip, BENCH_r01.json


def main():
    enable_compilation_cache()
    h, w = 288, 384
    batch = 1  # DSEC eval protocol uses batch_size 1
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
    chunk = jax.random.normal(rng, (batch, 10, h, w), jnp.float32)
    variables = jax.jit(lambda r, x: model.init({"params": r}, x, False))(
        rng, encode_input(chunk))
    # exact s2d re-expression of the embed head (inference-only)
    model, variables = s2d_model_and_variables(model, variables)
    # fused Pallas QK attention (inference-only; identical variable tree)
    model = model.clone(cfg=model.cfg.replace(fused_qk_attn=True))
    # eval-step numeric policy: bf16 params, f32 batch_stats
    bench_vars = {
        "params": jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables.get("batch_stats", {}),
    }

    @jax.jit
    def step(v, c):
        out = model.apply(v, encode_input(c).astype(jnp.bfloat16),
                          False)["flow"][-1]
        # chain: next input depends on this forward's output
        return c + 0.0 * out.sum().astype(jnp.float32)

    # warmup / compile
    float(step(bench_vars, chunk).sum())

    iters = 20
    repeats = 5
    rates = []
    for _ in range(repeats):
        o = chunk
        start = time.perf_counter()
        for _ in range(iters):
            o = step(bench_vars, o)
        float(o.sum())  # single forced fetch per timed run
        elapsed = time.perf_counter() - start
        rates.append(batch * iters / elapsed)
    windows_per_sec = statistics.median(rates)

    # Honest-noise reporting (repo methodology, CLAUDE.md): single runs
    # through the axon tunnel vary a few percent run to run; the headline is
    # the median of ``repeats`` timed runs and the min/max spread of those
    # runs is published alongside it so round-over-round drifts inside the
    # spread are attributable to measurement noise, not regressions.
    print(json.dumps({
        "metric": "sdformerflow_en4_dsec_eval_inference",
        "value": round(windows_per_sec, 3),
        "unit": "windows/sec/chip",
        "vs_baseline": round(windows_per_sec / R01_BASELINE, 3),
        "spread_min": round(min(rates), 3),
        "spread_max": round(max(rates), 3),
        "n_runs": repeats,
    }))


if __name__ == "__main__":
    main()
