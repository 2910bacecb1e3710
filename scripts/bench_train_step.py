"""Flagship train-step benchmark at eval size (288x384, bf16).

Usage: python scripts/bench_train_step.py [--donate] [--remat=dots]
           [--profile] [--s2d] [--batch=N]
--s2d runs the train-capable space-to-depth embed re-expression
(cfg.s2d_train — exact, reference-shaped params; tests/test_s2d_train.py).
Numbers recorded in PERF_NOTES.md "Train step round 3/4"."""
import os, statistics, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import create_train_state, make_train_step
from sdformerflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
h, w = 288, 384
swin = SwinConfig(arc_type="swinv1",
    patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
    input_size=(h, w), patch_size=(1, 1, 2, 2), depths=(2, 2, 6, 2),
    num_heads=(3, 6, 12, 24), out_indices=(0, 1, 2, 3),
    window_size=(2, 9, 9), qk_scale=0.125, drop_path_rate=0.2)
cfg = SpikingConfig(num_steps=10, v_th=0.1, v_reset=None,
                    neuron_type="psn", spike_norm="BN",
                    s2d_train="--s2d" in sys.argv,
                    pairlocal_attn="--pairlocal" in sys.argv)
model = SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=10,
                             base_num_channels=96, num_encoders=4,
                             use_upsample_conv=False, ms=True)
rng = np.random.default_rng(0)
B = int(next((a.split("=")[1] for a in sys.argv
              if a.startswith("--batch=")), "1"))
batch = {
    "chunk": jnp.asarray(rng.normal(0, 1, (B, 10, h, w)), jnp.float32),
    "label": jnp.asarray(rng.normal(0, 1, (B, 2, h, w)), jnp.float32),
    "mask": jnp.ones((B, 1, h, w), jnp.float32),
}
tx = build_optimizer(lr=1e-4, steps_per_epoch=100, clip_grad=100.0)
state = create_train_state(model, tx, encode_input(batch["chunk"]), jax.random.PRNGKey(0))
_remat = None
for a in sys.argv:
    if a.startswith("--remat="):
        _remat = a.split("=")[1]
step = make_train_step(compute_dtype=jnp.bfloat16,
                       donate="--donate" in sys.argv, remat=_remat)

# warmup/compile
s2, m = step(state, batch, jax.random.PRNGKey(1))
print("loss:", float(m["loss"]))

iters, repeats = 10, 5
rates = []
st = s2  # thread one state chain: with --donate earlier states are dead
for _ in range(repeats):
    t0 = time.perf_counter()
    for i in range(iters):
        st, m = step(st, batch, jax.random.PRNGKey(i))
    float(m["loss"])  # forces the chain
    rates.append((time.perf_counter() - t0) / iters * 1e3)
ms = statistics.median(rates)
print(f"train step (batch={B}): {ms:.1f} ms/step "
      f"({1e3 * B / ms:.1f} windows/s)")

if "--profile" in sys.argv:
    import shutil
    shutil.rmtree("/tmp/prof_train", ignore_errors=True)
    with jax.profiler.trace("/tmp/prof_train"):
        for i in range(5):
            st, m = step(st, batch, jax.random.PRNGKey(i))
        float(m["loss"])
    print("profile written")
