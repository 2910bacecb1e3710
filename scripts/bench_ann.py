"""ANN family (STTFlowNet) benchmark at the DSEC protocol shapes.

BASELINE.json config #1 is "STTFlowNet ANN inference on DSEC 10-bin voxel
grids"; the reference model surface is
/root/reference/models/STSwinNet/STSwinNet.py:309-484 with the softmax
window attention at STswin_transformer.py:83-167 (v1) /
swin_transformer3D_v2.py (cosine attention). This measures the bf16 eval
forward and (optionally) the bf16 train step, mirroring the reference's
train_DSEC_supervised_STT_voxel.yml geometry: 288x384 crop, num_bins=20,
num_chunks=2 (two-window input, 40 bins), swin_patch_size (10,4,4) ->
num_split=2, depths (2,2,6), heads (3,6,12), window (2,9,9).

Usage: python scripts/bench_ann.py [--arc=swinv1|swinv2] [--train]
           [--batch=N] [--profile]
Timing discipline matches bench.py (data-dependency chaining, single fetch,
median of repeats — block_until_ready does not wait through the axon
tunnel). Numbers recorded in PERF_NOTES.md "ANN family".
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.models.ann_flownet import STTFlowNet
from sdformerflow_tpu.models.common import SwinConfig
from sdformerflow_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    arc = "swinv1"
    batch = 1
    for a in sys.argv[1:]:
        if a.startswith("--arc="):
            arc = a.split("=", 1)[1]
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
    h, w = 288, 384
    num_bins = 20
    swin = SwinConfig(
        arc_type=arc, patch_embed_type="PatchEmbedLocal",
        input_size=(h, w), patch_size=(10, 4, 4), depths=(2, 2, 6),
        num_heads=(3, 6, 12), out_indices=(0, 1, 2), window_size=(2, 9, 9),
        qk_scale=0.125 if arc == "swinv1" else None, drop_path_rate=0.2)
    model = STTFlowNet(swin=swin, num_bins=num_bins, base_num_channels=96,
                       num_encoders=3, use_upsample_conv=True, norm=None,
                       norm_input=True)

    rng = jax.random.PRNGKey(0)
    # two-window DSEC input: chunk1 (reference frames) + chunk2
    chunk = jax.random.normal(rng, (batch, 2 * num_bins, h, w), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(
        {"params": r, "droppath": jax.random.fold_in(r, 1)}, x, False))(
            rng, chunk)
    print(f"arc={arc} batch={batch} params="
          f"{sum(x.size for x in jax.tree_util.tree_leaves(variables['params']))/1e6:.1f}M")

    if "--train" in sys.argv:
        from sdformerflow_tpu.training.optim import build_optimizer
        from sdformerflow_tpu.training.train_step import (TrainState,
                                                          make_train_step)
        tx = build_optimizer(lr=1e-3, steps_per_epoch=100, clip_grad=None)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)
        rg = np.random.default_rng(0)
        batch_d = {
            "chunk": chunk,
            "label": jnp.asarray(rg.normal(0, 1, (batch, 2, h, w)),
                                 jnp.float32),
            "mask": jnp.ones((batch, 1, h, w), jnp.float32),
        }
        # ANN trainer encoding: no polarity split, no driver-side norm (the
        # model's own norm_input handles normalization) — encode_input is an
        # identity here, matching train_loop's ANN dispatch
        remat = next((a.split("=")[1] for a in sys.argv
                      if a.startswith("--remat=")), None)
        step = make_train_step(encoding="voxel", polarity=False,
                               norm_input=None, compute_dtype=jnp.bfloat16,
                               donate=True, remat=remat)
        st, m = step(state, batch_d, jax.random.PRNGKey(1))
        print("loss:", float(m["loss"]))
        iters, repeats, rates = 5, 5, []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for i in range(iters):
                st, m = step(st, batch_d, jax.random.PRNGKey(i))
            float(m["loss"])
            rates.append((time.perf_counter() - t0) / iters * 1e3)
        print(f"ANN {arc} train step (batch={batch}): "
              f"{statistics.median(rates):.1f} ms/step")
        if "--profile" in sys.argv:
            import shutil
            shutil.rmtree("/tmp/prof_ann_train", ignore_errors=True)
            with jax.profiler.trace("/tmp/prof_ann_train"):
                for i in range(5):
                    st, m = step(st, batch_d, jax.random.PRNGKey(i))
                float(m["loss"])
            print("profile written to /tmp/prof_ann_train")
        return

    bench_vars = {"params": jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), variables["params"])}
    if variables.get("batch_stats"):
        bench_vars["batch_stats"] = variables["batch_stats"]

    @jax.jit
    def fwd(v, c):
        out = model.apply(v, c.astype(jnp.bfloat16), False)["flow"][-1]
        return c + 0.0 * out.sum().astype(jnp.float32)

    float(fwd(bench_vars, chunk).sum())  # compile
    iters, repeats, rates = 10, 5, []
    for _ in range(repeats):
        o = chunk
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fwd(bench_vars, o)
        float(o.sum())
        el = time.perf_counter() - t0
        rates.append(batch * iters / el)
    wps = statistics.median(rates)
    print(f"ANN {arc} eval forward (batch={batch}): {wps:.1f} windows/s "
          f"({1e3 * batch / wps:.1f} ms/window)")

    if "--profile" in sys.argv:
        import shutil
        shutil.rmtree("/tmp/prof_ann", ignore_errors=True)
        with jax.profiler.trace("/tmp/prof_ann"):
            o = chunk
            for _ in range(5):
                o = fwd(bench_vars, o)
            float(o.sum())
        print("profile written to /tmp/prof_ann")


if __name__ == "__main__":
    main()
