"""Full-scale events-path TRAIN step + sustained soak (VERDICT r3 #2).

One jitted step: 2^20 raw events -> on-device voxelize 480x640x15 (Pallas)
-> center crop 288x384 -> en4 flagship fwd+bwd+AdamW update, bf16 compute.
Mirrors the eval-side bench (scripts/bench_events_path.py) for the TRAINING
step, i.e. the on-the-fly path that replaces the reference's offline
preprocessing (/root/reference/DSEC_dataloader/DSEC_dataset_preprocess.py:
78-213) feeding train_flow_parallel_supervised_SNN.py:229-336.

Soak mode (--soak) measures SUSTAINED steps/s with the host in the loop:
the producer thread draws a fresh event window and runs the C++ counting
sort (native.pack_window_sorted, the 23-35 ms/window host cost) per step,
overlapped with device compute via host_prefetch + double-buffered H2D
(parallel/mesh.py). NB through the axon tunnel the H2D of ~20 MB of event
buffers per step is wire-bound; the device-resident step time is the
architecture number, the soak number additionally carries the tunnel wire
tax (absent on a real PCIe-attached host).

Usage: python scripts/bench_events_train.py [--xla] [--unsorted] [--s2d]
           [--soak] [--steps=N]
Numbers recorded in PERF_NOTES.md "Full-scale events-path TRAIN (round 4)".
"""
import os, statistics, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_train_step)
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.utils.cache import enable_compilation_cache
from sdformerflow_tpu import native

enable_compilation_cache()
H, W, BINS = 480, 640, 15
ch, cw = 288, 384
N = 1 << 20

swin = SwinConfig(arc_type="swinv1",
    patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
    input_size=(ch, cw), patch_size=(1, 1, 2, 2), depths=(2, 2, 6, 2),
    num_heads=(3, 6, 12, 24), out_indices=(0, 1, 2, 3),
    window_size=(2, 9, 9), qk_scale=0.125, drop_path_rate=0.2)
cfg = SpikingConfig(num_steps=10, v_th=0.1, v_reset=None,
                    neuron_type="psn", spike_norm="BN",
                    s2d_train="--s2d" in sys.argv)
model = SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=10,
                             base_num_channels=96, num_encoders=4,
                             use_upsample_conv=False, ms=True)


def _window(rng):
    x = rng.uniform(0, W - 1, N).astype(np.float32)
    y = rng.uniform(0, H - 1, N).astype(np.float32)
    t = np.sort(rng.uniform(0, 1, N)).astype(np.float32)
    p = rng.integers(0, 2, N).astype(np.float32)
    return x, y, t, p


def _pack_sorted(x, y, t, p):
    xs, ys, ts, ps, valid = native.pack_window_sorted(x, y, t, p, N,
                                                      height=H, t0=0.0)
    return {"x": xs[None], "y": ys[None], "t": ts[None], "p": ps[None],
            "valid": valid[None]}


def main():
    use_pallas = "--xla" not in sys.argv
    presorted = use_pallas and "--unsorted" not in sys.argv
    rng = np.random.default_rng(0)
    x, y, t, p = _window(rng)
    if presorted:
        ev = {k: jnp.asarray(v) for k, v in _pack_sorted(x, y, t, p).items()}
    else:
        ev = {"x": jnp.asarray(x[None]), "y": jnp.asarray(y[None]),
              "t": jnp.asarray(t[None]), "p": jnp.asarray(p[None]),
              "valid": jnp.ones((1, N), bool)}
    label = jnp.asarray(rng.normal(0, 1, (1, 2, ch, cw)), jnp.float32)
    mask = jnp.ones((1, 1, ch, cw), jnp.float32)

    tx = build_optimizer(lr=1e-4, steps_per_epoch=100, clip_grad=100.0)
    sample = encode_input(jnp.zeros((1, 10, ch, cw)))
    state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
    vox = dict(num_bins=BINS, height=H, width=W, use_pallas=use_pallas,
               presorted=presorted)
    step = make_train_step(voxelize=vox, crop=(ch, cw),
                           compute_dtype=jnp.bfloat16, donate=True)

    tag = ("pallas+presorted" if presorted
           else ("pallas" if use_pallas else "xla scatter"))
    if cfg.s2d_train:
        tag += "+s2d"
    batch = {"events": ev, "label": label, "mask": mask}
    state, m = step(state, batch, jax.random.PRNGKey(1))
    print("loss:", float(m["loss"]))

    if "--soak" in sys.argv:
        # sustained: host draws + packs a fresh window per step (the real
        # producer cost), device consumes via prefetch; one fetch per block
        from sdformerflow_tpu.parallel.mesh import host_prefetch
        n_steps = int(next((a.split("=")[1] for a in sys.argv
                            if a.startswith("--steps=")), "48"))
        lab, msk = np.asarray(label), np.asarray(mask)

        def producer():
            r = np.random.default_rng(7)
            for _ in range(n_steps):
                xx, yy, tt, pp = _window(r)
                yield {"events": _pack_sorted(xx, yy, tt, pp),
                       "label": lab, "mask": msk}

        # measure the bare pack cost once for the report
        t0 = time.perf_counter()
        xx, yy, tt, pp = _window(np.random.default_rng(9))
        t1 = time.perf_counter()
        _pack_sorted(xx, yy, tt, pp)
        t2 = time.perf_counter()
        print(f"host window draw {1e3*(t1-t0):.1f} ms, "
              f"pack_window_sorted {1e3*(t2-t1):.1f} ms")

        losses = []
        t0 = time.perf_counter()
        for b in host_prefetch(producer(), size=2):
            dev = {"events": {k: jnp.asarray(v) for k, v in
                              b["events"].items()},
                   "label": jnp.asarray(b["label"]),
                   "mask": jnp.asarray(b["mask"])}
            state, m = step(state, dev, jax.random.PRNGKey(2))
            losses.append(m["loss"])
        _ = float(jnp.stack(losses).sum())
        el = time.perf_counter() - t0
        print(f"events TRAIN soak ({tag}): {n_steps / el:.2f} steps/s "
              f"sustained ({1e3 * el / n_steps:.1f} ms/step incl. host+wire)")
        return

    # device-resident step rate: state carries the data dependency; one
    # fetch at the end (block_until_ready lies through the tunnel)
    iters, repeats, rates = 5, 5, []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        float(m["loss"])
        rates.append((time.perf_counter() - t0) / iters * 1e3)
    print(f"events TRAIN step ({tag}): {statistics.median(rates):.1f} "
          "ms/step (device-resident)")


if __name__ == "__main__":
    main()
