"""Full-scale events-path eval step: 480x640x15 voxelize (2^20 events) ->
288x384 crop -> en4 forward, one jitted step on the chip. Pallas voxelizer vs
XLA scatter fallback; numbers in PERF_NOTES.md "Full-scale events-path eval
step (round 3)"."""
import os, statistics, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_eval_step,
                                                  make_train_step)
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
H, W, BINS = 480, 640, 15
ch, cw = 288, 384
N = 1 << 20
swin = SwinConfig(arc_type="swinv1",
    patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
    input_size=(ch, cw), patch_size=(1, 1, 2, 2), depths=(2, 2, 6, 2),
    num_heads=(3, 6, 12, 24), out_indices=(0, 1, 2, 3),
    window_size=(2, 9, 9), qk_scale=0.125)
cfg = SpikingConfig(num_steps=10, v_th=0.1, v_reset=None,
                    neuron_type="psn", spike_norm="BN")
# note: eval protocol voxelizes at 15 bins and the model reads the first 10
model = SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=10,
                             base_num_channels=96, num_encoders=4,
                             use_upsample_conv=False, ms=True)
rng = np.random.default_rng(0)
ev = {
    "x": jnp.asarray(rng.uniform(0, W - 1, (1, N)).astype(np.float32)),
    "y": jnp.asarray(rng.uniform(0, H - 1, (1, N)).astype(np.float32)),
    "t": jnp.asarray(np.sort(rng.uniform(0, 1, (1, N)), axis=1).astype(np.float32)),
    "p": jnp.asarray(rng.integers(0, 2, (1, N)).astype(np.float32)),
    "valid": jnp.ones((1, N), bool),
}
tx = build_optimizer(lr=1e-4, steps_per_epoch=10)
sample = encode_input(jnp.zeros((1, 10, ch, cw)))
state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
vox = dict(num_bins=BINS, height=H, width=W)

from sdformerflow_tpu import native
_xs, _ys, _ts, _ps, _valid = native.pack_window_sorted(
    np.asarray(ev["x"][0]), np.asarray(ev["y"][0]), np.asarray(ev["t"][0]),
    np.asarray(ev["p"][0]), N, height=H, t0=0.0)
ev_sorted = {"x": jnp.asarray(_xs[None]), "y": jnp.asarray(_ys[None]),
             "t": jnp.asarray(_ts[None]), "p": jnp.asarray(_ps[None]),
             "valid": jnp.asarray(_valid[None])}


def run(use_pallas, label, presorted=False, st=None):
    st = state if st is None else st
    events = ev_sorted if presorted else ev
    es = make_eval_step(voxelize=dict(**vox, use_pallas=use_pallas,
                                      presorted=presorted),
                        crop=(ch, cw), compute_dtype=jnp.bfloat16)
    out = es(st, events)
    assert np.isfinite(np.asarray(out[-1], np.float32)).all()
    def chained(e):
        f = es(st, e)[-1]
        return {**e, "t": e["t"] + 0.0 * f.sum().astype(jnp.float32)}
    cf = jax.jit(chained)
    o = cf(events); float(np.asarray(o["t"], np.float32).sum())
    rr = []
    for _ in range(5):
        o = events
        t0 = time.perf_counter()
        for _ in range(10):
            o = cf(o)
        float(np.asarray(o["t"], np.float32).sum())
        rr.append((time.perf_counter() - t0) / 10 * 1e3)
    print(f"{label}: {statistics.median(rr):.1f} ms/window")

run(True, "events eval step (pallas voxelizer)")
run(True, "events eval step (pallas, host-presorted)", presorted=True)
run(False, "events eval step (xla scatter)   ")

# the PRODUCTION inference composition: host-presorted Pallas voxelize +
# s2d embed re-expression + fused Pallas QK attention (both exact for the
# eval protocol; same flags as eval_dsec.py --s2d_embed --fused_attn)
import dataclasses
from sdformerflow_tpu.training.s2d_embed import s2d_state
model_p, state_p = s2d_state(model, state)
model_p = model_p.clone(cfg=model_p.cfg.replace(fused_qk_attn=True))
state_p = dataclasses.replace(state_p, apply_fn=model_p.apply)
run(True, "events eval step (production: presorted+s2d+fused)",
    presorted=True, st=state_p)
