"""Long-horizon training-convergence A/B vs the reference (VERDICT r4 #2).

Runs N REAL optimizer steps (default 300) of the tiny-but-structured
flagship config in BOTH frameworks from an identical init on an identical
synthetic data stream, in f64 on CPU:

- torch: the ACTUAL reference model code (tests/refharness vendored-stub
  import of /root/reference/models/...), hand-looped line-by-line after
  train_flow_parallel_supervised_SNN.py:229-336 (encode -> forward ->
  flow_loss_supervised -> backward -> clip_grad_norm_(100) -> AdamW);
- JAX: this repo's real ``make_train_step`` (encode_input fused in-step).

Records both loss trajectories, their divergence profile (first step where
the relative gap crosses 1e-9 / 1e-6 / 1e-3), and the final eval-mode AEE
of both frameworks on a held-out batch. Optionally (--f32) repeats the JAX
run in f32 against the f64 run to bound where single-precision chaos takes
over (spiking nets are chaotic: a one-ULP flip at any heaviside crosses
trajectories — PERF_NOTES round 2's "f32 comparisons are chaotic by
nature"). Writes JSON to --out; the recorded round-5 result lives in
docs/convergence_ab.json and is summarized in PERF_NOTES.md.

Usage (CPU, ~15-25 min at the default 300 steps):
  JAX_PLATFORMS=cpu python scripts/convergence_ab.py --steps 300
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def _structured_item(rng, num_bins, h, w):
    """Moving-bar sample (data/dsec.py SyntheticEventFlowDataset
    structured=True, duplicated here so the stream is framework-neutral
    numpy)."""
    v = rng.uniform(-4, 4, size=2).astype(np.float64)
    chunk = np.zeros((num_bins, h, w), np.float64)
    ys, xs = np.mgrid[0:h, 0:w]
    cx = rng.uniform(0.25, 0.75) * w
    cy = rng.uniform(0.25, 0.75) * h
    for b in range(num_bins):
        frac = b / max(num_bins - 1, 1)
        bx, by = cx + frac * v[0], cy + frac * v[1]
        bar = (np.abs(xs - bx) < 2) | (np.abs(ys - by) < 2)
        chunk[b][bar] = 1.0 if b % 2 == 0 else -1.0
    label = np.broadcast_to(v[:, None, None], (2, h, w)).copy()
    mask = np.ones((1, h, w), np.float64)
    return chunk, mask, label


def _encode_ref(torch, chunk, spike_th):
    """Reference in-loop encoding (train_..._SNN.py:259-296)."""
    neg = torch.nn.functional.relu(-chunk)
    pos = torch.nn.functional.relu(chunk)
    chunk = torch.cat((torch.unsqueeze(pos, dim=2),
                       torch.unsqueeze(neg, dim=2)), dim=2)
    mn, mx = torch.min(chunk[chunk != 0]), torch.max(chunk[chunk != 0])
    if not mn == mx:
        chunk[chunk != 0] = (chunk[chunk != 0] - mn) / (mx - mn)
    if spike_th is not None:
        chunk[chunk > spike_th] = 1
        chunk[chunk < spike_th] = 0
    return chunk


def _aee(flow, label, mask):
    err = np.sqrt(((flow - label) ** 2).sum(axis=1))
    m = mask[:, 0] > 0
    return float(err[m].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, nargs=2, default=(48, 48))
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--spike_th", type=float, default=0.05)
    ap.add_argument("--out", default=str(REPO / "docs" /
                                         "convergence_ab.json"))
    ap.add_argument("--f32", action="store_true",
                    help="also run the JAX side in f32 (chaos bound)")
    args = ap.parse_args()

    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import torch
    from refharness import import_reference_models, sj_functional
    from test_reference_parity import _snn_cfg

    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    prev_float = torch.Tensor.float
    torch.Tensor.float = lambda self: self.to(torch.float64)

    h, w = args.size
    num_bins, clip, wd = 10, 100.0, 0.01
    m_cfg, s_cfg = _snn_cfg(
        "MS_SpikingformerFlowNet_en4", "psn", (1, 1, 1, 1), (2, 2, 4, 4),
        "MS_PED_Spiking_PatchEmbed_Conv_sfn", (h, w))
    s_cfg["drop_path_rate"] = 0.0
    # window (2,2,2): the conv-sfn embed downsamples 4x before stage 0, so
    # 48x64 input reaches stage 3 at 2x2 — the reference clamps the window
    # to the feature size but not its positional-encoding buffer
    # (Spiking_swin_transformer3D.py:678), so every stage must satisfy
    # H,W >= window. 2 does; the default 3 does not.
    s_cfg["window_size"] = [2, 2, 2]

    import importlib
    sys.path.insert(0, "/root/reference")
    ref_loss_mod = importlib.import_module("loss.flow_supervised")
    ref_snn, _ = import_reference_models()
    functional = sj_functional()

    import timm.models.layers as tml
    orig_dp = tml.DropPath.forward
    tml.DropPath.forward = lambda self, x: x

    # ---- shared init + data stream
    torch.manual_seed(0)
    tmodel = ref_snn.MS_SpikingformerFlowNet_en4(m_cfg.copy(), s_cfg.copy())
    tmodel.init_weights()
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    tmodel.train()
    sd0 = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

    stream = np.random.RandomState(97)
    batches = [_structured_item(stream, num_bins, h, w)
               for _ in range(args.steps)]
    eval_batch = _structured_item(np.random.RandomState(1234), num_bins,
                                  h, w)

    # ---- torch loop (reference line-by-line)
    loss_cfg = {"metrics": {"flow_scaling": 1.0},
                "loss": {"lambda_mod": 1.0, "lambda_ang": 0.0}}
    t_loss_fn = ref_loss_mod.flow_loss_supervised(loss_cfg, device="cpu")
    opt = torch.optim.AdamW(tmodel.parameters(), lr=args.lr,
                            weight_decay=wd)
    t_losses = []
    t0 = time.time()
    for i, (chunk, mask, label) in enumerate(batches):
        functional.reset_net(tmodel)
        functional.set_step_mode(tmodel, "m")
        x = _encode_ref(torch, torch.from_numpy(chunk[None]), args.spike_th)
        pred = tmodel(x)
        loss = t_loss_fn(pred["flow"], torch.from_numpy(label[None]),
                         torch.from_numpy(mask[None]), gamma=None)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad.clip_grad_norm_(tmodel.parameters(), clip)
        opt.step()
        t_losses.append(float(loss.item()))
        if (i + 1) % 25 == 0:
            print(f"torch step {i + 1}/{args.steps} loss {t_losses[-1]:.6f}"
                  f" ({time.time() - t0:.0f}s)", flush=True)
    # eval-mode final AEE
    tmodel.eval()
    with torch.no_grad():
        functional.reset_net(tmodel)
        functional.set_step_mode(tmodel, "m")
        x = _encode_ref(torch, torch.from_numpy(eval_batch[0][None]),
                        args.spike_th)
        t_flow = tmodel(x)["flow"][-1].numpy()
    t_aee = _aee(t_flow, eval_batch[2][None], eval_batch[1][None])
    tml.DropPath.forward = orig_dp
    torch.set_default_dtype(prev_dtype)
    torch.Tensor.float = prev_float

    # ---- JAX loop(s)
    import jax.numpy as jnp
    from sdformerflow_tpu.models import get_model
    from sdformerflow_tpu.training import torch_interop as TI
    from sdformerflow_tpu.training.config import build_configs
    from sdformerflow_tpu.training.optim import build_optimizer
    from sdformerflow_tpu.training.train_step import (TrainState,
                                                      make_train_step)

    cfg = {"model": m_cfg, "swin_transformer": s_cfg, "loader": {}}
    mc, sw, sp = build_configs(cfg)
    model = get_model(m_cfg["name"], mc, sw, sp)
    depths = tuple(s_cfg["swin_depths"])
    params0, bs0, unmatched = TI.convert_state_dict(
        sd0, num_stages=len(depths), max_depth=max(depths),
        num_encoders=len(depths), family="snn")
    unmatched = [k for k in unmatched
                 if "relative_position_index" not in k
                 and "relative_coords_table" not in k]
    assert unmatched == [], unmatched

    def run_jax(x64: bool):
        def cast(t):
            dt = jnp.float64 if x64 else jnp.float32
            return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), t)

        with jax.enable_x64(x64):
            tx = build_optimizer(lr=args.lr, weight_decay=wd,
                                 milestones=(), steps_per_epoch=10 ** 9,
                                 clip_grad=clip)
            state = TrainState.create(apply_fn=model.apply,
                                      params=cast(params0),
                                      batch_stats=cast(bs0), tx=tx)
            step = make_train_step(donate=False, spike_th=args.spike_th)
            losses = []
            t1 = time.time()
            for i, (chunk, mask, label) in enumerate(batches):
                batch = {"chunk": jnp.asarray(chunk[None]),
                         "label": jnp.asarray(label[None]),
                         "mask": jnp.asarray(mask[None])}
                state, metrics = step(state, batch, jax.random.PRNGKey(0))
                losses.append(float(metrics["loss"]))
                if (i + 1) % 25 == 0:
                    print(f"jax({'f64' if x64 else 'f32'}) step "
                          f"{i + 1}/{args.steps} loss {losses[-1]:.6f}"
                          f" ({time.time() - t1:.0f}s)", flush=True)
            from sdformerflow_tpu.training.train_step import make_eval_step
            ev = make_eval_step(spike_th=args.spike_th)
            flow = np.asarray(ev(state, jnp.asarray(eval_batch[0][None]))[-1])
            aee = _aee(flow, eval_batch[2][None], eval_batch[1][None])
        return losses, aee

    j_losses, j_aee = run_jax(x64=True)

    def divergence(a, b):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b) / (np.abs(b) + 1e-12)
        cross = {}
        for th in (1e-9, 1e-6, 1e-3):
            idx = np.nonzero(rel > th)[0]
            cross[f"first_step_rel_gt_{th:g}"] = (int(idx[0]) if len(idx)
                                                  else None)
        return {"max_rel": float(rel.max()),
                "final_rel": float(rel[-1]), **cross}

    result = {
        "steps": args.steps, "size": [h, w], "lr": args.lr,
        "torch_loss_first": t_losses[0], "torch_loss_last": t_losses[-1],
        "jax_loss_first": j_losses[0], "jax_loss_last": j_losses[-1],
        "torch_final_aee": t_aee, "jax_f64_final_aee": j_aee,
        "f64_divergence": divergence(j_losses, t_losses),
        "torch_losses": t_losses, "jax_f64_losses": j_losses,
    }
    if args.f32:
        j32_losses, j32_aee = run_jax(x64=False)
        result["jax_f32_final_aee"] = j32_aee
        result["f32_vs_f64_divergence"] = divergence(j32_losses, j_losses)
        result["jax_f32_losses"] = j32_losses

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    summary = {k: v for k, v in result.items()
               if not k.endswith("losses")}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
