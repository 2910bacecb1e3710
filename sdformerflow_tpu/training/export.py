"""AOT model export — serialize the inference step to StableHLO artifacts.

The reference deploys by unpickling the torch module inside an eval script
(/root/reference/eval_DSEC_flow_SNN.py:87-99 via mlflow.pytorch); running it
anywhere requires the full model code + spikingjelly + the exact class
graph. The TPU-native deployment unit is instead the *compiled program*:
``jax.export`` serializes the jitted eval step — model weights baked in as
constants — to a versioned StableHLO artifact that any JAX process (same or
newer jaxlib, no model code, no framework import) can deserialize and call.

Artifacts written by :func:`export_flow_model` into ``out_dir``:

- ``voxel.stablehlo`` — flow from a preprocessed voxel chunk
  ``[B, bins(, 2), H, W] f32`` (crop size), the eval-protocol step.
- ``events_<N>.stablehlo`` — one per requested event bucket: flow from raw
  padded event buffers ``{x,y,t,p: [B, N] f32, valid: [B, N] bool}``,
  voxelized on device (Pallas on TPU) and center-cropped, the serving step.
- ``export_meta.json`` — shapes, dtypes, platforms, bucket list.

Both accept the same inputs as the steps built by
``training.train_step.make_eval_step`` and return the finest-scale flow
``[B, 2, H, W] f32``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

META_NAME = "export_meta.json"


def build_inference_state(config: dict, ckpt: Optional[str] = None,
                          s2d: bool = False, fused_attn: bool = False):
    """Init a TrainState for inference from a merged config, optionally
    restoring ``ckpt`` (Orbax dir) — the same construction the serving
    engine and eval drivers use. ``s2d=True`` applies the exact
    space-to-depth embed re-expression (training/s2d_embed.py) after the
    restore, so the exported/served program carries the +13% TPU forward.
    ``fused_attn=True`` additionally swaps in the fused Pallas spiking-QK
    window-attention kernel (ops/pallas_attn.py; the exported artifact then
    carries a Mosaic ``tpu_custom_call`` — TPU-platform exports only)."""
    from ..models import get_model
    from ..ops.normalization import encode_input
    from .config import build_configs
    from .optim import build_optimizer
    from .train_step import create_train_state

    model_cfg, swin_cfg, spiking_cfg = build_configs(config)
    name = config["model"]["name"]
    model = get_model(name, model_cfg, swin_cfg, spiking_cfg)
    crop = config["loader"].get("crop")
    h, w = tuple(crop) if crop else tuple(
        config["loader"].get("resolution", (480, 640)))
    sample = jnp.zeros((1, config["data"].get("num_frames", 10), h, w),
                       jnp.float32)
    sample_enc = encode_input(
        sample, encoding=config["model"].get("encoding", "voxel"),
        polarity=config["loader"].get("polarity", True)
        and "Spiking" in name,
        norm_input=config["model"].get("norm_input"),
        spike_th=config["data"].get("spike_th"))
    tx = build_optimizer(lr=1e-4, steps_per_epoch=1)
    state = create_train_state(model, tx, sample_enc, jax.random.PRNGKey(0))
    if ckpt is not None:
        from .checkpoints import restore_checkpoint
        state, _ = restore_checkpoint(ckpt, state)
    if s2d:
        from .s2d_embed import s2d_state
        model, state = s2d_state(model, state)
    if fused_attn:
        import dataclasses
        model = model.clone(cfg=model.cfg.replace(fused_qk_attn=True))
        state = dataclasses.replace(state, apply_fn=model.apply)
    return state


def _eval_fn(config: dict, state, *, bf16: bool, events: bool):
    """The inference fn with weights closed over (baked as constants)."""
    from .train_step import make_eval_step

    kw = dict(
        encoding=config["model"].get("encoding", "voxel"),
        polarity=config["loader"].get("polarity", True)
        and "Spiking" in config["model"]["name"],
        norm_input=config["model"].get("norm_input"),
        spike_th=config["data"].get("spike_th"),
        compute_dtype=jnp.bfloat16 if bf16 else None,
    )
    if events:
        res = tuple(config["loader"].get("resolution", (480, 640)))
        crop = config["loader"].get("crop")
        step = make_eval_step(
            **kw,
            voxelize=dict(num_bins=config["data"].get("num_frames", 10),
                          height=res[0], width=res[1]),
            crop=tuple(crop) if crop else None)
    else:
        step = make_eval_step(**kw)

    def fn(x):
        return step(state, x)[-1]  # finest scale [B, 2, H, W]

    return fn


def export_flow_model(config: dict, state, out_dir: str, *,
                      bf16: bool = True, batch: int = 1,
                      platforms: Optional[Sequence[str]] = None,
                      event_buckets: Sequence[int] = ()) -> dict:
    """Export the voxel-input eval step (and optional raw-events steps, one
    per padded bucket size) as StableHLO artifacts under ``out_dir``.

    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` for a multi-platform artifact.
    Returns the metadata dict (also written to ``export_meta.json``).
    """
    os.makedirs(out_dir, exist_ok=True)
    platforms = list(platforms) if platforms else [jax.default_backend()]

    num_bins = config["data"].get("num_frames", 10)
    res = tuple(config["loader"].get("resolution", (480, 640)))
    crop = config["loader"].get("crop")
    h, w = tuple(crop) if crop else res

    meta = {"platforms": platforms, "bf16": bf16, "batch": batch,
            "model": config["model"]["name"], "num_bins": num_bins,
            "resolution": list(res), "crop": list(crop) if crop else None,
            "artifacts": {}}

    def _export(fn, args, name):
        exp = jax_export.export(jax.jit(fn), platforms=platforms)(args)
        path = os.path.join(out_dir, name + ".stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        return path

    voxel_shape = (batch, num_bins, h, w)
    _export(_eval_fn(config, state, bf16=bf16, events=False),
            jax.ShapeDtypeStruct(voxel_shape, jnp.float32), "voxel")
    meta["artifacts"]["voxel"] = {"input": list(voxel_shape),
                                  "dtype": "float32"}

    for n in event_buckets:
        ev = {k: jax.ShapeDtypeStruct((batch, int(n)), jnp.float32)
              for k in ("x", "y", "t", "p")}
        ev["valid"] = jax.ShapeDtypeStruct((batch, int(n)), jnp.bool_)
        _export(_eval_fn(config, state, bf16=bf16, events=True),
                ev, f"events_{int(n)}")
        meta["artifacts"][f"events_{int(n)}"] = {
            "input": {"x/y/t/p": [batch, int(n)],
                      "valid": [batch, int(n)]}}

    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_exported(out_dir: str):
    """Load an exported directory; returns ``(meta, {name: callable})``.

    Needs only jax/jaxlib — no model code, checkpoints, or configs. Each
    callable is the jitted deserialized program taking the inputs recorded
    in ``export_meta.json`` and returning the flow ``[B, 2, H, W] f32``.
    """
    with open(os.path.join(out_dir, META_NAME)) as f:
        meta = json.load(f)
    fns = {}
    for name in meta["artifacts"]:
        with open(os.path.join(out_dir, name + ".stablehlo"), "rb") as f:
            exp = jax_export.deserialize(f.read())
        fns[name] = jax.jit(exp.call)
    return meta, fns
