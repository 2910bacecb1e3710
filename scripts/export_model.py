#!/usr/bin/env python
"""Export a trained flow model as self-contained StableHLO inference
artifacts (jax.export): weights baked in, loadable by any JAX process with
no model code (training/export.py docstring has the artifact contract).

    python scripts/export_model.py --train_config configs/train_dsec_sdformerflow_en4.yaml \
        --ckpt runs/en4/ckpt --out runs/en4/export \
        [--event_buckets 1048576] [--platforms tpu,cpu] [--verify]

The reference's deployment unit is a torch pickle requiring the full class
graph + spikingjelly at load time (/root/reference/utils/utils.py:10-41);
here it is the compiled program itself.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_config", required=True)
    ap.add_argument("--eval_config", default=None)
    ap.add_argument("--ckpt", default=None, help="Orbax checkpoint dir")
    ap.add_argument("--out", required=True, help="output artifact dir")
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current "
                         "backend)")
    ap.add_argument("--event_buckets", default="",
                    help="comma list of padded event counts to also export "
                         "raw-events steps for (pow2 recommended)")
    ap.add_argument("--s2d", action="store_true",
                    help="bake the exact space-to-depth embed re-expression "
                         "into the artifact (+13%% TPU forward; Spikingformer"
                         " MSPED models with running-stats BN only)")
    ap.add_argument("--fused_attn", action="store_true",
                    help="bake the fused Pallas spiking-QK attention kernel "
                         "into the artifact (+13%% TPU forward; MS family; "
                         "TPU-platform exports only — the artifact carries "
                         "a Mosaic tpu_custom_call)")
    ap.add_argument("--verify", action="store_true",
                    help="reload each artifact and check it against the "
                         "live step on random input")
    args = ap.parse_args()

    from sdformerflow_tpu.training.config import (load_config,
                                                  merge_eval_config)
    from sdformerflow_tpu.training.export import (build_inference_state,
                                                  export_flow_model,
                                                  load_exported, _eval_fn)
    from sdformerflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = load_config(args.train_config)
    if args.eval_config:
        config = merge_eval_config(config, load_config(args.eval_config))

    state = build_inference_state(config, args.ckpt, s2d=args.s2d,
                              fused_attn=args.fused_attn)
    buckets = [int(b) for b in args.event_buckets.split(",") if b]
    platforms = args.platforms.split(",") if args.platforms else None
    meta = export_flow_model(config, state, args.out,
                             bf16=not args.no_bf16, batch=args.batch,
                             platforms=platforms, event_buckets=buckets)
    for name in meta["artifacts"]:
        p = Path(args.out) / (name + ".stablehlo")
        print(f"wrote {p} ({p.stat().st_size / 1e6:.1f} MB)")

    if args.verify:
        import jax
        import jax.numpy as jnp
        meta, fns = load_exported(args.out)
        rng = np.random.default_rng(0)
        h, w = meta["crop"] or meta["resolution"]
        chunk = jnp.asarray(rng.normal(size=(args.batch, meta["num_bins"],
                                             h, w)), jnp.float32)
        live = _eval_fn(config, state, bf16=not args.no_bf16,
                        events=False)(chunk)
        got = fns["voxel"](chunk)
        err = float(jnp.max(jnp.abs(live - got)))
        print(f"voxel artifact max|live - exported| = {err:.3e}")
        assert err == 0.0, "exported program diverged from the live step"
        print("verify: OK")


if __name__ == "__main__":
    main()
