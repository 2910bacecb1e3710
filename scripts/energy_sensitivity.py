"""Rate-sensitivity of the SynOps energy estimate (VERDICT r3 #8).

The Spikformer-convention energy (utils/energy.py) is affine in the
per-site firing rates: E = E_MAC*analog_MACs + E_AC*sum(rate_s*T_s*F_s).
Given a measured spike_rates.json (written by
``scripts/eval_dsec.py --energy_report``), this prices the forward at
scaled rates to bound how the headline moves as training changes the
rate regime. Pure host computation — no TPU needed.

Usage: python scripts/energy_sensitivity.py runs/eval/spike_rates.json
           [--scales=0.5,1,2,4]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sdformerflow_tpu.models.common import SwinConfig
from sdformerflow_tpu.utils.energy import energy_spikingformer


def main():
    rates = json.load(open(sys.argv[1]))
    scales = [float(s) for s in next(
        (a.split("=")[1] for a in sys.argv if a.startswith("--scales=")),
        "0.5,1,2,4").split(",")]
    # the flagship eval protocol (matches eval_dsec.py's flagship dispatch)
    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(288, 384), patch_size=(1, 1, 2, 2), depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24), out_indices=(0, 1, 2, 3),
        window_size=(2, 9, 9), qk_scale=0.125)
    base = {k: v for k, v in rates.items()}
    for s in scales:
        scaled = {k: min(1.0, v * s) for k, v in base.items()}
        e = energy_spikingformer(swin, scaled, num_steps=10)
        mean_r = sum(scaled.values()) / len(scaled)
        print(f"rate x{s:<4} (mean {mean_r:.4f}): "
              f"{e['energy_mj']:.2f} mJ/forward, "
              f"{e['snn_vs_ann_ratio']:.4f}x ANN")


if __name__ == "__main__":
    main()
