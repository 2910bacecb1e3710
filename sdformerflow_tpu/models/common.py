"""Shared configuration dataclasses and initializers for the model zoo.

The reference selects neuron types, surrogate functions, patch embeds and
model classes by ``eval()`` of config strings; here everything is an explicit
frozen dataclass + registry, hashable so it can be a flax module attribute.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.nn.initializers as init


@dataclasses.dataclass(frozen=True)
class SpikingConfig:
    """Mirror of the reference's ``spiking_kwargs`` dict
    (configs/*.yml ``spiking_neuron`` section)."""
    num_steps: int = 10
    v_th: float = 1.0
    v_reset: Optional[float] = None
    neuron_type: str = "lif"  # lif | if | plif | psn | glif | SLTTlif
    surrogate: str = "atan"
    surrogate_alpha: float = 2.0
    tau: float = 2.0
    detach_reset: bool = True
    spike_norm: Optional[str] = "BN"  # BN | BN_notrack | GN | IN | LN | BNTT | TDBN
    # membrane monitor (reference vis.monitor_v / store_v_seq,
    # eval_DSEC_flow_SNN.py:145-149): when True each neuron site sows
    # per-step membrane statistics into the ``intermediates`` collection
    store_v_seq: bool = False
    # eval-time BN folding (inference-only): when True every foldable
    # BatchNorm site (plain BN / TDBN with running stats) is SKIPPED by the
    # model and its partner conv/linear gains a bias — apply with variables
    # transformed by training.bn_folding.fold_bn_variables. Deletes an entire
    # elementwise pass (+ its f32 converts) at every neuron site; invalid in
    # train mode (batch statistics would be wrong).
    fold_bn: bool = False
    # eval-time space-to-depth re-expression of the full-resolution embed
    # head (inference-only, EXACT): the flagship MSPED embed's
    # conv(s1)->BN->spike->conv(s2)->BN segment runs in 2x2 block space
    # (C 48->192 at half resolution) with kernels/affines rearranged by
    # training.s2d_embed.s2d_embed_variables — avoids the (8,128)-lane
    # padding tax of C=48 at 288x384 (ops/s2d.py, PERF_NOTES.md). Invalid
    # in train mode (BN batch statistics would be per-block-channel).
    s2d_embed: bool = False
    # TRAIN-capable space-to-depth re-expression of the same embed segment
    # (exact, both modes): parameters stay REFERENCE-SHAPED (head kernel
    # [3,3,ci,co], BN affine/running stats [C]) and are expanded to block
    # space inside apply (ops/s2d.py), so the variable tree is IDENTICAL to
    # the base model — checkpoints, optimizer state and eval interop with no
    # conversion, and autodiff through the exact expansion yields the
    # reference gradients. Train-mode BN re-reduces per-block-channel moments
    # across the 4 equal-count block positions (combined mean/var are exact),
    # so normalization and running-stat updates match the reference's
    # per-channel BN (models/spiking_patch_embed.py::_S2DBlockBatchNorm).
    # Unlike s2d_embed this needs no variable transform; flip the flag on a
    # cloned model and reuse the same variables.
    s2d_train: bool = False
    # Fused Pallas spiking-QK window attention (inference-only, PSN + BN +
    # wd==2): runs the whole attention interior — proj_sn spike, q/k
    # linear+BN-affine+PE+spike, att_token, raw-refold product, head
    # regroup, proj linear+BN-affine — in one kernel per column-pair block
    # (ops/pallas_attn.py; the fold algebra is re-derived pair-locally and
    # f64-verified in tests/test_pallas_attn.py). The variable tree is
    # IDENTICAL to the base model (twin param declarations), so the flag
    # flips on a cloned model with the same variables. Eval-mode only;
    # train / non-PSN / odd window-batch calls fall back to the XLA path.
    fused_qk_attn: bool = False
    # Pair-local XLA re-expression of the same attention (TRAIN-capable,
    # any neuron/norm): the q/k/att_token head-scrambled fold relayouts are
    # eliminated (only the output pair-regroup remains), computing the
    # exact same function with the exact same variable tree — spikes fire
    # on relabeled-but-identical multisets, BN populations are unchanged,
    # so forward, gradients, BN running stats and telemetry all match the
    # raw-refold path (f64-tested). Gated to wd == 2 / even window count;
    # other geometries silently use the reference-shaped folds.
    pairlocal_attn: bool = False

    def replace(self, **kw) -> "SpikingConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Mirror of the reference's ``swin_transformer`` config section."""
    arc_type: str = "swinv1"  # swinv1 | swinv2
    patch_embed_type: str = "MS_PED_Spiking_PatchEmbed_Conv_sfn"
    input_size: Tuple[int, int] = (288, 384)
    patch_size: Tuple[int, ...] = (1, 1, 2, 2)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    window_size: Tuple[int, int, int] = (2, 9, 9)
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = 0.125
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_norm: bool = False

    def replace(self, **kw) -> "SwinConfig":
        return dataclasses.replace(self, **kw)


# torch init equivalents used by the reference's init_weights functions
kaiming_normal_fan_out = init.variance_scaling(2.0, "fan_out", "normal")
xavier_uniform = init.xavier_uniform()
trunc_normal_02 = init.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
zeros = init.zeros
ones = init.ones


def torch_conv_default_init():
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))."""
    return init.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_default_init():
    return init.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
