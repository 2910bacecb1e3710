"""torch -> flax checkpoint conversion for reference SDformerFlow weights.

Maps the reference's state_dict keys (module tree of
MS_SpikingformerFlowNet* — /root/reference/models/STSwinNet_SNN/*) onto this
framework's flax param/batch_stats trees, with layout transforms:

- Conv2d weight OIHW -> HWIO; ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O)
  (models.spiking_layers.TorchConvTranspose reproduces torch's zero-insert +
  flipped-kernel geometry exactly, so converted decoders are bit-identical —
  verified in tests/test_reference_parity.py);
- Linear [out, in] -> [in, out];
- BatchNorm weight/bias -> scale/bias (params), running_mean/var ->
  mean/var (batch_stats);
- PSN spiking_neuron.weight/bias, PLIF w, positional encodings and
  relative-position-bias tables pass through.

``load_model`` additionally strips the ``module.`` prefix of DataParallel
checkpoints (parity: utils/utils.py:10-41) and can re-interpolate v1
rel-pos-bias tables across window sizes (training/pretrained.py).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

# (torch regex, flax path template, transform)
_TRANSFORMS = {
    "conv": lambda a: a.transpose(2, 3, 1, 0),
    "deconv": lambda a: a.transpose(2, 3, 0, 1),
    "linear": lambda a: a.T,
    "id": lambda a: a,
}


def _norm_rule(torch_prefix: str, flax_prefix: str, direct: bool = False):
    """BN rules: SpikingNormLayer wraps BatchNorm2d under .norm_layer;
    'direct' norms (nn.BatchNorm2d used directly) have no extra nesting.
    Our SpikingNorm auto-names its BatchNorm 'BatchNorm_0'; direct ones are
    named 'norm'."""
    t = torch_prefix + (".{}" if direct else ".norm_layer.{}")
    f = flax_prefix if direct else flax_prefix + "/BatchNorm_0"
    return [
        (t.format("weight"), "params", f + "/scale", "id"),
        (t.format("bias"), "params", f + "/bias", "id"),
        (t.format("running_mean"), "batch_stats", f + "/mean", "id"),
        (t.format("running_var"), "batch_stats", f + "/var", "id"),
    ]


_GLIF_FIELDS = ("alpha", "beta", "gamma", "tau", "v_threshold",
                "linear_decay", "v_subreset", "conduct")


def _neuron_rules(torch_prefix, flax_prefix):
    rules = [
        (torch_prefix + ".spiking_neuron.weight", "params",
         flax_prefix + "/weight", "id"),   # PSN
        (torch_prefix + ".spiking_neuron.bias", "params",
         flax_prefix + "/bias", "id"),     # PSN
        (torch_prefix + ".spiking_neuron.w", "params",
         flax_prefix + "/w", "id"),        # PLIF
    ]
    for fld in _GLIF_FIELDS:               # GLIF (packed after conversion)
        rules.append((f"{torch_prefix}.spiking_neuron.{fld}", "params",
                      f"{flax_prefix}/glif/{fld}", "id"))
    return rules


def _pack_glif(tree):
    """Convert dicts produced by the per-field GLIF rules into the
    GLIFParams NamedTuple the flax neuron consumes (ops/neurons.py)."""
    from ..ops.neurons import GLIFParams
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if (k == "glif" and isinstance(v, dict)
                and set(v) == set(_GLIF_FIELDS)):
            out[k] = GLIFParams(**{f: np.asarray(v[f]).reshape(
                np.asarray(v[f]).shape) for f in _GLIF_FIELDS})
        else:
            out[k] = _pack_glif(v)
    return out


def _conv_block_rules(t, f, *, has_sn=True, deconv=False, norm_direct=False):
    """SpikingConv{Encoder,Decoder,...}Layer: Sequential conv + SpikingNorm
    + neuron."""
    kind = "deconv" if deconv else "conv"
    tconv = f"{t}.{'deconv' if deconv else 'conv'}.0"
    fconv = f"{f}/{'deconv' if deconv else 'conv'}"
    rules = [
        (tconv + ".weight", "params", fconv + "/kernel", kind),
        (tconv + ".bias", "params", fconv + "/bias", "id"),
    ]
    rules += _norm_rule(f"{t}.norm_layer", f"{f}/norm", direct=norm_direct)
    if has_sn:
        rules += _neuron_rules(f"{t}.sn", f"{f}/sn")
    return rules


def _resblock_rules(t, f):
    rules = []
    for c in ("conv1", "conv2"):
        rules += [(f"{t}.{c}.0.weight", "params", f"{f}/{c}/kernel", "conv"),
                  (f"{t}.{c}.0.bias", "params", f"{f}/{c}/bias", "id")]
    for n in ("norm1", "norm2"):
        rules += _norm_rule(f"{t}.{n}", f"{f}/{n}")
    for s in ("sn1", "sn2"):
        rules += _neuron_rules(f"{t}.{s}", f"{f}/{s}")
    return rules


def build_rules(num_stages=4, max_depth=8, num_res=2, num_encoders=4,
                pe_res=2) -> list:
    """Full rule list for the MS_SpikingformerFlowNet family."""
    R = []
    root_t = "sttmultires_unet"
    root_f = "sttmultires_unet"

    # ---- patch embed (MS_PED_Spiking_PatchEmbed_Conv_sfn)
    pe_t = f"{root_t}.encoders.swin3d.patch_embed"
    pe_f = f"{root_f}/encoders/patch_embed"
    R += _conv_block_rules(f"{pe_t}.head", f"{pe_f}/head")
    R += _conv_block_rules(f"{pe_t}.conv", f"{pe_f}/conv", has_sn=False)
    # SEW embeds (Spiking_PatchEmbed_Conv_sfn, Spiking_modules.py:1523-1596)
    # have a trailing sn on the stride-2 conv; MS_PED's conv has none.
    R += _neuron_rules(f"{pe_t}.conv.sn", f"{pe_f}/conv/sn")
    for r in range(pe_res):
        R += _resblock_rules(f"{pe_t}.residual_encoding.resblocks.{r}",
                             f"{pe_f}/residual_encoding/res{r}")
    # PED projection (direct nn.Conv2d / nn.BatchNorm2d)
    R += [(f"{pe_t}.proj.conv_res.weight", "params",
           f"{pe_f}/proj/conv_res/kernel", "conv"),
          (f"{pe_t}.proj.conv.weight", "params",
           f"{pe_f}/proj/conv/kernel", "conv")]
    R += _norm_rule(f"{pe_t}.proj.norm_layer", f"{pe_f}/proj/norm",
                    direct=True)
    R += _neuron_rules(f"{pe_t}.proj.sn", f"{pe_f}/proj/sn")
    # SpikingEmbeddingLayer variant of proj (non-PED embeds)
    R += _norm_rule(f"{pe_t}.proj.norm_layer", f"{pe_f}/proj/norm",
                    direct=True)

    # ---- swin stages
    for i in range(num_stages):
        st_t = f"{root_t}.encoders.swin3d.layers.{i}"
        st_f = f"{root_f}/encoders/stage{i}"
        for j in range(max_depth):
            b_t = f"{st_t}.swin_blocks.{j}"
            b_f = f"{st_f}/block{j}"
            a_t, a_f = f"{b_t}.attn", f"{b_f}/attn"
            R += [(f"{a_t}.positional_encoding", "params",
                   f"{a_f}/k/positional_encoding", "id"),
                  (f"{a_t}.relative_position_bias_table", "params",
                   f"{a_f}/relative_position_bias_table", "id"),
                  (f"{a_t}.linear_q.weight", "params",
                   f"{a_f}/q/linear/kernel", "linear"),
                  (f"{a_t}.linear_k.weight", "params",
                   f"{a_f}/k/linear/kernel", "linear"),
                  (f"{a_t}.linear_v.weight", "params",
                   f"{a_f}/v/linear/kernel", "linear"),
                  (f"{a_t}.proj.weight", "params",
                   f"{a_f}/proj/kernel", "linear"),
                  (f"{a_t}.proj.bias", "params", f"{a_f}/proj/bias", "id")]
            for qkv in ("q", "k", "v"):
                R += _norm_rule(f"{a_t}.bn_{qkv}", f"{a_f}/{qkv}/bn")
                R += _neuron_rules(f"{a_t}.sn_{qkv}", f"{a_f}/{qkv}/sn")
            R += _norm_rule(f"{a_t}.proj_bn", f"{a_f}/proj_bn")
            for s in ("sn2_q", "attn_sn", "proj_sn"):
                R += _neuron_rules(f"{a_t}.{s}", f"{a_f}/{s}")
            # swinv2 (Hamming) attention: logit_scale + cpb MLP
            # (Spiking_swin_transformer3D.py:209-215)
            R += [(f"{a_t}.logit_scale", "params", f"{a_f}/logit_scale",
                   "id"),
                  (f"{a_t}.cpb_mlp.0.weight", "params",
                   f"{a_f}/cpb_fc1/kernel", "linear"),
                  (f"{a_t}.cpb_mlp.0.bias", "params", f"{a_f}/cpb_fc1/bias",
                   "id"),
                  (f"{a_t}.cpb_mlp.2.weight", "params",
                   f"{a_f}/cpb_fc2/kernel", "linear")]
            # MLP
            m_t, m_f = f"{b_t}.mlp", f"{b_f}/mlp"
            R += [(f"{m_t}.fc1.weight", "params", f"{m_f}/fc1/kernel",
                   "linear"),
                  (f"{m_t}.fc2.weight", "params", f"{m_f}/fc2/kernel",
                   "linear")]
            R += _norm_rule(f"{m_t}.bn1", f"{m_f}/bn1")
            R += _norm_rule(f"{m_t}.bn2", f"{m_f}/bn2")
            R += _neuron_rules(f"{m_t}.sn1", f"{m_f}/sn1")
            R += _neuron_rules(f"{m_t}.sn2", f"{m_f}/sn2")
        # patch merging
        R += [(f"{st_t}.downsample.reduction.weight", "params",
               f"{st_f}/downsample/reduction/kernel", "linear")]
        R += _norm_rule(f"{st_t}.downsample.norm", f"{st_f}/downsample/norm")
        R += _neuron_rules(f"{st_t}.downsample.sn", f"{st_f}/downsample/sn")

    # ---- bottleneck resblocks + decoders + preds
    for i in range(2):
        R += _resblock_rules(f"{root_t}.resblocks.{i}",
                             f"{root_f}/resblock{i}")
    for i in range(num_encoders):
        R += _conv_block_rules(f"{root_t}.decoders.{i}",
                               f"{root_f}/decoder{i}", deconv=True)
        R += _neuron_rules(f"{root_t}.preds.{i}.sn", f"{root_f}/pred{i}/sn")
        R += [(f"{root_t}.preds.{i}.conv.0.weight", "params",
               f"{root_f}/pred{i}/conv/kernel", "conv"),
              (f"{root_t}.preds.{i}.conv.0.bias", "params",
               f"{root_f}/pred{i}/conv/bias", "id")]
    return R


def _layernorm_rule(t, f):
    return [(f"{t}.weight", "params", f"{f}/scale", "id"),
            (f"{t}.bias", "params", f"{f}/bias", "id")]


def _ann_resblock_rule(t, f):
    R = []
    for c, fc in (("conv1", "conv1"), ("conv2", "conv2")):
        R += [(f"{t}.{c}.weight", "params", f"{f}/{c}/kernel", "conv"),
              (f"{t}.{c}.bias", "params", f"{f}/{c}/bias", "id")]
    for n in ("bn1", "bn2"):
        # torch side: direct nn.BatchNorm2d attribute (submodules.py:186-189);
        # flax side: Norm2d wraps TorchBatchNorm (auto-named BatchNorm_0)
        fb = f"{f}/{n}/BatchNorm_0"
        R += [(f"{t}.{n}.weight", "params", fb + "/scale", "id"),
              (f"{t}.{n}.bias", "params", fb + "/bias", "id"),
              (f"{t}.{n}.running_mean", "batch_stats", fb + "/mean", "id"),
              (f"{t}.{n}.running_var", "batch_stats", fb + "/var", "id")]
    return R


def build_ann_rules(num_stages=3, max_depth=8, num_encoders=3,
                    num_blocks=2) -> list:
    """Key map for the ANN STTFlowNet family
    (/root/reference/models/STSwinNet/STSwinNet.py module tree)."""
    R = []
    root_t = "sttmultires_unet"
    root_f = "sttmultires_unet"
    sw_t = f"{root_t}.encoders.swin3d"
    sw_f = f"{root_f}/encoders/swin3d"

    # PatchEmbedLocal: head conv + 4 resblocks + proj
    pe_t, pe_f = f"{sw_t}.patch_embed", f"{sw_f}/patch_embed"
    R += [(f"{pe_t}.head.weight", "params", f"{pe_f}/head/kernel", "conv"),
          (f"{pe_t}.head.bias", "params", f"{pe_f}/head/bias", "id"),
          (f"{pe_t}.proj.weight", "params", f"{pe_f}/proj/kernel", "conv"),
          (f"{pe_t}.proj.bias", "params", f"{pe_f}/proj/bias", "id")]
    for r in range(1, 5):
        R += _ann_resblock_rule(
            f"{pe_t}.residual_encoding.resblock{r}",
            f"{pe_f}/residual_encoding/resblock{r}")

    for i in range(num_stages):
        st_t, st_f = f"{sw_t}.layers.{i}", f"{sw_f}/stage{i}"
        for j in range(max_depth):
            b_t, b_f = f"{st_t}.swin_blocks.{j}", f"{st_f}/block{j}"
            R += _layernorm_rule(f"{b_t}.norm1", f"{b_f}/norm1")
            R += _layernorm_rule(f"{b_t}.norm2", f"{b_f}/norm2")
            a_t, a_f = f"{b_t}.attn", f"{b_f}/attn"
            R += [(f"{a_t}.qkv.weight", "params", f"{a_f}/qkv/kernel",
                   "linear"),
                  (f"{a_t}.qkv.bias", "params", f"{a_f}/qkv/bias", "id"),
                  (f"{a_t}.proj.weight", "params", f"{a_f}/proj/kernel",
                   "linear"),
                  (f"{a_t}.proj.bias", "params", f"{a_f}/proj/bias", "id"),
                  (f"{a_t}.relative_position_bias_table", "params",
                   f"{a_f}/relative_position_bias_table", "id"),
                  (f"{a_t}.logit_scale", "params", f"{a_f}/logit_scale",
                   "id"),
                  (f"{a_t}.cpb_mlp.0.weight", "params",
                   f"{a_f}/cpb_fc1/kernel", "linear"),
                  (f"{a_t}.cpb_mlp.0.bias", "params", f"{a_f}/cpb_fc1/bias",
                   "id"),
                  (f"{a_t}.cpb_mlp.2.weight", "params",
                   f"{a_f}/cpb_fc2/kernel", "linear")]
            m_t, m_f = f"{b_t}.mlp", f"{b_f}/mlp"
            for fc in ("fc1", "fc2"):
                R += [(f"{m_t}.{fc}.weight", "params", f"{m_f}/{fc}/kernel",
                       "linear"),
                      (f"{m_t}.{fc}.bias", "params", f"{m_f}/{fc}/bias",
                       "id")]
        R += _layernorm_rule(f"{st_t}.downsample.norm",
                             f"{st_f}/downsample/norm")
        R += [(f"{st_t}.downsample.reduction.weight", "params",
               f"{st_f}/downsample/reduction/kernel", "linear")]
        R += _layernorm_rule(f"{sw_t}.norm{i}", f"{sw_f}/norm{i}")

    # STT per-stage per-timestep projections (1x1 convs -> Dense)
    for i in range(num_stages):
        for k in range(num_blocks):
            R += [(f"{root_t}.encoders.projections.{i}.{k}.weight", "params",
                   f"{root_f}/encoders/proj{i}_{k}/kernel", "conv1x1"),
                  (f"{root_t}.encoders.projections.{i}.{k}.bias", "params",
                   f"{root_f}/encoders/proj{i}_{k}/bias", "id")]

    # bottleneck resblocks / decoders / preds (ANN layer wrappers)
    for i in range(2):
        R += _ann_resblock_rule(f"{root_t}.resblocks.{i}",
                                f"{root_f}/resblock{i}")
    for i in range(num_encoders):
        R += [(f"{root_t}.decoders.{i}.conv2d.weight", "params",
               f"{root_f}/decoder{i}/conv2d/kernel", "conv"),
              (f"{root_t}.decoders.{i}.conv2d.bias", "params",
               f"{root_f}/decoder{i}/conv2d/bias", "id"),
              (f"{root_t}.decoders.{i}.transposed_conv2d.weight", "params",
               f"{root_f}/decoder{i}/transposed_conv2d/kernel", "deconv"),
              (f"{root_t}.decoders.{i}.transposed_conv2d.bias", "params",
               f"{root_f}/decoder{i}/transposed_conv2d/bias", "id"),
              (f"{root_t}.preds.{i}.conv2d.weight", "params",
               f"{root_f}/pred{i}/conv2d/kernel", "conv"),
              (f"{root_t}.preds.{i}.conv2d.bias", "params",
               f"{root_f}/pred{i}/conv2d/bias", "id")]
    return R


_TRANSFORMS["conv1x1"] = lambda a: a[..., 0, 0].T  # torch [O, I, 1, 1] -> [I, O]


def build_unet_rules(num_encoders=4, num_res=2,
                     use_upsample_conv=True) -> list:
    """Rules for the plain spiking U-Net family (SpikingMultiResUNet,
    /root/reference/models/STSwinNet_SNN/SNN_models.py:12-216): encoders.{i}
    / resblocks.{i} / decoders.{i} / preds.{i} -> encoder{i} / resblock{i} /
    decoder{i} / pred{i}. The upsample decoder's 'deconv' is a REGULAR conv
    (bilinear resize + conv); only the transpose decoder stores a real
    transposed-conv kernel."""
    R = []
    for i in range(num_encoders):
        R += _conv_block_rules(f"encoders.{i}", f"encoder{i}")
    for i in range(num_res):
        R += _resblock_rules(f"resblocks.{i}", f"resblock{i}")
    kind = "conv" if use_upsample_conv else "deconv"
    for i in range(num_encoders):
        t, f = f"decoders.{i}", f"decoder{i}"
        R += [(f"{t}.deconv.0.weight", "params", f"{f}/deconv/kernel", kind),
              (f"{t}.deconv.0.bias", "params", f"{f}/deconv/bias", "id")]
        R += _norm_rule(f"{t}.norm_layer", f"{f}/norm")
        R += _neuron_rules(f"{t}.sn", f"{f}/sn")
    for i in range(num_encoders):
        t, f = f"preds.{i}", f"pred{i}"
        R += [(f"{t}.conv.0.weight", "params", f"{f}/conv/kernel", "conv"),
              (f"{t}.conv.0.bias", "params", f"{f}/conv/bias", "id")]
        R += _neuron_rules(f"{t}.sn", f"{f}/sn")
    return R


def convert_with_rules(state_dict: Dict[str, np.ndarray],
                       rule_list) -> Tuple[dict, dict, list]:
    """Generic torch state_dict -> (params, batch_stats, unmatched) given an
    explicit rule list (used for the non-swin families)."""
    rules = {t: (coll, path, tr) for t, coll, path, tr in rule_list}
    params: dict = {}
    batch_stats: dict = {}
    unmatched = []
    for key, val in state_dict.items():
        key = re.sub(r"^module\.", "", key)
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith(".spiking_neuron.v"):
            continue  # membrane STATE buffer (reset to 0), not a parameter
        if key not in rules:
            unmatched.append(key)
            continue
        coll, path, tr = rules[key]
        tree = params if coll == "params" else batch_stats
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _TRANSFORMS[tr](np.asarray(val))
    return _pack_glif(params), batch_stats, unmatched


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       num_stages=4, max_depth=8,
                       num_encoders=4, family="snn") -> Tuple[dict, dict, list]:
    """torch state_dict -> (params, batch_stats, unmatched_keys).
    ``family``: "snn" (SpikingformerFlowNet) or "ann" (STTFlowNet)."""
    builder = build_rules if family == "snn" else build_ann_rules
    rules = {t: (coll, path, tr)
             for t, coll, path, tr in builder(
                 num_stages=num_stages, max_depth=max_depth,
                 num_encoders=num_encoders)}
    params: dict = {}
    batch_stats: dict = {}
    unmatched = []
    for key, val in state_dict.items():
        key = re.sub(r"^module\.", "", key)  # DataParallel prefix
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith(".spiking_neuron.v"):
            continue  # membrane STATE buffer (reset to 0), not a parameter
        if key not in rules:
            unmatched.append(key)
            continue
        coll, path, tr = rules[key]
        tree = params if coll == "params" else batch_stats
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _TRANSFORMS[tr](np.asarray(val))
    return _pack_glif(params), batch_stats, unmatched


def flax_to_torch_key(coll: str, path: str, num_stages=4, max_depth=8,
                      num_encoders=4, family="snn"):
    """Inverse lookup (used by tests to synthesize reference-shaped
    checkpoints)."""
    builder = build_rules if family == "snn" else build_ann_rules
    for t, c, f, tr in builder(num_stages=num_stages,
                               max_depth=max_depth,
                               num_encoders=num_encoders):
        if c == coll and f == path:
            return t, tr
    return None, None


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()
            if hasattr(v, "numpy")}
