"""Round-trip test of the torch -> flax checkpoint converter: synthesize a
reference-shaped torch state_dict from a real flax param tree via the inverse
key map, convert it back, and check the trees match bit-exactly."""

import dataclasses

import jax
import numpy as np

from sdformerflow_tpu.models import get_model
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training import torch_interop as TI

_INV = {
    "conv": lambda a: a.transpose(3, 2, 0, 1),
    "deconv": lambda a: a.transpose(2, 3, 0, 1),
    "linear": lambda a: a.T,
    "id": lambda a: a,
}


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def test_torch_state_dict_round_trip():
    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(16, 16), patch_size=(1, 1, 2, 2), depths=(1, 1),
        num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 2, 2),
        qk_scale=0.125, drop_path_rate=0.0)
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    model = get_model("MS_SpikingformerFlowNet_en4",
                      {"num_bins": 4, "base_num_channels": 16,
                       "use_upsample_conv": False}, swin, cfg)
    model = dataclasses.replace(model, num_encoders=2)
    chunk = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(1)},
                           encode_input(chunk), False)

    flat_params = _flatten(variables["params"])
    flat_bs = _flatten(variables.get("batch_stats", {}))

    # synthesize the torch-side checkpoint via the inverse key map
    state_dict = {}
    missing = []
    for coll, flat in (("params", flat_params), ("batch_stats", flat_bs)):
        for path, val in flat.items():
            tkey, tr = TI.flax_to_torch_key(coll, path, num_stages=2,
                                            max_depth=1, num_encoders=2)
            if tkey is None:
                missing.append((coll, path))
                continue
            state_dict["module." + tkey] = _INV[tr](val)  # DataParallel-style

    assert not missing, f"no torch mapping for: {missing}"

    params, batch_stats, unmatched = TI.convert_state_dict(
        state_dict, num_stages=2, max_depth=1, num_encoders=2)
    assert not unmatched, unmatched

    got_params = _flatten(params)
    got_bs = _flatten(batch_stats)
    assert set(got_params) == set(flat_params)
    assert set(got_bs) == set(flat_bs)
    for k in flat_params:
        np.testing.assert_array_equal(got_params[k], flat_params[k], err_msg=k)
    for k in flat_bs:
        np.testing.assert_array_equal(got_bs[k], flat_bs[k], err_msg=k)


def test_load_torch_checkpoint_file_with_dataparallel_prefix(tmp_path):
    """End-to-end .pt file ingestion: a torch-saved reference-style
    state_dict with DataParallel 'module.' prefixes loads through
    load_torch_checkpoint + convert_state_dict and lands in the flax tree
    (reference: utils/utils.py:10-41 strips the prefix)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from refharness import import_reference_models, sj_functional
    import torch
    ref_snn, _ = import_reference_models()
    from sdformerflow_tpu.training.torch_interop import (
        convert_state_dict, load_torch_checkpoint)

    model_cfg = {
        "name": "MS_SpikingformerFlowNet_en4", "encoding": "voxel",
        "norm_input": "minmax", "num_bins": 10, "base_num_channels": 16,
        "kernel_size": 3, "activations": ["relu", None],
        "final_activation": None, "mask_output": True, "norm": None,
        "use_upsample_conv": False,
        "spiking_neuron": {"num_steps": 10, "v_th": 0.1, "v_reset": None,
                           "neuron_type": "psn",
                           "surrogate_fun": "surrogate.ATan()", "tau": 2.0,
                           "detach_reset": True, "spike_norm": "BN"}}
    swin_cfg = {"use_arc": ["swinv1", "MS_PED_Spiking_PatchEmbed_Conv_sfn"],
                "swin_depths": [1, 1, 1, 1], "swin_num_heads": [2, 2, 4, 4],
                "swin_out_indices": [0, 1, 2, 3],
                "swin_patch_size": [1, 1, 2, 2],
                "window_size": [2, 2, 2], "pretrained_window_size": [0, 0, 0],
                "mlp_ratio": 2, "input_size": [64, 64]}
    torch.manual_seed(0)
    tmodel = ref_snn.MS_SpikingformerFlowNet_en4(model_cfg.copy(),
                                                 swin_cfg.copy())
    # simulate a DataParallel checkpoint: module.-prefixed keys
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    path = tmp_path / "ref_ckpt.pt"
    torch.save(sd, str(path))

    loaded = load_torch_checkpoint(str(path))
    assert all(k.startswith("module.") for k in loaded)
    params, bs, unmatched = convert_state_dict(
        loaded, num_stages=4, max_depth=1, num_encoders=4)
    unmatched = [k for k in unmatched if "relative_position_index" not in k]
    assert unmatched == [], unmatched[:5]
    # a known leaf landed with the right layout (linear [out,in] -> [in,out])
    w_t = tmodel.state_dict()[
        "sttmultires_unet.encoders.swin3d.layers.0.swin_blocks.0.attn"
        ".linear_q.weight"].numpy()
    got = params["sttmultires_unet"]["encoders"]["stage0"]["block0"]["attn"][
        "q"]["linear"]["kernel"]
    np.testing.assert_array_equal(got, w_t.T)
    assert "mean" in bs["sttmultires_unet"]["encoders"]["patch_embed"][
        "head"]["norm"]["BatchNorm_0"]
