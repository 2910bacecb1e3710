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
