"""Round-trip test of the ANN STTFlowNet key map in the torch -> flax
checkpoint converter (synthesize a reference-shaped state dict, convert,
compare)."""

import jax
import numpy as np

from sdformerflow_tpu.models import get_model
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.training import torch_interop as TI

_INV = {
    "conv": lambda a: a.transpose(3, 2, 0, 1),
    "deconv": lambda a: a.transpose(2, 3, 0, 1),
    "linear": lambda a: a.T,
    "conv1x1": lambda a: a.T[:, :, None, None],
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


def test_ann_state_dict_round_trip():
    swin = SwinConfig(
        arc_type="swinv2", patch_embed_type="PatchEmbedLocal",
        input_size=(16, 16), patch_size=(2, 2, 2), depths=(1, 1),
        num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 2, 2),
        qk_scale=None, drop_path_rate=0.0)
    model = get_model("STTFlowNet",
                      {"num_bins": 4, "base_num_channels": 16,
                       "num_encoders": 2, "use_upsample_conv": True},
                      swin, SpikingConfig())
    import dataclasses
    model = dataclasses.replace(model, num_encoders=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, False)

    flat_params = _flatten(variables["params"])
    flat_bs = _flatten(variables.get("batch_stats", {}))

    kw = dict(num_stages=2, max_depth=1, num_encoders=2, family="ann")
    state_dict, missing = {}, []
    for coll, flat in (("params", flat_params), ("batch_stats", flat_bs)):
        for path, val in flat.items():
            tkey, tr = TI.flax_to_torch_key(coll, path, **kw)
            if tkey is None:
                missing.append((coll, path))
                continue
            state_dict[tkey] = _INV[tr](val)
    assert not missing, f"no torch mapping for: {missing}"

    params, batch_stats, unmatched = TI.convert_state_dict(state_dict, **kw)
    assert not unmatched, unmatched
    got = _flatten(params)
    assert set(got) == set(flat_params)
    for k in flat_params:
        np.testing.assert_array_equal(got[k], flat_params[k], err_msg=k)
