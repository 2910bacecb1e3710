"""Pretrained-weight interop: 2D->3D swin inflation, geometric-progression
bias-table re-gridding, absolute-pos / QK positional-encoding interpolation,
and an end-to-end load of a (synthesized) 2-D ImageNet-style swin-v2
checkpoint into the 3-D ANN encoder.

Parity targets:
- inflate_weights: /root/reference/models/STSwinNet/swin_transformer3D_v2.py:651-707
- remap_pretrained_keys_swin (geometric regrid) + load_pretrained_interpolate:
  /root/reference/models/STSwinNet/load_pretrained.py:4-177
  (note: the reference calls scipy.interpolate.interp2d, REMOVED in scipy
  >= 1.14 — this environment's reference code cannot run its own regrid; we
  implement the documented RectBivariateSpline equivalent.)
"""

import numpy as np
import pytest

from sdformerflow_tpu.training.pretrained import (
    geometric_regrid_bias_table, inflate_swin2d_state_dict,
    interpolate_abs_pos_embed, interpolate_positional_encoding)


def test_geometric_regrid_identity_and_linear_exact():
    rng = np.random.default_rng(0)
    table = rng.normal(size=(15 * 15, 3)).astype(np.float32)
    out = geometric_regrid_bias_table(table, 15)
    np.testing.assert_array_equal(out, table)

    # cubic splines reproduce a linear ramp exactly, including under the
    # geometric source grid -> integer target grid change
    s1, s2 = 15, 23
    xs = np.arange(s1) - s1 // 2
    lin = (2.0 * xs[:, None] + 0.5 * xs[None, :]).astype(np.float64)
    # the source grid positions are geometric, but the VALUES z are indexed
    # by grid position, so build z directly as a linear function of the
    # geometric positions used by the regridder (reproduce its grid here)
    def geometric_positions(src_size, dst_size):
        def gp(a, r, n):
            return a * (1.0 - r ** n) / (1.0 - r)
        left, right = 1.01, 1.5
        while right - left > 1e-6:
            q = (left + right) / 2.0
            if gp(1, q, src_size // 2) > dst_size // 2:
                right = q
            else:
                left = q
        dis, cur = [], 1.0
        for i in range(src_size // 2):
            dis.append(cur)
            cur += q ** (i + 1)
        return np.asarray([-d for d in reversed(dis)] + [0] + dis)

    x = geometric_positions(s1, s2)
    z = 2.0 * x[:, None] + 0.5 * x[None, :]
    out = geometric_regrid_bias_table(
        z.reshape(-1, 1).astype(np.float64), s2)
    t = s2 // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)
    want = 2.0 * dx[:, None] + 0.5 * dx[None, :]
    np.testing.assert_allclose(out.reshape(s2, s2), want, atol=1e-8)


def test_inflate_patch_proj_and_bias_tables():
    rng = np.random.default_rng(1)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(8, 3, 4, 4)).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            rng.normal(size=(13 * 13, 2)).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_index":
            np.zeros((49, 49), np.int64),
        "layers.0.blocks.0.attn_mask": np.zeros((4, 49, 49), np.float32),
    }
    out = inflate_swin2d_state_dict(sd, time_patch=2, window_size=(2, 3, 3))
    # buffers dropped
    assert not any("relative_position_index" in k or "attn_mask" in k
                   for k in out)
    # mean inflation over the temporal patch: response to a
    # temporally-constant input is preserved
    w = out["patch_embed.proj.weight"]
    assert w.shape == (8, 3, 2, 4, 4)
    np.testing.assert_allclose(w.sum(axis=2),
                               sd["patch_embed.proj.weight"], rtol=1e-6)
    # bias table: spatial resize to (2*3-1)^2 = 25, tiled (2*2-1)=3 times
    t = out["layers.0.swin_blocks.0.attn.relative_position_bias_table"]
    assert t.shape == (3 * 25, 2)
    np.testing.assert_array_equal(t[:25], t[25:50])
    np.testing.assert_array_equal(t[:25], t[50:])


def test_abs_pos_and_positional_encoding_interpolation():
    rng = np.random.default_rng(2)
    e = rng.normal(size=(1, 16, 8)).astype(np.float32)
    np.testing.assert_array_equal(interpolate_abs_pos_embed(e, 16), e)
    out = interpolate_abs_pos_embed(e, 49)
    assert out.shape == (1, 49, 8)
    assert np.isfinite(out).all()

    pe = rng.normal(size=(1, 3, 2 * 4 * 4, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        interpolate_positional_encoding(pe, 2 * 4 * 4), pe)
    out = interpolate_positional_encoding(pe, 2 * 9 * 9)
    assert out.shape == (1, 3, 2 * 9 * 9, 16)
    assert np.isfinite(out).all()
    # trilinear on a constant field is exact
    const = np.ones((1, 3, 2 * 4 * 4, 16), np.float32)
    np.testing.assert_allclose(
        interpolate_positional_encoding(const, 2 * 9 * 9), 1.0, rtol=1e-6)


def test_imagenet_swin2d_checkpoint_into_3d_ann_encoder():
    """End-to-end (VERDICT r1 next #5): synthesize a 2-D ImageNet-style
    swin-v2 checkpoint (layers.{i}.blocks.{j} naming, cpb MLP, no 3-D keys),
    inflate it, convert through the ANN key map, merge into a fresh
    STTFlowNet, and forward."""
    import jax
    import jax.numpy as jnp
    from sdformerflow_tpu.models.common import SwinConfig, SpikingConfig
    from sdformerflow_tpu.models import get_model
    from sdformerflow_tpu.training import torch_interop as TI

    depths, heads = (1, 1), (2, 2)
    dims = [16, 32]
    rng = np.random.default_rng(3)
    sd2d = {}
    for i, (d, nh, dim) in enumerate(zip(depths, heads, dims)):
        for j in range(d):
            p = f"layers.{i}.blocks.{j}"
            sd2d[f"{p}.norm1.weight"] = np.ones(dim, np.float32)
            sd2d[f"{p}.norm1.bias"] = np.zeros(dim, np.float32)
            sd2d[f"{p}.norm2.weight"] = np.ones(dim, np.float32)
            sd2d[f"{p}.norm2.bias"] = np.zeros(dim, np.float32)
            sd2d[f"{p}.attn.qkv.weight"] = rng.normal(
                0, 0.02, (3 * dim, dim)).astype(np.float32)
            sd2d[f"{p}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
            sd2d[f"{p}.attn.proj.weight"] = rng.normal(
                0, 0.02, (dim, dim)).astype(np.float32)
            sd2d[f"{p}.attn.proj.bias"] = np.zeros(dim, np.float32)
            sd2d[f"{p}.attn.logit_scale"] = np.full(
                (nh, 1, 1), np.log(10.0), np.float32)
            sd2d[f"{p}.attn.cpb_mlp.0.weight"] = rng.normal(
                0, 0.02, (512, 3)).astype(np.float32)
            sd2d[f"{p}.attn.cpb_mlp.0.bias"] = np.zeros(512, np.float32)
            sd2d[f"{p}.attn.cpb_mlp.2.weight"] = rng.normal(
                0, 0.02, (nh, 512)).astype(np.float32)
            sd2d[f"{p}.attn.relative_position_index"] = np.zeros(
                (49, 49), np.int64)  # must be dropped
            sd2d[f"{p}.mlp.fc1.weight"] = rng.normal(
                0, 0.02, (2 * dim, dim)).astype(np.float32)
            sd2d[f"{p}.mlp.fc1.bias"] = np.zeros(2 * dim, np.float32)
            sd2d[f"{p}.mlp.fc2.weight"] = rng.normal(
                0, 0.02, (dim, 2 * dim)).astype(np.float32)
            sd2d[f"{p}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if i < len(depths) - 1:
            sd2d[f"layers.{i}.downsample.norm.weight"] = np.ones(
                4 * dim, np.float32)
            sd2d[f"layers.{i}.downsample.norm.bias"] = np.zeros(
                4 * dim, np.float32)
            sd2d[f"layers.{i}.downsample.reduction.weight"] = rng.normal(
                0, 0.02, (2 * dim, 4 * dim)).astype(np.float32)

    inflated = inflate_swin2d_state_dict(sd2d, time_patch=10,
                                         window_size=(2, 2, 2))
    prefixed = {f"sttmultires_unet.encoders.swin3d.{k}": v
                for k, v in inflated.items()}
    params, bs, unmatched = TI.convert_state_dict(
        prefixed, num_stages=2, max_depth=1, num_encoders=2, family="ann")
    assert not unmatched, unmatched[:5]

    swin = SwinConfig(arc_type="swinv2", patch_embed_type="PatchEmbedLocal",
                      input_size=(16, 16), patch_size=(10, 2, 2),
                      depths=depths, num_heads=heads, out_indices=(0, 1),
                      window_size=(2, 2, 2), qk_scale=None,
                      mlp_ratio=2.0, drop_path_rate=0.0)
    import dataclasses
    model = get_model("STTFlowNet",
                      {"num_bins": 20, "base_num_channels": 16,
                       "kernel_size": 3, "use_upsample_conv": True,
                       "encoding": "voxel"}, swin,
                      SpikingConfig(num_steps=2))
    model = dataclasses.replace(model, num_encoders=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, False)

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert dst[k].shape == np.asarray(v).shape, (k, dst[k].shape,
                                                             v.shape)
                dst[k] = jnp.asarray(v)
    merged_params = jax.tree_util.tree_map(lambda a: a,
                                           variables["params"])  # copy
    merge(merged_params, params)
    merged = {"params": merged_params,
              "batch_stats": variables.get("batch_stats", {})}

    out = model.apply(merged, x, False)
    assert np.isfinite(np.asarray(out["flow"][-1])).all()
    # the pretrained qkv actually landed (flax stores [in, out] = torch .T)
    got = np.asarray(
        merged_params["sttmultires_unet"]["encoders"]["swin3d"]["stage0"]
        ["block0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(
        got, sd2d["layers.0.blocks.0.attn.qkv.weight"].T)
