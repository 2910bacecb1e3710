"""Spiking 3D shifted-window transformer (spikeformer encoder).

Features flow channels-last and TIME-MAJOR end-to-end: stages operate on
``[D, B, H, W, C]`` and the attention works on time-major windows
``[wd, B*nW, wh, ww, C]`` produced by ``window_partition_v2_tm`` — the
temporal window axis doubles as the SNN time axis, so every neuron inside
attention runs ``num_steps = window_size[0]``. Keeping D leading everywhere
removes the per-block [B, D] <-> [D, B] full-tensor transposes around every
MLP and patch merge (~50 copies/forward in round 1, PERF_NOTES.md).

Parity targets (/root/reference/models/STSwinNet_SNN/Spiking_swin_transformer3D.py):
- Spiking_BN_WindowAttention3D (:184-411): separate Q/K/V linear+BN+spike;
  swinv1 = unnormalized q·s @ k^T + relative bias, NO softmax; swinv2 =
  Hamming-distance attention (with softmax) * logit_scale + 16*sigmoid(cpb).
- SDSA_WindowAttention3D (:413-492): input spiked first, no output spike.
- Spiking_QK_WindowAttention3D (:605-717): linear-complexity spiking QK
  attention used by the MS blocks (the SDformerFlow/en4 path). The attention
  mask is intentionally ignored here, matching the reference.
- Spiking_Mlp / MS_Spiking_Mlp (:115-181), Spiking{,MS_}PatchMerging
  (:898-974), blocks (:720-894), basic layer (:995-1129), backbones
  (:1132-1292).

Behavioral quirks preserved on purpose (the trained reference networks depend
on them): the raw ``view``/``reshape`` calls that fold the time axis into the
window-batch/token axes use identical row-major semantics in jnp.reshape, so
element mappings match exactly; the MLP residual branch gets no drop-path;
the QK path ignores the shift mask; swinv1 attention uses scale=1 for
psn/glif neurons (:617-620).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import windows as W
from ..parallel.sharding_rules import constrain_data_parallel
from .common import SpikingConfig, kaiming_normal_fan_out
from .spiking_layers import (SpikingNeuron, SpikingNorm, drop_path,
                             norm_is_folded)

_BN_FAMILY = ("BN", "BNTT", "tdBN", "TDBN", "IN")


def _dense(features, use_bias, name):
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=kaiming_normal_fan_out, name=name)


class _QKVBranch(nn.Module):
    """linear -> (BN) -> spike on [T, B_, wh, ww, C]."""

    dim: int
    cfg: SpikingConfig
    norm: Optional[str]
    add_pe: bool = False
    pe_shape: Optional[Tuple[int, ...]] = None
    spike: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        folded = norm_is_folded(self.norm, self.cfg)
        x = _dense(self.dim, use_bias=folded, name="linear")(x)
        if self.norm in _BN_FAMILY and not folded:
            x = SpikingNorm(self.dim, self.cfg.num_steps, self.norm,
                            self.cfg.v_th, name="bn")(x, train)
        if self.add_pe:
            # learnable additive positional encoding on k, added PRE-spike
            # (stored in the reference's (1, nh, N, hd) layout, raw-reshaped
            # to (T, 1, wh, ww, C) — identical row-major mapping here)
            pe = self.param("positional_encoding", nn.initializers.zeros,
                            self.pe_shape)
            T, _, H, Wd, C = x.shape
            x = x + pe.reshape(T, 1, H, Wd, C)
        if self.spike:
            x = SpikingNeuron(self.cfg, name="sn")(x)
        return x


class SpikingBNWindowAttention3D(nn.Module):
    """SEW window attention (swinv1: scaled qk^T + rel bias, no softmax;
    swinv2: Hamming + cpb)."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    cfg: SpikingConfig
    version: str = "swinv1"
    qk_scale: Optional[float] = None
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)
    norm: Optional[str] = "BN"
    spike_input: bool = False   # SDSA variant
    spike_output: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        T, B_, Hw, Ww_, C = x.shape
        nh = self.num_heads
        hd = C // nh
        acfg = self.cfg.replace(num_steps=self.window_size[0])

        if self.spike_input:
            x = SpikingNeuron(acfg, name="proj_sn_in")(x)

        q = _QKVBranch(self.dim, acfg, self.norm, name="q")(x, train)
        k = _QKVBranch(self.dim, acfg, self.norm, name="k")(x, train)
        v = _QKVBranch(self.dim, acfg, self.norm, name="v")(x, train)

        # raw reshape folding (T, B_, H, W, C) -> (B_, nh, N, hd); matches the
        # reference's .reshape exactly (row-major)
        q = q.reshape(B_, nh, -1, hd)
        k = k.reshape(B_, nh, -1, hd)
        v = v.reshape(B_, nh, -1, hd)
        N = q.shape[2]

        if self.version == "swinv1":
            if self.cfg.neuron_type in ("psn", "glif"):
                scale = 1.0
            else:
                scale = self.qk_scale or hd ** -0.5
            attn = (q * scale) @ k.transpose(0, 1, 3, 2)
            table = self.param(
                "relative_position_bias_table", nn.initializers.zeros,
                ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
                 * (2 * self.window_size[2] - 1), nh))
            rel_idx = W.relative_position_index(self.window_size)
            bias = table[rel_idx[:N, :N].reshape(-1)].reshape(N, N, nh)
            attn = attn + bias.transpose(2, 0, 1)[None]
        else:  # swinv2: Hamming-distance attention with softmax + cpb bias
            ham = 0.5 * (1.0 + (2 * q - 1) @ (2 * k - 1).transpose(0, 1, 3, 2) / hd)
            attn = nn.softmax(ham, axis=-1)
            logit_scale = self.param(
                "logit_scale",
                nn.initializers.constant(math.log(10.0)), (nh, 1, 1))
            attn = attn * jnp.exp(jnp.clip(logit_scale, None, math.log(100.0)))
            coords = jnp.asarray(W.relative_coords_table(
                self.window_size, self.pretrained_window_size))
            hcpb = nn.Dense(512, use_bias=True,
                            kernel_init=kaiming_normal_fan_out,
                            name="cpb_fc1")(coords)
            cpb = nn.Dense(nh, use_bias=False,
                           kernel_init=kaiming_normal_fan_out,
                           name="cpb_fc2")(nn.relu(hcpb)).reshape(-1, nh)
            rel_idx = W.relative_position_index(self.window_size)
            Nw = self.window_size[0] * self.window_size[1] * self.window_size[2]
            bias = cpb[rel_idx.reshape(-1)].reshape(Nw, Nw, nh)
            attn = attn + 16.0 * nn.sigmoid(bias.transpose(2, 0, 1))[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + mask[None, :, None]
            attn = attn.reshape(-1, nh, N, N)

        out = attn @ v  # (B_, nh, N, hd)
        out = out.reshape(B_, nh, T, Hw, Ww_, hd)
        out = out.transpose(2, 0, 3, 4, 1, 5).reshape(T, B_, Hw, Ww_, C)
        out = _dense(self.dim, use_bias=True, name="proj")(out)
        if self.norm in _BN_FAMILY and not norm_is_folded(self.norm, acfg):
            out = SpikingNorm(self.dim, acfg.num_steps, self.norm,
                              acfg.v_th, name="proj_bn")(out, train)
        if self.spike_output:
            out = SpikingNeuron(acfg, name="proj_sn")(out)
        return out, attn  # [T, B_, wh, ww, C] (time-major windows)


class _PSNTwin(nn.Module):
    """Param twin of SpikingNeuron's PSN branch: declares the identical
    weight/bias (same names, shapes, inits — see SpikingNeuron._fire) and
    returns the VALUES, for the fused Pallas attention path. The variable
    tree is bit-identical to the XLA path's (tests/test_fused_attn_model.py
    asserts init equality)."""

    T: int

    @nn.compact
    def __call__(self):
        bound = math.sqrt(1.0 / self.T)

        def _uniform_sym(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

        w = self.param("weight", _uniform_sym, (self.T, self.T))
        b = self.param("bias", nn.initializers.constant(-1.0), (self.T, 1))
        return w, b


class _TorchBNTwin(nn.Module):
    """Param/stat twin of TorchBatchNorm (eval use): declares the identical
    scale/bias params and mean/var batch_stats, returns the eval-mode
    affine (a, c) with y = a*x + c."""

    features: int

    @nn.compact
    def __call__(self):
        from ..ops.pallas_attn import bn_eval_affine
        mean = self.variable("batch_stats", "mean",
                             nn.initializers.zeros, None, (self.features,))
        var = self.variable("batch_stats", "var",
                            nn.initializers.ones, None, (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return bn_eval_affine(scale, bias, mean.value, var.value)


class _BNScopeTwin(nn.Module):
    """Scope twin of SpikingNorm(norm='BN') — one TorchBatchNorm child named
    BatchNorm_0 (models/spiking_layers.py SpikingNorm)."""

    features: int

    @nn.compact
    def __call__(self):
        return _TorchBNTwin(self.features, name="BatchNorm_0")()


class _QKVBranchTwin(nn.Module):
    """Param twin of _QKVBranch (linear kernel + BN + PSN + optional PE);
    explicit jnp.float32 param dtypes mirror nn.Dense's param_dtype so init
    values match under enable_x64 too."""

    dim: int
    T: int
    pe_shape: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self):
        class _Lin(nn.Module):
            dim: int

            @nn.compact
            def __call__(self):
                return self.param("kernel", kaiming_normal_fan_out,
                                  (self.dim, self.dim), jnp.float32)

        w = _Lin(self.dim, name="linear")()
        a, c = _BNScopeTwin(self.dim, name="bn")()
        pe = None
        if self.pe_shape is not None:
            pe = self.param("positional_encoding", nn.initializers.zeros,
                            self.pe_shape)
        wsn, bsn = _PSNTwin(self.T, name="sn")()
        return w, a, c, pe, wsn, bsn


class SpikingQKWindowAttention3D(nn.Module):
    """Linear-complexity spiking QK attention (the MS / SDformerFlow path).

    attn_token = spike(sum_c q); attn = k * attn_token; no softmax, no mask.

    With ``cfg.fused_qk_attn`` and eval-compatible conditions (PSN, BN, the
    temporal window == 2, even window-batch) the whole interior runs as ONE
    Pallas kernel (ops/pallas_attn.py) — identical variable tree, so the
    flag flips on a cloned model over the same variables. The fused path
    returns ``attn_scores=None`` (the attention-telemetry spike is not
    materialized); keep the flag off when collecting attention maps.
    """

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    cfg: SpikingConfig
    version: str = "swinv1"
    qk_scale: Optional[float] = None
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)
    norm: Optional[str] = "BN"

    def _fused(self, x, acfg, nh, n_all):
        from ..ops.pallas_attn import QKAttnParams, fused_qk_attention
        T, B_, Hw, Ww_, C = x.shape
        hd = C // nh
        w_in, b_in = _PSNTwin(acfg.num_steps, name="proj_sn")()
        wq, aq, cq, _, w_q, b_q = _QKVBranchTwin(
            self.dim, acfg.num_steps, name="q")()
        wk, ak, ck, pe, w_k, b_k = _QKVBranchTwin(
            self.dim, acfg.num_steps, pe_shape=(1, nh, n_all, hd),
            name="k")()
        w_t, b_t = _PSNTwin(acfg.num_steps, name="sn2_q")()
        # attention-telemetry neuron: params must exist (tree parity + the
        # AdamW decay mask keys on the name) even though the fused forward
        # never fires it
        _PSNTwin(acfg.num_steps, name="attn_sn")()

        class _Proj(nn.Module):
            dim: int

            @nn.compact
            def __call__(self):
                w = self.param("kernel", kaiming_normal_fan_out,
                               (self.dim, self.dim), jnp.float32)
                b = self.param("bias", nn.initializers.zeros,
                               (self.dim,), jnp.float32)
                return w, b

        wp, bp = _Proj(self.dim, name="proj")()
        ap, cp = _BNScopeTwin(self.dim, name="proj_bn")()
        dt = x.dtype
        p = QKAttnParams(
            w_in=w_in.astype(dt), b_in=b_in.astype(dt),
            wq=wq.astype(dt), aq=aq, cq=cq,
            w_q=w_q.astype(dt), b_q=b_q.astype(dt),
            wk=wk.astype(dt), ak=ak, ck=ck,
            pe=pe.reshape(T, -1, C).astype(dt),
            w_k=w_k.astype(dt), b_k=b_k.astype(dt),
            w_t=w_t.astype(dt), b_t=b_t.astype(dt),
            wp=wp.astype(dt), bp=bp.astype(dt), ap=ap, cp=cp)
        out = fused_qk_attention(x, p, nh)
        return out, None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        del mask  # reference quirk: the shift mask is ignored in this path
        T, B_, Hw, Ww_, C = x.shape
        nh = self.num_heads
        hd = C // nh
        acfg = self.cfg.replace(num_steps=self.window_size[0])
        N_all = self.window_size[0] * self.window_size[1] * self.window_size[2]

        if (self.cfg.fused_qk_attn and not train
                and self.cfg.neuron_type == "psn"
                and self.norm == "BN"
                and not norm_is_folded(self.norm, acfg)
                and T == 2 and acfg.num_steps == 2 and B_ % 2 == 0):
            return self._fused(x, acfg, nh, N_all)

        pairlocal = (self.cfg.pairlocal_attn and T == 2
                     and acfg.num_steps == 2 and B_ % 2 == 0)

        x = SpikingNeuron(acfg, name="proj_sn")(x)
        q = _QKVBranch(self.dim, acfg, self.norm, name="q")(x, train)
        k = _QKVBranch(self.dim, acfg, self.norm, add_pe=True,
                       pe_shape=(1, nh, N_all, hd), name="k")(x, train)

        if pairlocal:
            # PAIR-LOCAL re-expression of the fold algebra below — the
            # exact same function (f64-tested, tests/test_pallas_attn.py /
            # test_fused_attn_model.py) with the three head-scrambled
            # q/k/att_token fold relayouts eliminated; only the output
            # pair-regroup remains. Works in TRAIN too: the branch modules
            # above are untouched (identical BN statistics populations),
            # the spikes fire on relabeled-but-identical multisets, and the
            # produced tensor is elementwise identical, so gradients,
            # BN stats and telemetry all match the raw-refold path.
            att = q.reshape(T, B_, Hw, Ww_, nh, hd).sum(-1)
            att = SpikingNeuron(acfg, name="sn2_q")(att)  # (T,B_,h,w,nh)
            a = (k.reshape(T, B_, Hw, Ww_, nh, hd)
                 * att[..., None]).reshape(T, B_, Hw, Ww_, C)

            def regroup(ah):  # [B_, h, w, C] -> [2(t4), B_/2, h, w, C]
                v = ah.reshape(B_ // 2, nh, 2, Hw, Ww_, hd)
                v = v.transpose(2, 0, 3, 4, 1, 5)
                return v.reshape(2, B_ // 2, Hw, Ww_, C)

            out = jnp.concatenate([regroup(a[0]), regroup(a[1])], axis=1)
        else:
            # raw reshape folding (reference parity): q keeps its time
            # axis; k folds time into tokens
            q = q.reshape(T, B_, nh, -1, hd)
            k = k.reshape(B_, nh, -1, hd)

            att_token = q.sum(axis=-1, keepdims=True)   # (T, B_, nh, HW, 1)
            att_token = SpikingNeuron(acfg, name="sn2_q")(att_token)
            attn = k * att_token.reshape(B_, nh, -1, 1)  # (B_, nh, N, hd)

            out = attn.reshape(B_, nh, T, Hw, Ww_, hd)
            out = out.transpose(2, 0, 3, 4, 1, 5).reshape(T, B_, Hw, Ww_, C)
        attn_scores = SpikingNeuron(acfg, name="attn_sn")(out)
        out = _dense(self.dim, use_bias=True, name="proj")(out)
        if self.norm in _BN_FAMILY and not norm_is_folded(self.norm, acfg):
            out = SpikingNorm(self.dim, acfg.num_steps, self.norm,
                              acfg.v_th, name="proj_bn")(out, train)
        return out, attn_scores  # [T, B_, wh, ww, C] (time-major windows)


class SpikingMlp(nn.Module):
    """SEW MLP: (fc -> BN -> spike) x2 on time-major [T, B, H, W, C]."""

    dim: int
    hidden_dim: int
    cfg: SpikingConfig
    norm: Optional[str] = "BN"
    ms: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.norm
        folded = norm_is_folded(norm, self.cfg)
        if norm in ("LN", "GN"):
            x = SpikingNorm(self.dim, self.cfg.num_steps, norm, self.cfg.v_th,
                            name="pre_norm")(x, train)
        if self.ms:
            x = SpikingNeuron(self.cfg, name="sn1")(x)
        x = _dense(self.hidden_dim, use_bias=folded, name="fc1")(x)
        if norm in _BN_FAMILY and not folded:
            x = SpikingNorm(self.hidden_dim, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="bn1")(x, train)
        if self.ms:
            x = SpikingNeuron(self.cfg, name="sn2")(x)
        else:
            x = SpikingNeuron(self.cfg, name="sn1")(x)
        x = _dense(self.dim, use_bias=folded, name="fc2")(x)
        if norm in _BN_FAMILY and not folded:
            x = SpikingNorm(self.dim, self.cfg.num_steps, norm, self.cfg.v_th,
                            name="bn2")(x, train)
        if not self.ms:
            x = SpikingNeuron(self.cfg, name="sn2")(x)
        return x


def _sew(x, y, cnf: str):
    if cnf == "ADD":
        return x + y
    if cnf == "AND":
        return x * y
    if cnf == "IAND":
        return x * (1.0 - y)
    raise NotImplementedError(cnf)


class SpikingSwinBlock3D(nn.Module):
    """One spiking swin block: SSA + MLP with SEW/MS residual joins on
    time-major [D, B, H, W, C]."""

    dim: int
    num_heads: int
    cfg: SpikingConfig
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    version: str = "swinv1"
    qk_scale: Optional[float] = None
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)
    norm: Optional[str] = "BN"
    drop_path_rate: float = 0.0
    ms: bool = False  # MS block: QK attention + MS MLP
    cnf: str = "ADD"

    def _ssa(self, x, mask_matrix, train, return_attention=False):
        D, B, H, Wd, C = x.shape  # time-major stages: [D, B, H, W, C]
        # Under a tensor-parallel mesh (jax.set_mesh with model-axis > 1),
        # pin the attention segment's activations to batch-only sharding:
        # GSPMD cannot propagate channel shardings through the raw-refold
        # window reshape chains without involuntary full rematerialization
        # (MULTICHIP_r04.json) — gather once here, at a boundary where the
        # resharding fuses into the adjacent matmuls. No-op under pure DP.
        x = constrain_data_parallel(x, batch_axis=1)
        window_size, shift_size = W.get_window_size(
            (D, H, Wd), self.window_size, self.shift_size)
        if self.norm in ("LN", "GN"):
            x = SpikingNorm(self.dim, self.cfg.num_steps, self.norm,
                            self.cfg.v_th, name="norm1")(x, train)
        x, _ = W.pad_to_windows_tm(x, window_size)
        Dp, _, Hp, Wp, _ = x.shape
        if any(s > 0 for s in shift_size):
            shifted = jnp.roll(x, (-shift_size[0], -shift_size[1],
                                   -shift_size[2]), axis=(0, 2, 3))
            attn_mask = mask_matrix
        else:
            shifted = x
            attn_mask = None
        x_windows = W.window_partition_v2_tm(shifted, window_size)
        if self.ms:
            attn_cls = SpikingQKWindowAttention3D
        else:
            attn_cls = SpikingBNWindowAttention3D
        attn_windows, attn_score = attn_cls(
            self.dim, window_size, self.num_heads, self.cfg,
            version=self.version, qk_scale=self.qk_scale,
            pretrained_window_size=self.pretrained_window_size,
            norm=self.norm, name="attn")(x_windows, attn_mask, train)
        if return_attention:
            return attn_score
        shifted = W.window_reverse_tm(attn_windows, window_size, B, Dp, Hp, Wp)
        if any(s > 0 for s in shift_size):
            x = jnp.roll(shifted, shift_size, axis=(0, 2, 3))
        else:
            x = shifted
        return x[:D, :, :H, :Wd, :]

    @nn.compact
    def __call__(self, x, mask_matrix, train: bool = False,
                 return_attention: bool = False):
        shortcut = x
        y = self._ssa(x, mask_matrix, train, return_attention)
        if return_attention:
            return y
        if self.drop_path_rate > 0.0 and train:
            y = drop_path(y, self.drop_path_rate, deterministic=False,
                          rng=self.make_rng("droppath"), batch_axis=1)
        x = _sew(y, shortcut, self.cnf)
        mlp_out = SpikingMlp(self.dim, int(self.dim * self.mlp_ratio),
                             self.cfg, norm=self.norm, ms=self.ms,
                             name="mlp")(x, train)  # already time-major
        # note: no drop-path on the MLP branch (reference parity)
        x = _sew(mlp_out, x, self.cnf)
        return x


class SpikingPatchMerging(nn.Module):
    """2x2 space-to-channel + Linear 4C->2C + norm + spike on time-major
    [D, B, H, W, C]. SEW: reduce -> norm -> spike; MS: spike -> reduce ->
    norm."""

    dim: int
    cfg: SpikingConfig
    norm: Optional[str] = "BN"
    ms: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        D, B, H, Wd, C = x.shape  # time-major; H/W at axes 2/3 as before
        if H % 2 or Wd % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, Wd % 2), (0, 0)))
        x = jnp.concatenate([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                             x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]],
                            axis=-1)  # D B H/2 W/2 4C
        folded = norm_is_folded(self.norm, self.cfg)
        if self.ms:
            x = SpikingNeuron(self.cfg, name="sn")(x)
            x = _dense(2 * self.dim, use_bias=folded, name="reduction")(x)
            if not folded:
                x = SpikingNorm(2 * self.dim, self.cfg.num_steps, self.norm,
                                self.cfg.v_th, name="norm")(x, train)
        else:
            x = _dense(2 * self.dim, use_bias=folded, name="reduction")(x)
            if not folded:
                x = SpikingNorm(2 * self.dim, self.cfg.num_steps, self.norm,
                                self.cfg.v_th, name="norm")(x, train)
            x = SpikingNeuron(self.cfg, name="sn")(x)
        return x


class SpikingSwinStage(nn.Module):
    """One stage: depth x blocks (alternating shift) + optional merge.

    Input/outputs time-major [D, B, H, W, C]; returns (downsampled,
    pre-merge features).
    """

    dim: int
    depth: int
    num_heads: int
    cfg: SpikingConfig
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    version: str = "swinv1"
    qk_scale: Optional[float] = None
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)
    norm: Optional[str] = "BN"
    drop_path_rates: Tuple[float, ...] = ()
    downsample: bool = True
    ms: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 collect_attention: bool = False):
        D, B, H, Wd, C = x.shape  # time-major
        shift = tuple(w // 2 for w in self.window_size)
        window_size, shift_size = W.get_window_size((D, H, Wd),
                                                    self.window_size, shift)
        Dp = -(-D // window_size[0]) * window_size[0]
        Hp = -(-H // window_size[1]) * window_size[1]
        Wp = -(-Wd // window_size[2]) * window_size[2]
        mask = W.compute_mask(Dp, Hp, Wp, window_size, shift_size)
        blocks = [SpikingSwinBlock3D(
            self.dim, self.num_heads, self.cfg,
            window_size=self.window_size,
            shift_size=(0, 0, 0) if i % 2 == 0 else shift,
            mlp_ratio=self.mlp_ratio, version=self.version,
            qk_scale=self.qk_scale,
            pretrained_window_size=self.pretrained_window_size,
            norm=self.norm,
            drop_path_rate=(self.drop_path_rates[i]
                            if i < len(self.drop_path_rates) else 0.0),
            ms=self.ms, name=f"block{i}") for i in range(self.depth)]
        last_input = x
        for blk in blocks:
            last_input = x
            x = blk(x, mask, train)
        attn = None
        if collect_attention:
            # re-run the final block's attention on its input (params shared)
            attn = blocks[-1](last_input, mask, train, return_attention=True)
        pre_merge = x
        if self.downsample:
            x = SpikingPatchMerging(self.dim, self.cfg, norm=self.norm,
                                    ms=self.ms, name="downsample")(x, train)
        if collect_attention:
            return x, pre_merge, attn
        return x, pre_merge
