"""Spiking layer zoo: neuron factory, norm zoo, SEW & MS conv layers.

Layout: all multi-step features are time-major channels-last
``[T, B, H, W, C]``. Convolutions and linears are applied with flax modules
that treat ``(T, B)`` as batch dims, so the MXU sees one large batched
conv/matmul per layer (the reference loops over T in Python or relies on
SpikingJelly's CuPy kernels). The neuron is the only sequential piece and is a
``lax.scan`` over T (see ops.neurons).

Parity targets (file:line in /root/reference):
- Spiking_neuron factory: models/STSwinNet_SNN/Spiking_modules.py:26-99
- SpikingNormLayer: Spiking_modules.py:101-146
- SpikingConvEncoderLayer (SEW conv->norm->spike): Spiking_modules.py:250-296
- MS_SpikingConvEncoderLayer (spike->conv->norm): Spiking_modules.py:298-347
- Spiking{,Transpose}DecoderLayer & MS variants: Spiking_modules.py:349-566
- Spiking{,MS_}PredLayer: Spiking_modules.py:568-647
- SpikingEmbeddingLayer / SpikingPEDLayer: Spiking_modules.py:704-825
- SEWResBlock / MS_ResBlock: Spiking_modules.py:827-933
  (note: the reference passes its ``spike_norm`` string into the
  ``num_steps`` positional slot of SpikingNormLayer, so resblock norms are
  always plain BN regardless of config — kept here for parity)
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import neurons
from ..ops.surrogate import get_surrogate
from ..ops.interpolate import resize_bilinear
from .common import SpikingConfig, xavier_uniform

# Norm kinds whose eval-time affine can be folded into the adjacent
# conv/linear weights (running-stats BatchNorm variants; BN_notrack uses
# batch statistics at eval and BNTT has per-timestep stats, neither folds).
_FOLDABLE_NORMS = ("BN", "tdBN", "TDBN")


def norm_is_folded(norm, cfg: SpikingConfig) -> bool:
    """True when ``cfg.fold_bn`` removes this norm site from the graph (the
    variables must then come from training.bn_folding.fold_bn_variables)."""
    return cfg.fold_bn and norm in _FOLDABLE_NORMS


class SpikingNeuron(nn.Module):
    """Config-driven neuron over [T, ...] inputs (time axis leading).

    Firing-rate telemetry: every call sows the mean spike rate into the
    ``intermediates`` collection (key ``spike_rate``) — apply with
    ``mutable=["intermediates"]`` to collect per-site firing rates, the
    equivalent of the reference's SpikingJelly OutputMonitor
    (eval_DSEC_flow_SNN.py:140-149).
    """

    cfg: SpikingConfig

    @nn.compact
    def __call__(self, x_seq):
        collecting = self.is_mutable_collection("intermediates")
        want_v = collecting and self.cfg.store_v_seq
        out = self._fire(x_seq, return_v=want_v)
        if want_v:
            out, v_seq = out
            # Compact per-step statistics instead of the reference's raw
            # v_seq records (AttributeMonitor('v_seq'), which it only
            # prints): [T, 3] = (mean, std, max) over all non-time axes.
            axes = tuple(range(1, v_seq.ndim))
            v_seq = v_seq.astype(jnp.float32)
            self.sow("intermediates", "membrane",
                     jnp.stack([v_seq.mean(axis=axes), v_seq.std(axis=axes),
                                v_seq.max(axis=axes)], axis=-1))
        # compute the telemetry only when the collection is actually being
        # collected — the (out != 0) bool tensor otherwise costs real layout
        # copies on TPU even though its value is unused
        if collecting:
            self.sow("intermediates", "spike_rate",
                     jnp.mean((out != 0).astype(jnp.float32)))
        return out

    def _fire(self, x_seq, return_v: bool = False):
        cfg = self.cfg
        sg = get_surrogate(cfg.surrogate, cfg.surrogate_alpha)
        kind = cfg.neuron_type.lower()
        if kind == "lif":
            return neurons.lif_neuron(x_seq, v_th=cfg.v_th, v_reset=cfg.v_reset,
                                      tau=cfg.tau, surrogate_fn=sg,
                                      detach_reset=cfg.detach_reset,
                                      return_v=return_v)
        if kind == "if":
            return neurons.if_neuron(x_seq, v_th=cfg.v_th, v_reset=cfg.v_reset,
                                     surrogate_fn=sg,
                                     detach_reset=cfg.detach_reset,
                                     return_v=return_v)
        if kind == "plif":
            w = self.param("w", lambda _: jnp.asarray(
                neurons.plif_init_w(cfg.tau), jnp.float32))
            return neurons.plif_neuron(x_seq, w, v_th=cfg.v_th,
                                       v_reset=cfg.v_reset, surrogate_fn=sg,
                                       detach_reset=cfg.detach_reset,
                                       return_v=return_v)
        if kind == "slttlif":
            return neurons.sltt_lif_neuron(x_seq, v_th=cfg.v_th,
                                           v_reset=cfg.v_reset, tau=cfg.tau,
                                           surrogate_fn=sg,
                                           detach_reset=cfg.detach_reset,
                                           return_v=return_v)
        if kind == "psn":
            T = cfg.num_steps
            assert x_seq.shape[0] == T, (
                f"PSN built for T={T} but input has T={x_seq.shape[0]}")
            bound = math.sqrt(1.0 / T)  # kaiming_uniform(a=sqrt(5)) on [T, T]

            def _uniform_sym(key, shape):
                return jax.random.uniform(key, shape, jnp.float32,
                                          -bound, bound)

            weight = self.param("weight", _uniform_sym, (T, T))
            bias = self.param("bias", nn.initializers.constant(-1.0), (T, 1))
            return neurons.psn_neuron(x_seq, weight, bias, surrogate_fn=sg,
                                      return_v=return_v)
        if kind == "glif":
            T = cfg.num_steps
            params = self.param(
                "glif", lambda key: neurons.glif_init(key, T, init_tau=0.25,
                                                      init_v_threshold=0.5,
                                                      init_conduct=0.5))
            return neurons.glif_neuron(x_seq, params, surrogate_fn=sg,
                                       return_v=return_v)
        raise ValueError(f"unknown neuron_type {cfg.neuron_type!r}")


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch running-statistics semantics.

    flax's nn.BatchNorm stores the BIASED batch variance in its running
    average; torch stores the UNBIASED (n/(n-1)) one, which shifts eval-mode
    outputs. This module matches torch/SpikingJelly exactly: normalize with
    biased batch variance in train mode, update running stats as
    ``r <- (1 - momentum) * r + momentum * stat`` with the unbiased variance.
    Param/stat names (scale/bias, mean/var) match nn.BatchNorm for
    checkpoint-map compatibility.
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (features,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (features,))
        scale = self.param("scale", self.scale_init, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        # statistics ALWAYS in >= f32: reducing millions of bf16 values in
        # bf16 corrupts the variance (it can even go negative -> NaN in
        # rsqrt). promote (not hard-cast) so a float64 input stays float64
        # (the reference-parity tests run both frameworks in f64).
        cdt = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(cdt)
        if use_running_average:
            mean = ra_mean.value.astype(cdt)
            var = ra_var.value.astype(cdt)
        else:
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axis=axes)
            var = xf.var(axis=axes)  # biased, used for normalization
            if not self.is_initializing():
                n = x.size / features
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = ((1 - m) * ra_mean.value.astype(cdt)
                                 + m * mean)
                ra_var.value = ((1 - m) * ra_var.value.astype(cdt)
                                + m * unbiased)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(cdt) + bias.astype(cdt)
        return y.astype(x.dtype)


class SpikingNorm(nn.Module):
    """Norm zoo over [T, B, H, W, C] (channels-last).

    BN flattens (T, B) into the batch axis — exactly what SpikingJelly's
    multi-step layer.BatchNorm2d does. BNTT keeps per-timestep statistics.
    TDBN is BN with scale initialized to alpha * v_th.
    """

    channels: int
    num_steps: int
    norm: str = "BN"
    v_th: float = 1.0
    alpha: float = 1.0  # TDBN scaling

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.norm
        if norm is None:
            return x
        if norm == "BN":
            return TorchBatchNorm(name="BatchNorm_0")(x, not train)
        if norm == "BN_notrack":
            # batch statistics always, no running stats (track_running_stats=False)
            mean = x.mean(axis=(0, 1, 2, 3), keepdims=True)
            var = x.var(axis=(0, 1, 2, 3), keepdims=True)
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        if norm == "TDBN":
            return TorchBatchNorm(
                name="BatchNorm_0",
                scale_init=nn.initializers.constant(
                    self.alpha * self.v_th))(x, not train)
        if norm == "BNTT":
            bns = [TorchBatchNorm(epsilon=1e-4, name=f"bn_t{i}")
                   for i in range(self.num_steps)]
            steps = [bns[i](x[i], not train) for i in range(self.num_steps)]
            return jnp.stack(steps, axis=0)
        if norm in ("GN", "IN", "LN"):
            groups = {"GN": max(self.channels // 16, 1),
                      "IN": self.channels, "LN": 1}[norm]
            # torch GroupNorm eps is 1e-5; flax defaults to 1e-6 (found by
            # tests/test_norm_module_parity.py)
            return nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                                reduction_axes=(-3, -2, -1))(x)
        raise ValueError(f"unknown norm {norm!r}")


def conv2d(features, kernel_size, stride=1, padding=None, use_bias=True,
           name=None, kernel_init=xavier_uniform):
    """3x3-style conv on [..., H, W, C] with torch-equivalent padding."""
    if padding is None:
        padding = kernel_size // 2
    return nn.Conv(features, (kernel_size, kernel_size),
                   strides=(stride, stride),
                   padding=((padding, padding), (padding, padding)),
                   use_bias=use_bias, kernel_init=kernel_init, name=name)


class TorchConvTranspose(nn.Module):
    """Transposed conv with EXACT torch ``nn.ConvTranspose2d`` semantics.

    torch computes the adjoint of Conv2d: zero-insert the input by
    ``stride``, pad by ``(k-1-padding, k-1-padding+output_padding)``, and
    cross-correlate with the spatially *flipped* kernel. flax's
    ``nn.ConvTranspose`` ('SAME') differs in both kernel orientation and pad
    placement, which broke bit-parity with converted reference decoder
    weights (found by the f64 A/B harness in tests/test_reference_parity.py;
    reference decoders: /root/reference/models/STSwinNet_SNN/
    Spiking_modules.py:398-460).

    The kernel is stored as ``(kh, kw, in, out)`` — i.e. torch's
    ``weight.transpose(2, 3, 0, 1)`` — so training/torch_interop.py's
    "deconv" transform is unchanged; the spatial flip happens at apply time.
    Works on any ``[..., H, W, C]`` input (leading dims are batch).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: Optional[int] = None  # default: kernel_size // 2
    output_padding: int = 1
    use_bias: bool = True
    kernel_init: Any = xavier_uniform

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2 if self.padding is None else self.padding
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features))
        lead = x.shape[:-3]
        xr = x.reshape((-1,) + x.shape[-3:])
        pad = (k - 1 - p, k - 1 - p + self.output_padding)
        y = jax.lax.conv_general_dilated(
            xr, kernel[::-1, ::-1].astype(x.dtype), window_strides=(1, 1),
            padding=(pad, pad), lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y.reshape(lead + y.shape[-3:])


def conv_transpose2d(features, kernel_size, stride=2, use_bias=True, name=None,
                     kernel_init=xavier_uniform, padding=None,
                     output_padding=1):
    """x2 (or x4) upsampling transposed conv, torch-exact geometry.

    Defaults match torch ConvTranspose2d(k, stride, padding=k//2,
    output_padding=1) — output = stride * input (reference decoders,
    Spiking_modules.py:421-443).
    """
    return TorchConvTranspose(features, kernel_size, stride=stride,
                              padding=padding, output_padding=output_padding,
                              use_bias=use_bias, kernel_init=kernel_init,
                              name=name)


class SpikingConvEncoderLayer(nn.Module):
    """SEW ordering: conv -> norm -> spike."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        x = conv2d(self.out_channels, self.kernel_size, self.stride,
                   self.padding, use_bias=norm is None or folded,
                   name="conv")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return SpikingNeuron(self.cfg, name="sn")(x)


class MSSpikingConvEncoderLayer(nn.Module):
    """MS (membrane shortcut) ordering: spike -> conv -> norm.
    ``first_layer`` skips the input spike."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    first_layer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        if not self.first_layer:
            x = SpikingNeuron(self.cfg, name="sn")(x)
        x = conv2d(self.out_channels, self.kernel_size, self.stride,
                   self.padding, use_bias=norm is None or folded,
                   name="conv")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return x


class SpikingDecoderLayer(nn.Module):
    """SEW decoder: bilinear x``scale`` upsample -> conv -> norm -> spike.
    The reference loops F.interpolate per step; here one batched resize."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 3
    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        T, B, H, W, C = x.shape
        x = resize_bilinear(x, (H * self.scale, W * self.scale))
        x = conv2d(self.out_channels, self.kernel_size, 1,
                   self.kernel_size // 2, use_bias=norm is None or folded,
                   name="deconv")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return SpikingNeuron(self.cfg, name="sn")(x)


class MSSpikingDecoderLayer(nn.Module):
    """MS decoder: bilinear x2 upsample -> spike -> conv -> norm."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 3
    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        T, B, H, W, C = x.shape
        x = resize_bilinear(x, (H * 2, W * 2))
        x = SpikingNeuron(self.cfg, name="sn")(x)
        x = conv2d(self.out_channels, self.kernel_size, 1,
                   self.kernel_size // 2, use_bias=norm is None or folded,
                   name="deconv")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return x


class SpikingTransposeDecoderLayer(nn.Module):
    """SEW transpose-conv decoder: deconv -> norm -> spike."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 3
    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        k = self.kernel_size if self.scale == 2 else 7
        # scale-4 geometry: torch ConvTranspose2d(7, stride=4, padding=2,
        # output_padding=1) (Spiking_modules.py:434-443)
        x = conv_transpose2d(self.out_channels, k, self.scale,
                             use_bias=norm is None or folded, name="deconv",
                             padding=k // 2 if self.scale == 2 else 2)(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return SpikingNeuron(self.cfg, name="sn")(x)


class MSSpikingTransposeDecoderLayer(nn.Module):
    """MS transpose-conv decoder: spike -> deconv -> norm."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 3
    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        x = SpikingNeuron(self.cfg, name="sn")(x)
        k = self.kernel_size if self.scale == 2 else 7
        x = conv_transpose2d(self.out_channels, k, self.scale,
                             use_bias=norm is None or folded, name="deconv",
                             padding=k // 2 if self.scale == 2 else 2)(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return x


class SpikingPredLayer(nn.Module):
    """SEW prediction head: bare conv (bias on, no norm)."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv2d(self.out_channels, self.kernel_size, 1,
                      self.kernel_size // 2, use_bias=True, name="conv")(x)


class MSSpikingPredLayer(nn.Module):
    """MS prediction head: spike -> conv."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SpikingNeuron(self.cfg, name="sn")(x)
        return conv2d(self.out_channels, self.kernel_size, 1,
                      self.kernel_size // 2, use_bias=True, name="conv")(x)


class SEWResBlock(nn.Module):
    """Spike-Element-Wise residual block: (conv->BN->spike) x2 + connect.

    Norm is always plain BN (reference positional-arg quirk, see module
    docstring)."""

    channels: int
    cfg: SpikingConfig
    connect_function: str = "ADD"

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        norm = self.cfg.spike_norm
        # resblock norms are always plain BN (reference quirk) -> foldable
        # whenever fold_bn is on and a norm exists at all
        folded = norm is not None and norm_is_folded("BN", self.cfg)
        use_bias = norm is None or folded
        x = conv2d(self.channels, 3, 1, 1, use_bias=use_bias, name="conv1")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.channels, self.cfg.num_steps, "BN",
                            self.cfg.v_th, name="norm1")(x, train)
        x = SpikingNeuron(self.cfg, name="sn1")(x)
        x = conv2d(self.channels, 3, 1, 1, use_bias=use_bias, name="conv2")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.channels, self.cfg.num_steps, "BN",
                            self.cfg.v_th, name="norm2")(x, train)
        out = SpikingNeuron(self.cfg, name="sn2")(x)
        return _connect(out, identity, self.connect_function, self.cfg)


class MSResBlock(nn.Module):
    """Membrane-shortcut residual block: (spike->conv->BN) x2 + connect."""

    channels: int
    cfg: SpikingConfig
    connect_function: str = "ADD"

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        norm = self.cfg.spike_norm
        folded = norm is not None and norm_is_folded("BN", self.cfg)
        use_bias = norm is None or folded
        x = SpikingNeuron(self.cfg, name="sn1")(x)
        x = conv2d(self.channels, 3, 1, 1, use_bias=use_bias, name="conv1")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.channels, self.cfg.num_steps, "BN",
                            self.cfg.v_th, name="norm1")(x, train)
        x = SpikingNeuron(self.cfg, name="sn2")(x)
        x = conv2d(self.channels, 3, 1, 1, use_bias=use_bias, name="conv2")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.channels, self.cfg.num_steps, "BN",
                            self.cfg.v_th, name="norm2")(x, train)
        return _connect(x, identity, self.connect_function, self.cfg)


def _connect(out, identity, cnf: str, cfg: SpikingConfig):
    if cnf == "ADD":
        return out + identity
    if cnf in ("MUL", "AND"):
        return out * identity
    if cnf == "OR":
        return get_surrogate(cfg.surrogate, cfg.surrogate_alpha)(out + identity)
    if cnf == "NMUL":
        return identity * (1.0 - out)
    raise NotImplementedError(cnf)


class SpikingResidualStack(nn.Module):
    """N residual blocks (SEW or MS), reference
    spiking_residual_feature_generator (Spiking_modules.py:935-973)."""

    channels: int
    cfg: SpikingConfig
    num_blocks: int = 4
    use_ms: bool = False
    connect_function: str = "ADD"

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = MSResBlock if self.use_ms else SEWResBlock
        for i in range(self.num_blocks):
            x = block(self.channels, self.cfg, self.connect_function,
                      name=f"res{i}")(x, train)
        return x


class SpikingEmbeddingLayer(nn.Module):
    """Patch-embedding conv (stride = spatial patch) + BN + spike; MS variant
    spikes first."""

    out_channels: int
    cfg: SpikingConfig
    stride: Tuple[int, int] = (2, 2)
    kernel_size: int = 3
    use_ms: bool = False
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        has_norm = self.use_norm and self.cfg.spike_norm is not None
        # the embedding norm is a plain TorchBatchNorm regardless of the
        # spike_norm kind -> foldable whenever fold_bn is on
        folded = has_norm and self.cfg.fold_bn
        norm_on = has_norm and not folded

        def body(h):
            h = nn.Conv(self.out_channels,
                        (self.kernel_size, self.kernel_size),
                        strides=tuple(self.stride), padding=((1, 1), (1, 1)),
                        use_bias=not has_norm or folded,
                        kernel_init=xavier_uniform, name="conv")(h)
            if norm_on:
                h = TorchBatchNorm(name="norm")(h, not train)
            return h

        if self.use_ms:
            x = SpikingNeuron(self.cfg, name="sn")(x)
            return body(x)
        x = body(x)
        return SpikingNeuron(self.cfg, name="sn")(x)


class SpikingPEDLayer(nn.Module):
    """Patch embedding with deformed shortcut: parallel stride-2 1x1 conv
    residual + (spike -> stride-2 conv -> BN)."""

    out_channels: int
    cfg: SpikingConfig
    stride: Tuple[int, int] = (2, 2)
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        has_norm = self.cfg.spike_norm is not None
        folded = has_norm and self.cfg.fold_bn  # plain BN, always foldable
        # conv_res has no norm of its own: its bias stays tied to has_norm
        x_res = nn.Conv(self.out_channels, (1, 1), strides=(2, 2),
                        padding="VALID", use_bias=not has_norm,
                        kernel_init=xavier_uniform, name="conv_res")(x)
        x = SpikingNeuron(self.cfg, name="sn")(x)
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=tuple(self.stride), padding=((1, 1), (1, 1)),
                    use_bias=not has_norm or folded,
                    kernel_init=xavier_uniform, name="conv")(x)
        if has_norm and not folded:
            x = TorchBatchNorm(name="norm")(x, not train)
        return x + x_res


class MSSepConv(nn.Module):
    """Inverted separable conv (MobileNetV2-style) with MS spikes:
    spike -> pwconv -> norm -> spike -> dwconv -> pwconv -> norm.
    Parity: MS_SepConv (Spiking_modules.py:148-197)."""

    dim: int
    cfg: SpikingConfig
    kernel_size: int = 7
    expansion_ratio: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        med = int(self.expansion_ratio * self.dim)
        use_bias = norm is None
        pad = self.kernel_size // 2
        x = SpikingNeuron(self.cfg, name="sn1")(x)
        x = nn.Conv(med, (1, 1), use_bias=use_bias or folded,
                    kernel_init=xavier_uniform, name="pwconv1")(x)
        if norm is not None and not folded:
            x = SpikingNorm(med, self.cfg.num_steps, norm, self.cfg.v_th,
                            name="norm1")(x, train)
        x = SpikingNeuron(self.cfg, name="sn2")(x)
        # dwconv has no adjacent norm (norm2 follows pwconv2): bias unchanged
        x = nn.Conv(med, (self.kernel_size, self.kernel_size),
                    padding=((pad, pad), (pad, pad)), feature_group_count=med,
                    use_bias=use_bias, kernel_init=xavier_uniform,
                    name="dwconv")(x)
        x = nn.Conv(self.dim, (1, 1), use_bias=use_bias or folded,
                    kernel_init=xavier_uniform, name="pwconv2")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.dim, self.cfg.num_steps, norm, self.cfg.v_th,
                            name="norm2")(x, train)
        return x


class MSSpikingSepConvEncoderBlock(nn.Module):
    """SepConv residual + (spike->conv3x3->norm) x2 residual.
    Parity: MS_SpikingSepConvEncoderBlock (Spiking_modules.py:199-248)."""

    in_channels: int
    out_channels: int
    cfg: SpikingConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        use_bias = norm is None or folded
        x = MSSepConv(self.in_channels, self.cfg, name="sep")(x, train) + x
        feat = x
        x = SpikingNeuron(self.cfg, name="sn1")(x)
        x = conv2d(self.out_channels, 3, 1, 1, use_bias=use_bias,
                   name="conv1")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm1")(x, train)
        x = SpikingNeuron(self.cfg, name="sn2")(x)
        x = conv2d(self.in_channels, 3, 1, 1, use_bias=use_bias,
                   name="conv2")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.in_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm2")(x, train)
        return feat + x


class MSSpikingSepTransposeDecoderLayer(nn.Module):
    """(spike -> deconv3x3 x2 -> norm) -> (spike -> 1x1 deconv x2 -> norm).
    Parity: MS_SpikingSepTransposeDecoderLayer (Spiking_modules.py:476-544)."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 3
    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        use_bias = norm is None or folded
        in_ch = x.shape[-1]
        x = SpikingNeuron(self.cfg, name="sn1")(x)
        x = conv_transpose2d(in_ch, self.kernel_size, 2, use_bias=use_bias,
                             name="deconv1")(x)
        if norm is not None and not folded:
            x = SpikingNorm(in_ch, self.cfg.num_steps, norm, self.cfg.v_th,
                            name="norm1")(x, train)
        x = SpikingNeuron(self.cfg, name="sn2")(x)
        x = conv_transpose2d(self.out_channels, 1, 2, use_bias=use_bias,
                             name="deconv2")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm2")(x, train)
        return x


class MSSpikingSepPredLayer(nn.Module):
    """spike -> pwconv -> dwconv prediction head.
    Parity: MS_SpikingSepPredLayer (Spiking_modules.py:649-702)."""

    out_channels: int
    cfg: SpikingConfig
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        x = SpikingNeuron(self.cfg, name="sn")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    kernel_init=xavier_uniform, name="pwconv")(x)
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.out_channels, use_bias=True,
                    kernel_init=xavier_uniform, name="dwconv")(x)
        return x


def drop_path(x, rate: float, deterministic: bool, rng=None,
              batch_axis: int = 1):
    """Stochastic depth: drop the whole residual branch per sample.

    For [T, B, ...] features the mask is shared across time (axis 0) and
    broadcast over space, matching timm's DropPath applied per torch batch
    row. ``batch_axis`` selects which axis indexes samples.
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = [1] * x.ndim
    shape[batch_axis] = x.shape[batch_axis]
    mask = jax.random.bernoulli(rng, keep, shape=tuple(shape))
    return jnp.where(mask, x / keep, 0.0)
