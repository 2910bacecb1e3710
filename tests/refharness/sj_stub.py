"""Minimal spikingjelly-compatible stub (torch), enough to *import and run*
the reference models under /root/reference/models for A/B parity testing.

spikingjelly is not installable in this environment, so the API surface the
reference consumes is re-implemented here from the documented
``spikingjelly.activation_based`` (v0.0.0.0.14) semantics:

- ``base.MemoryModule`` / ``base.MultiStepModule`` with stateful membrane
  memories and single/multi-step dispatch,
- ``neuron.IFNode`` / ``LIFNode`` / ``ParametricLIFNode`` charge-fire-reset
  dynamics (decay_input variants, soft reset when ``v_reset is None``),
- ``surrogate.ATan`` / ``Sigmoid`` — Heaviside forward (``x >= 0``), smooth
  pseudo-derivative backward (matches sdformerflow_tpu/ops/surrogate.py),
- step-mode-aware ``layer.*`` wrappers that flatten ``[T, B, ...]`` into
  ``[T*B, ...]`` around the stateless torch op (seq_to_ann_forward),
- ``functional.set_step_mode`` / ``reset_net`` / ``set_backend``.

This file is TEST INFRASTRUCTURE only: the production framework never
imports it. It lets tests/test_reference_parity.py run the actual reference
forward (/root/reference/models/STSwinNet_SNN/Spiking_STSwinNet.py) against
this repo's JAX models on identical tensors with converted weights.
"""

from __future__ import annotations

import copy
import math

import torch
import torch.nn as nn

# --------------------------------------------------------------------------
# surrogate
# --------------------------------------------------------------------------


def heaviside(x: torch.Tensor) -> torch.Tensor:
    return (x >= 0).to(x)


class _ATanFn(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, alpha):
        ctx.save_for_backward(x)
        ctx.alpha = alpha
        return heaviside(x)

    @staticmethod
    def backward(ctx, grad):
        (x,) = ctx.saved_tensors
        alpha = ctx.alpha
        sg = alpha / 2 / (1 + (math.pi / 2 * alpha * x).pow(2))
        return grad * sg, None


class _SigmoidFn(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, alpha):
        ctx.save_for_backward(x)
        ctx.alpha = alpha
        return heaviside(x)

    @staticmethod
    def backward(ctx, grad):
        (x,) = ctx.saved_tensors
        s = torch.sigmoid(ctx.alpha * x)
        return grad * ctx.alpha * s * (1 - s), None


class SurrogateFunctionBase(nn.Module):
    def __init__(self, alpha: float, spiking: bool = True):
        super().__init__()
        self.alpha = alpha
        self.spiking = spiking


class ATan(SurrogateFunctionBase):
    def __init__(self, alpha: float = 2.0, spiking: bool = True):
        super().__init__(alpha, spiking)

    def forward(self, x):
        return _ATanFn.apply(x, self.alpha)


class Sigmoid(SurrogateFunctionBase):
    def __init__(self, alpha: float = 4.0, spiking: bool = True):
        super().__init__(alpha, spiking)

    def forward(self, x):
        return _SigmoidFn.apply(x, self.alpha)


# --------------------------------------------------------------------------
# base
# --------------------------------------------------------------------------


class MultiStepModule:
    """Marker mixin: module that only supports step_mode='m'."""

    step_mode = "m"


class MemoryModule(nn.Module):
    def __init__(self):
        super().__init__()
        self._memories = {}
        self._memories_rv = {}
        self.step_mode = "s"
        self.backend = "torch"

    def register_memory(self, name: str, value):
        self._memories[name] = value
        self._memories_rv[name] = copy.deepcopy(value)

    def reset(self):
        for key in self._memories:
            self._memories[key] = copy.deepcopy(self._memories_rv[key])

    def __getattr__(self, name):
        if "_memories" in self.__dict__:
            memories = self.__dict__["_memories"]
            if name in memories:
                return memories[name]
        return super().__getattr__(name)

    def __setattr__(self, name, value):
        memories = self.__dict__.get("_memories")
        if memories is not None and name in memories:
            memories[name] = value
        else:
            super().__setattr__(name, value)

    def single_step_forward(self, *args, **kwargs):
        raise NotImplementedError

    def multi_step_forward(self, x_seq: torch.Tensor):
        ys = [self.single_step_forward(x_seq[t]) for t in range(x_seq.shape[0])]
        return torch.stack(ys)

    def forward(self, *args, **kwargs):
        if self.step_mode == "s":
            return self.single_step_forward(*args, **kwargs)
        if self.step_mode == "m":
            return self.multi_step_forward(*args, **kwargs)
        raise ValueError(self.step_mode)


# --------------------------------------------------------------------------
# neuron
# --------------------------------------------------------------------------


class BaseNode(MemoryModule):
    def __init__(self, v_threshold: float = 1.0, v_reset: float = 0.0,
                 surrogate_function=None, detach_reset: bool = False,
                 step_mode="s", backend="torch", store_v_seq: bool = False):
        super().__init__()
        self.register_memory("v", v_reset if v_reset is not None else 0.0)
        self.v_threshold = v_threshold
        self.v_reset = v_reset
        self.surrogate_function = (surrogate_function if surrogate_function
                                   is not None else Sigmoid())
        self.detach_reset = detach_reset
        self.step_mode = step_mode
        self.backend = backend
        self.store_v_seq = store_v_seq

    def v_float_to_tensor(self, x: torch.Tensor):
        if isinstance(self.v, float):
            self.v = torch.full_like(x, self.v)

    def neuronal_charge(self, x):
        raise NotImplementedError

    def neuronal_fire(self):
        return self.surrogate_function(self.v - self.v_threshold)

    def neuronal_reset(self, spike):
        spike_d = spike.detach() if self.detach_reset else spike
        if self.v_reset is None:  # soft reset
            self.v = self.v - spike_d * self.v_threshold
        else:  # hard reset
            self.v = (1.0 - spike_d) * self.v + spike_d * self.v_reset

    def single_step_forward(self, x: torch.Tensor):
        self.v_float_to_tensor(x)
        self.neuronal_charge(x)
        spike = self.neuronal_fire()
        self.neuronal_reset(spike)
        return spike

    def multi_step_forward(self, x_seq: torch.Tensor):
        ys, vs = [], []
        for t in range(x_seq.shape[0]):
            ys.append(self.single_step_forward(x_seq[t]))
            if self.store_v_seq:
                vs.append(self.v)
        if self.store_v_seq:
            self.v_seq = torch.stack(vs)
        return torch.stack(ys)


class IFNode(BaseNode):
    def __init__(self, v_threshold: float = 1.0, v_reset: float = 0.0,
                 surrogate_function=None, detach_reset: bool = False,
                 step_mode="s", backend="torch", store_v_seq: bool = False):
        super().__init__(v_threshold, v_reset, surrogate_function,
                         detach_reset, step_mode, backend, store_v_seq)

    def neuronal_charge(self, x):
        self.v = self.v + x


class LIFNode(BaseNode):
    def __init__(self, tau: float = 2.0, decay_input: bool = True,
                 v_threshold: float = 1.0, v_reset: float = 0.0,
                 surrogate_function=None, detach_reset: bool = False,
                 step_mode="s", backend="torch", store_v_seq: bool = False):
        super().__init__(v_threshold, v_reset, surrogate_function,
                         detach_reset, step_mode, backend, store_v_seq)
        self.tau = tau
        self.decay_input = decay_input

    def neuronal_charge(self, x):
        if self.decay_input:
            if self.v_reset is None or self.v_reset == 0.0:
                self.v = self.neuronal_charge_decay_input_reset0(
                    x, self.v, self.tau)
            else:
                self.v = self.neuronal_charge_decay_input(
                    x, self.v, self.v_reset, self.tau)
        else:
            if self.v_reset is None or self.v_reset == 0.0:
                self.v = self.neuronal_charge_no_decay_input_reset0(
                    x, self.v, self.tau)
            else:
                self.v = self.neuronal_charge_no_decay_input(
                    x, self.v, self.v_reset, self.tau)

    # static charge kernels (named after the spikingjelly jit helpers that
    # SLTTLIFNode in /root/reference/models/STSwinNet_SNN/
    # Spiking_submodules.py:40-53 calls by name)
    @staticmethod
    def neuronal_charge_decay_input_reset0(x, v, tau):
        return v + (x - v) / tau

    @staticmethod
    def neuronal_charge_decay_input(x, v, v_reset, tau):
        return v + (x - (v - v_reset)) / tau

    @staticmethod
    def neuronal_charge_no_decay_input_reset0(x, v, tau):
        return v * (1.0 - 1.0 / tau) + x

    @staticmethod
    def neuronal_charge_no_decay_input(x, v, v_reset, tau):
        return v - (v - v_reset) / tau + x

    # eval-mode fused step helpers (Spiking_submodules.py:73-90)
    @staticmethod
    def jit_eval_single_step_forward_soft_reset_decay_input(x, v, v_th, tau):
        v = v + (x - v) / tau
        spike = (v >= v_th).to(x)
        v = v - spike * v_th
        return spike, v

    @staticmethod
    def jit_eval_single_step_forward_soft_reset_no_decay_input(x, v, v_th,
                                                               tau):
        v = v * (1.0 - 1.0 / tau) + x
        spike = (v >= v_th).to(x)
        v = v - spike * v_th
        return spike, v

    @staticmethod
    def jit_eval_single_step_forward_hard_reset_decay_input(x, v, v_th,
                                                            v_reset, tau):
        v = v + (x - (v - v_reset)) / tau
        spike = (v >= v_th).to(x)
        v = v_reset * spike + (1.0 - spike) * v
        return spike, v

    @staticmethod
    def jit_eval_single_step_forward_hard_reset_no_decay_input(x, v, v_th,
                                                               v_reset, tau):
        v = v - (v - v_reset) / tau + x
        spike = (v >= v_th).to(x)
        v = v_reset * spike + (1.0 - spike) * v
        return spike, v


class ParametricLIFNode(BaseNode):
    def __init__(self, init_tau: float = 2.0, decay_input: bool = True,
                 v_threshold: float = 1.0, v_reset: float = 0.0,
                 surrogate_function=None, detach_reset: bool = False,
                 step_mode="s", backend="torch", store_v_seq: bool = False):
        super().__init__(v_threshold, v_reset, surrogate_function,
                         detach_reset, step_mode, backend, store_v_seq)
        self.decay_input = decay_input
        init_w = -math.log(init_tau - 1.0)
        self.w = nn.Parameter(torch.as_tensor(init_w))

    def neuronal_charge(self, x):
        sig_w = self.w.sigmoid()
        if self.decay_input:
            if self.v_reset is None or self.v_reset == 0.0:
                self.v = self.v + (x - self.v) * sig_w
            else:
                self.v = self.v + (x - (self.v - self.v_reset)) * sig_w
        else:
            if self.v_reset is None or self.v_reset == 0.0:
                self.v = self.v * (1.0 - sig_w) + x
            else:
                self.v = self.v - (self.v - self.v_reset) * sig_w + x


# --------------------------------------------------------------------------
# layer: step-mode-aware wrappers
# --------------------------------------------------------------------------


def seq_to_ann_forward(x_seq: torch.Tensor, stateless_forward):
    y = stateless_forward(x_seq.flatten(0, 1))
    return y.view(x_seq.shape[0], x_seq.shape[1], *y.shape[1:])


def _step_mode_wrap(torch_cls):
    class Wrapped(torch_cls):
        def __init__(self, *args, step_mode="s", **kwargs):
            super().__init__(*args, **kwargs)
            self.step_mode = step_mode

        def forward(self, x):
            if self.step_mode == "m":
                return seq_to_ann_forward(x, super().forward)
            return super().forward(x)

    Wrapped.__name__ = torch_cls.__name__
    return Wrapped


Conv2d = _step_mode_wrap(nn.Conv2d)
ConvTranspose2d = _step_mode_wrap(nn.ConvTranspose2d)
BatchNorm2d = _step_mode_wrap(nn.BatchNorm2d)
GroupNorm = _step_mode_wrap(nn.GroupNorm)
Linear = _step_mode_wrap(nn.Linear)
Dropout = _step_mode_wrap(nn.Dropout)


class ThresholdDependentBatchNorm2d(BatchNorm2d):
    """tdBN: BatchNorm2d whose affine weight is initialized to alpha*v_th
    (Zheng et al. 2021); multi-step only."""

    def __init__(self, alpha: float, v_th: float, *args, **kwargs):
        super().__init__(*args, step_mode="m", **kwargs)
        self.alpha = alpha
        self.v_th = v_th
        nn.init.constant_(self.weight, alpha * v_th)


class SeqToANNContainer(nn.Sequential):
    def forward(self, x_seq):
        return seq_to_ann_forward(x_seq, super().forward)


# --------------------------------------------------------------------------
# functional
# --------------------------------------------------------------------------


def set_step_mode(net: nn.Module, step_mode: str):
    for m in net.modules():
        if hasattr(m, "step_mode"):
            m.step_mode = step_mode


def reset_net(net: nn.Module):
    for m in net.modules():
        if isinstance(m, MemoryModule):
            m.reset()


def set_backend(net: nn.Module, backend: str, instance=None):
    pass  # torch path only in this stub
