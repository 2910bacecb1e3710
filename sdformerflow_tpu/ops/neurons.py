"""Spiking neuron dynamics as pure functions over time-major arrays.

Every neuron consumes ``x_seq`` of shape ``[T, ...]`` and emits spikes of the
same shape. Recurrent neurons (IF/LIF/PLIF/GLIF/SLTT) are a single
``jax.lax.scan`` carrying the membrane potential — the whole T-step recurrence
compiles into one fused XLA while-loop inside the surrounding program, which
replaces the reference's SpikingJelly multi-step modules and their CuPy CUDA
kernels (reference: ``functional.set_backend(model, 'cupy', ...)`` in
/root/reference/train_flow_parallel_supervised_SNN.py:103-119).

State handling is purely functional: membrane potentials are created fresh at
``v_reset`` (or 0) on every call, so the reference's ``functional.reset_net``
protocol is implicit and free.

Parity targets:
- LIF/IF/PLIF: spikingjelly.activation_based.neuron semantics
  (decay_input=True, soft reset when v_reset is None, detach_reset).
- PSN: /root/reference/models/STSwinNet_SNN/Spiking_submodules.py:183-215
  (a T x T matmul over flattened time -- no recurrence; maps straight onto
  the MXU here).
- GLIF: Spiking_submodules.py:94-180 (layer-wise learnable gates).
- SLTT: Spiking_submodules.py:11-91 (LIF whose carried membrane is detached
  each step for O(1)-in-T backprop memory).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .surrogate import atan_spike

SurrogateFn = Callable[[jax.Array], jax.Array]


def _maybe_detach(s: jax.Array, detach: bool) -> jax.Array:
    return jax.lax.stop_gradient(s) if detach else s


def _reset(v: jax.Array, spike: jax.Array, v_th, v_reset, detach_reset: bool):
    s = _maybe_detach(spike, detach_reset)
    if v_reset is None:
        return v - s * v_th  # soft reset
    return (1.0 - s) * v + s * v_reset  # hard reset


def _init_v(x0: jax.Array, v_reset) -> jax.Array:
    fill = 0.0 if v_reset is None else v_reset
    return jnp.full_like(x0, fill)


def _scan_neuron(charge_fn, x_seq, *, v_th, v_reset, surrogate_fn,
                 detach_reset, detach_carry=False, return_v=False):
    """Generic charge -> fire -> reset scan over the leading time axis."""

    def step(v, x):
        if detach_carry:
            v = jax.lax.stop_gradient(v)
        v = charge_fn(v, x)
        spike = surrogate_fn(v - v_th)
        v_next = _reset(v, spike, v_th, v_reset, detach_reset)
        out = (spike, v) if return_v else spike
        return v_next, out

    v0 = _init_v(x_seq[0], v_reset)
    _, out = jax.lax.scan(step, v0, x_seq)
    return out


def if_neuron(x_seq, *, v_th=1.0, v_reset=None, surrogate_fn: SurrogateFn = atan_spike,
              detach_reset=True, return_v=False):
    """Integrate-and-fire: v <- v + x."""
    return _scan_neuron(lambda v, x: v + x, x_seq, v_th=v_th, v_reset=v_reset,
                        surrogate_fn=surrogate_fn, detach_reset=detach_reset,
                        return_v=return_v)


def lif_neuron(x_seq, *, v_th=1.0, v_reset=None, tau=2.0,
               surrogate_fn: SurrogateFn = atan_spike, detach_reset=True,
               decay_input=True, return_v=False, detach_carry=False):
    """Leaky integrate-and-fire with SpikingJelly charge semantics."""
    vr = 0.0 if v_reset is None else v_reset

    if decay_input:
        def charge(v, x):
            return v + (x - (v - vr)) / tau
    else:
        def charge(v, x):
            return v - (v - vr) / tau + x

    return _scan_neuron(charge, x_seq, v_th=v_th, v_reset=v_reset,
                        surrogate_fn=surrogate_fn, detach_reset=detach_reset,
                        detach_carry=detach_carry, return_v=return_v)


def sltt_lif_neuron(x_seq, *, v_th=1.0, v_reset=None, tau=2.0,
                    surrogate_fn: SurrogateFn = atan_spike, detach_reset=True,
                    decay_input=True, return_v=False):
    """LIF whose carried membrane is detached each step (SLTT training)."""
    return lif_neuron(x_seq, v_th=v_th, v_reset=v_reset, tau=tau,
                      surrogate_fn=surrogate_fn, detach_reset=detach_reset,
                      decay_input=decay_input, return_v=return_v,
                      detach_carry=True)


def plif_neuron(x_seq, w, *, v_th=1.0, v_reset=None,
                surrogate_fn: SurrogateFn = atan_spike, detach_reset=True,
                decay_input=True, return_v=False):
    """Parametric LIF: the decay 1/tau = sigmoid(w) is a learnable scalar."""
    decay = jax.nn.sigmoid(w)
    vr = 0.0 if v_reset is None else v_reset

    if decay_input:
        def charge(v, x):
            return v + (x - (v - vr)) * decay
    else:
        def charge(v, x):
            return v - (v - vr) * decay + x

    return _scan_neuron(charge, x_seq, v_th=v_th, v_reset=v_reset,
                        surrogate_fn=surrogate_fn, detach_reset=detach_reset,
                        return_v=return_v)


def plif_init_w(init_tau: float = 2.0) -> float:
    """Initial w so that sigmoid(w) == 1/init_tau."""
    import math
    return -math.log(init_tau - 1.0)


def psn_neuron(x_seq, weight, bias, *, surrogate_fn: SurrogateFn = atan_spike,
               return_v=False):
    """Parallel Spiking Neuron: h = W @ x + b contracted over the time axis.

    ``weight``: [T, T]; ``bias``: [T] or [T, 1]. No recurrence — the whole
    neuron is a single matmul over time, ideal for the MXU.

    Implemented as an einsum on the native [T, ...] shape: flattening to
    [T, N] first looks equivalent but forces a tiled->linear layout change
    that XLA:TPU lowers to a sequential while-loop of dynamic-update-slices
    (measured at >50% of a full SDformerFlow forward).
    """
    T = x_seq.shape[0]
    # stage the contraction as [..., T, C]: the conv layouts around neuron
    # sites are physically (..., T, C)-ordered ({3,0,2,1}), so these
    # transposes are layout relabels and the T-contraction lands on the
    # sublane axis (MXU-friendly)
    nd = x_seq.ndim
    if nd >= 2:
        perm_in = tuple(range(1, nd - 1)) + (0, nd - 1)
        xm = jnp.transpose(x_seq, perm_in)            # [..., T, C]
        hm = (jnp.einsum("ts,...sc->...tc", weight, xm)
              + bias.reshape((T, 1)))
        perm_out = (nd - 2,) + tuple(range(0, nd - 2)) + (nd - 1,)
        h = jnp.transpose(hm, perm_out)               # [T, ..., C]
    else:
        h = weight @ x_seq + bias.reshape((T,) + (1,) * (nd - 1))
    spike = surrogate_fn(h)
    if return_v:
        return spike, h  # PSN "membrane" = pre-spike potential h
    return spike


class GLIFParams(NamedTuple):
    """Layer-wise learnable GLIF parameters (pre-sigmoid logits)."""
    alpha: jax.Array
    beta: jax.Array
    gamma: jax.Array
    tau: jax.Array
    v_threshold: jax.Array
    linear_decay: jax.Array
    v_subreset: jax.Array
    conduct: jax.Array  # [T]


def glif_init(key, T: int, *, init_tau=0.25, init_v_threshold=0.5,
              init_conduct=0.5, init_linear_decay=None, init_v_subreset=None):
    import math
    init_linear_decay = (init_v_threshold / (T * 2)
                         if init_linear_decay is None else init_linear_decay)
    init_v_subreset = (init_v_threshold if init_v_subreset is None
                       else init_v_subreset)

    def logit(p):
        return -math.log(1.0 / p - 1.0)

    ks = jax.random.split(key, 3)
    rand = [0.2 * (jax.random.uniform(k, ()) - 0.5) for k in ks]
    return GLIFParams(
        alpha=rand[0], beta=rand[1], gamma=rand[2],
        tau=jnp.asarray(logit(init_tau), jnp.float32),
        v_threshold=jnp.asarray(logit(init_v_threshold), jnp.float32),
        linear_decay=jnp.asarray(logit(init_linear_decay), jnp.float32),
        v_subreset=jnp.asarray(logit(init_v_subreset), jnp.float32),
        conduct=jnp.full((T,), logit(init_conduct), jnp.float32),
    )


def glif_neuron(x_seq, params: GLIFParams, *,
                surrogate_fn: SurrogateFn = atan_spike, return_v=False):
    """Gated LIF (layer-wise gates), matching the reference step ordering:
    charge(x_t) with previous v -> reset with the *previous* spike -> fire.
    """
    sg = jax.nn.sigmoid
    alpha, beta, gamma = sg(params.alpha), sg(params.beta), sg(params.gamma)
    tau_s = sg(params.tau)
    v_th_s = sg(params.v_threshold)
    lin_decay_s = sg(params.linear_decay)
    v_subreset_s = sg(params.v_subreset)
    conduct_s = sg(params.conduct)  # [T]

    def step(carry, inp):
        v, prev_spike = carry
        x, conduct_t = inp
        inp_t = x * (1.0 - beta * (1.0 - conduct_t))
        u = ((1.0 - alpha * (1.0 - tau_s)) * v
             - (1.0 - alpha) * lin_decay_s) + inp_t
        u = (u - (1.0 - alpha * (1.0 - tau_s)) * v * gamma * prev_spike
             - (1.0 - gamma) * v_subreset_s * prev_spike)
        spike = surrogate_fn(u - v_th_s)
        out = (spike, u) if return_v else spike
        return (u, spike), out

    v0 = jnp.zeros_like(x_seq[0])
    s0 = jnp.zeros_like(x_seq[0])
    _, out = jax.lax.scan(step, (v0, s0), (x_seq, conduct_s))
    return out
