"""Surrogate-gradient spike functions.

Forward pass is the Heaviside step ``(x >= 0) -> 1.0``; the backward pass
substitutes a smooth pseudo-derivative, implemented with ``jax.custom_vjp``.

Parity targets (behavior, not code):
- SpikingJelly ``surrogate.ATan`` (default alpha=2.0): backward
  ``alpha / 2 / (1 + (pi/2 * alpha * x)^2)``.
- SpikingJelly ``surrogate.Sigmoid`` (default alpha=4.0): backward
  ``alpha * s * (1 - s)`` with ``s = sigmoid(alpha * x)``.
Used at every neuron site in the reference via the config string
``surrogate_fun: surrogate.ATan()`` (see /root/reference/models/STSwinNet_SNN/
Spiking_modules.py:44 and configs/*.yml).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def heaviside(x: jax.Array) -> jax.Array:
    """Spike if the (membrane - threshold) argument is non-negative."""
    x = jnp.asarray(x)
    return (x >= 0.0).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def atan_spike(x: jax.Array, alpha: float = 2.0) -> jax.Array:
    """Heaviside forward, ATan pseudo-derivative backward."""
    return heaviside(x)


def _atan_fwd(x, alpha):
    return heaviside(x), x


def _atan_bwd(alpha, x, g):
    sg = alpha / 2.0 / (1.0 + (math.pi / 2.0 * alpha * x) ** 2)
    return (g * sg,)


atan_spike.defvjp(_atan_fwd, _atan_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def sigmoid_spike(x: jax.Array, alpha: float = 4.0) -> jax.Array:
    """Heaviside forward, sigmoid pseudo-derivative backward."""
    return heaviside(x)


def _sigmoid_fwd(x, alpha):
    return heaviside(x), x


def _sigmoid_bwd(alpha, x, g):
    s = jax.nn.sigmoid(alpha * x)
    return (g * alpha * s * (1.0 - s),)


sigmoid_spike.defvjp(_sigmoid_fwd, _sigmoid_bwd)


_REGISTRY = {
    "atan": atan_spike,
    "sigmoid": sigmoid_spike,
}


def get_surrogate(name: str, alpha: float | None = None):
    """Resolve a surrogate by name (replaces the reference's eval() of config
    strings like ``surrogate.ATan()``). Accepts the reference spellings too.
    """
    key = name.lower()
    # tolerate reference config spellings: "surrogate.ATan()" etc.
    for candidate in ("atan", "sigmoid"):
        if candidate in key:
            key = candidate
            break
    if key not in _REGISTRY:
        raise ValueError(f"unknown surrogate function: {name!r}")
    fn = _REGISTRY[key]
    if alpha is None:
        return fn
    return partial(fn, alpha=alpha)
