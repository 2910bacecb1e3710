"""BatchNorm semantics across time vs torch (SURVEY hard part #1).

SpikingJelly's multi-step layer.BatchNorm2d flattens [T, B] into the batch
axis; running statistics use torch momentum 0.1. Our SpikingNorm('BN') on
[T, B, H, W, C] must match bit-for-bit in both train (batch stats + running
update) and eval (running averages) modes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from sdformerflow_tpu.models.common import SpikingConfig
from sdformerflow_tpu.models.spiking_layers import SpikingNorm


def test_bn_flattens_time_into_batch_like_torch():
    T, B, H, W, C = 5, 2, 4, 4, 8
    rng = np.random.default_rng(0)
    x = rng.normal(1.5, 2.0, (T, B, H, W, C)).astype(np.float32)

    norm = SpikingNorm(C, T, "BN")
    variables = norm.init(jax.random.PRNGKey(0), jnp.asarray(x), True)

    tbn = torch.nn.BatchNorm2d(C, momentum=0.1, eps=1e-5)
    tbn.train()
    xt = torch.from_numpy(x).reshape(T * B, H, W, C).permute(0, 3, 1, 2)

    # 3 training steps: normalized outputs AND running stats must track
    for step in range(3):
        xs = x + step  # vary the data
        out, mutated = norm.apply(variables, jnp.asarray(xs), True,
                                  mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}
        ts = torch.from_numpy(xs).reshape(T * B, H, W, C).permute(0, 3, 1, 2)
        want = tbn(ts).permute(0, 2, 3, 1).reshape(T, B, H, W, C)
        np.testing.assert_allclose(np.asarray(out), want.detach().numpy(),
                                   atol=2e-5)

    # running stats identical
    bs = jax.tree_util.tree_leaves(variables["batch_stats"])
    got_mean = np.asarray(variables["batch_stats"]["BatchNorm_0"]["mean"])
    got_var = np.asarray(variables["batch_stats"]["BatchNorm_0"]["var"])
    np.testing.assert_allclose(got_mean, tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(got_var, tbn.running_var.numpy(), rtol=1e-4)

    # eval mode uses the running averages
    tbn.eval()
    out_eval = norm.apply(variables, jnp.asarray(x), False)
    xt = torch.from_numpy(x).reshape(T * B, H, W, C).permute(0, 3, 1, 2)
    want_eval = tbn(xt).permute(0, 2, 3, 1).reshape(T, B, H, W, C)
    np.testing.assert_allclose(np.asarray(out_eval),
                               want_eval.detach().numpy(), atol=2e-5)


def test_bntt_keeps_per_step_statistics():
    T, B, H, W, C = 3, 2, 4, 4, 4
    x = np.random.default_rng(1).normal(0, 1, (T, B, H, W, C)).astype(
        np.float32)
    # make step statistics very different
    x[0] += 10.0
    norm = SpikingNorm(C, T, "BNTT")
    variables = norm.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    out, _ = norm.apply(variables, jnp.asarray(x), True,
                        mutable=["batch_stats"])
    out = np.asarray(out)
    # each step is independently normalized -> near zero mean per step
    for t in range(T):
        assert abs(out[t].mean()) < 1e-4


def test_tdbn_scale_init():
    cfg = SpikingConfig(v_th=0.25)
    norm = SpikingNorm(4, 3, "TDBN", v_th=0.25, alpha=1.0)
    x = jnp.ones((3, 2, 4, 4, 4))
    variables = norm.init(jax.random.PRNGKey(0), x, True)
    scale = np.asarray(variables["params"]["BatchNorm_0"]["scale"])
    np.testing.assert_allclose(scale, 0.25)
