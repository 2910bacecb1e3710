"""Energy-proxy join of the flops record with sown firing rates.

The reference has record_flops tables and firing-rate monitors but never
joins them; this locks our join (utils/energy.py): every flops site pairs
with exactly one MS neuron site, analog-input head priced as MACs, the
Spikformer E = E_MAC*MACs + E_AC*rate-weighted SynOps convention, and the
per-timestep vs per-window-slab time multipliers."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models import get_model
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.utils.energy import (ANALOG, E_AC_J, E_MAC_J,
                                           energy_ann, energy_spikingformer,
                                           normalize_spike_rates)

H, W, T, C0 = 16, 16, 4, 16

SWIN = SwinConfig(
    arc_type="swinv1", patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
    input_size=(H, W), patch_size=(1, 1, 2, 2), depths=(1, 1),
    num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 2, 2),
    qk_scale=0.125, drop_path_rate=0.0)
SPIKING = SpikingConfig(num_steps=T, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")


@pytest.fixture(scope="module")
def rates_tree():
    model = get_model("MS_SpikingformerFlowNet_en4",
                      {"num_bins": T, "base_num_channels": C0,
                       "kernel_size": 3, "use_upsample_conv": False,
                       "encoding": "voxel", "num_encoders": 2}, SWIN, SPIKING)
    model = dataclasses.replace(model, num_encoders=2)
    chunk = jax.random.normal(jax.random.PRNGKey(0), (1, T, H, W))
    x = encode_input(chunk)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, False)
    # PSN bias init is -1.0 (spikingjelly parity) -> a fresh net is nearly
    # silent; push biases positive so real spike traffic flows through
    # every site and the rate-weighted join is exercised with rates > 0
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.full_like(v, 0.5)
        if str(getattr(p[-1], "key", "")) == "bias" and v.shape == (T, 1)
        else v, variables)
    _, state = model.apply(variables, x, False, mutable=["intermediates"])
    inter = state["intermediates"]
    vals = np.array([float(np.asarray(v).mean()) for v in
                     jax.tree_util.tree_leaves(inter)])
    assert (vals > 0).sum() >= 20, "fixture should produce live spike rates"
    return inter


def _energy(rates):
    return energy_spikingformer(SWIN, rates, num_steps=T, base_channels=C0,
                                num_encoders=2, num_ch=2)


def test_every_site_paired_and_totals_consistent(rates_tree):
    rep = _energy(rates_tree)
    sites = rep["per_site"]
    macs_sites = [k for k, v in sites.items() if v["kind"] == "mac"]
    assert macs_sites == ["patch_embed.head"]
    # head: 2 * (C0//2) * 9 * H * W per step, x T steps
    assert sites["patch_embed.head"]["flops"] == 2 * (C0 // 2) * 9 * H * W * T
    # stage0 attention q linear: n_windows*N*dim^2 per wt-slab, x ceil(T/wt)
    n_windows, N = (4 * 4) // (2 * 2), 2 * 2 * 2
    assert sites["layer0.block0.attn.q"]["flops"] == (
        n_windows * N * C0 * C0 * math.ceil(T / 2))
    # energy identity and rate bounds
    assert np.isclose(rep["energy_j"],
                      rep["macs"] * E_MAC_J + rep["acs"] * E_AC_J)
    for v in sites.values():
        if v["kind"] == "ac":
            assert 0.0 <= v["rate"] <= 1.0
            assert v["ops"] <= v["flops"] + 1e-9
    assert 0.0 < rep["snn_vs_ann_ratio"] < 1.0  # sparse spikes beat MACs


def test_all_ones_rates_give_full_synops(rates_tree):
    rates = {k: 1.0 for k in normalize_spike_rates(rates_tree)}
    rep = _energy(rates)
    full_ac = sum(v["flops"] for v in rep["per_site"].values()
                  if v["kind"] == "ac")
    assert np.isclose(rep["acs"], full_ac)
    assert np.isclose(rep["ann_energy_j"],
                      (rep["macs"] + full_ac) * E_MAC_J)


def test_missing_site_fails_loudly(rates_tree):
    rates = normalize_spike_rates(rates_tree)
    key = next(k for k in rates if k.endswith("decoder0.sn"))
    del rates[key]
    with pytest.raises(KeyError, match="decoder0.sn"):
        _energy(rates)


def test_eval_driver_key_format(rates_tree):
    # scripts/eval_dsec.py writes "/"-joined keys ending "/spike_rate/0"
    flat = normalize_spike_rates(rates_tree)
    slashy = {k.replace(".", "/") + "/spike_rate/0": v
              for k, v in flat.items()}
    assert normalize_spike_rates(slashy) == flat
    rep_a, rep_b = _energy(rates_tree), _energy(slashy)
    assert np.isclose(rep_a["energy_j"], rep_b["energy_j"])


def test_energy_ann():
    rep = energy_ann({"a": {"b": 100}, "c": 50})
    assert rep["macs"] == 150
    assert np.isclose(rep["energy_j"], 150 * E_MAC_J)


def test_analog_sentinel_exported():
    assert ANALOG == "__analog__"


def test_flagship_scale_record_map_alignment():
    # depths (2,2,6,2) / window (2,9,9) / base 96 / en4 — the shipped
    # architecture; every flops-record site (incl. the depth-6 stage)
    # must have a rate mapping, and the join must complete
    from sdformerflow_tpu.utils.energy import _site_rate_map
    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(288, 384), patch_size=(1, 1, 2, 2),
        depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        out_indices=(0, 1, 2, 3), window_size=(2, 9, 9),
        qk_scale=0.125, drop_path_rate=0.2)
    suffixes = set()
    for v in _site_rate_map(swin.depths, 2, 4).values():
        if isinstance(v, tuple):
            suffixes.update(v)
        elif v != "__analog__":
            suffixes.add(v)
    rates = {f"net.{s}": 0.1 for s in suffixes}
    rep = energy_spikingformer(swin, rates, num_steps=10,
                               base_channels=96, num_encoders=4)
    assert len(rep["per_site"]) > 60  # 12 blocks x 6 sites + the rest
    assert rep["energy_j"] > 0 and rep["acs"] > 0
    # at uniform rate r every AC site satisfies ops == r * flops
    for v in rep["per_site"].values():
        if v["kind"] == "ac":
            assert np.isclose(v["ops"], 0.1 * v["flops"])
