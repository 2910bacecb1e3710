"""AOT export (jax.export StableHLO artifacts) round-trip.

Contract pinned here: an exported artifact, reloaded via
``training.export.load_exported`` (no model code needed at load time),
produces bit-identical flow to the live jitted eval step — for both the
voxel-chunk step and the raw-events (on-device voxelize + crop) step.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdformerflow_tpu.training.export import (_eval_fn,  # noqa: E402
                                              build_inference_state,
                                              export_flow_model,
                                              load_exported)

H, W = 32, 48
BUCKET = 4096


def _config():
    yaml = pytest.importorskip("yaml")
    cfg = yaml.safe_load((REPO / "configs" / "test_tiny_snn.yaml").
                         read_text())
    cfg["loader"]["resolution"] = [H, W]
    cfg["loader"]["crop"] = [24, 32]
    cfg["loader"]["batch_size"] = 1
    return cfg


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = _config()
    state = build_inference_state(cfg)
    out = tmp_path_factory.mktemp("export")
    meta = export_flow_model(cfg, state, str(out), bf16=False,
                             event_buckets=(BUCKET,))
    return cfg, state, out, meta


def test_meta_and_files(exported):
    _, _, out, meta = exported
    assert set(meta["artifacts"]) == {"voxel", f"events_{BUCKET}"}
    assert meta["crop"] == [24, 32]
    for name in meta["artifacts"]:
        assert (out / f"{name}.stablehlo").stat().st_size > 0
    assert (out / "export_meta.json").exists()


def test_voxel_artifact_matches_live_step(exported):
    cfg, state, out, meta = exported
    _, fns = load_exported(str(out))
    rng = np.random.default_rng(0)
    ch, cw = meta["crop"]
    chunk = jnp.asarray(rng.normal(size=(1, meta["num_bins"], ch, cw)),
                        jnp.float32)
    live = _eval_fn(cfg, state, bf16=False, events=False)(chunk)
    got = fns["voxel"](chunk)
    assert live.shape == (1, 2, ch, cw)
    np.testing.assert_array_equal(np.asarray(live), np.asarray(got))


def test_events_artifact_matches_live_step(exported):
    cfg, state, out, meta = exported
    _, fns = load_exported(str(out))
    rng = np.random.default_rng(1)
    n = 1000
    ev = {"x": np.zeros((1, BUCKET), np.float32),
          "y": np.zeros((1, BUCKET), np.float32),
          "t": np.zeros((1, BUCKET), np.float32),
          "p": np.zeros((1, BUCKET), np.float32),
          "valid": np.zeros((1, BUCKET), bool)}
    ev["x"][0, :n] = rng.uniform(0, W - 1, n).astype(np.float32)
    ev["y"][0, :n] = rng.uniform(0, H - 1, n).astype(np.float32)
    ev["t"][0, :n] = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    ev["p"][0, :n] = (rng.random(n) < 0.5).astype(np.float32)
    ev["valid"][0, :n] = True
    ev = {k: jnp.asarray(v) for k, v in ev.items()}
    live = _eval_fn(cfg, state, bf16=False, events=True)(ev)
    got = fns[f"events_{BUCKET}"](ev)
    ch, cw = meta["crop"]
    assert live.shape == (1, 2, ch, cw)
    np.testing.assert_array_equal(np.asarray(live), np.asarray(got))


def test_load_needs_no_state(exported):
    """The artifact is self-contained: calling it from a fresh function with
    only the directory path (no config/state/model objects) works."""
    _, _, out, meta = exported
    meta2, fns = load_exported(str(out))
    ch, cw = meta2["crop"]
    z = jnp.zeros((1, meta2["num_bins"], ch, cw), jnp.float32)
    flow = fns["voxel"](z)
    assert flow.shape == (1, 2, ch, cw)
    assert bool(jnp.all(jnp.isfinite(flow)))


def test_s2d_export_round_trip(tmp_path):
    """--s2d export: the baked artifact reproduces the live s2d step
    bit-exactly and returns finite flows."""
    import jax.numpy as jnp

    cfg = _config()
    state = build_inference_state(cfg, s2d=True)
    out = tmp_path / "s2d_export"
    meta = export_flow_model(cfg, state, str(out), bf16=False)
    _, fns = load_exported(str(out))
    h, w = meta["crop"] or meta["resolution"]
    chunk = jnp.asarray(np.random.default_rng(11).normal(
        size=(1, meta["num_bins"], h, w)), jnp.float32)
    live = _eval_fn(cfg, state, bf16=False, events=False)(chunk)
    got = fns["voxel"](chunk)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(live))
    assert np.isfinite(np.asarray(got)).all()
