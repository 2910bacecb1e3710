"""FlowServer + HTTP serving surface (tiny model, CPU).

The reference has no serving path (inference lives in the one-shot eval
scripts); these tests pin the serving engine's contract: pipelined
submissions resolve in order with correct shapes, raw-event requests are
bucketed/voxelized on device, errors surface through futures, and the HTTP
wrapper round-trips npz bodies.
"""

import io
import json
import sys
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from sdformerflow_tpu.serving import FlowServer, next_bucket  # noqa: E402

H, W = 32, 48


def _config():
    yaml = pytest.importorskip("yaml")
    cfg = yaml.safe_load((REPO / "configs" / "test_tiny_snn.yaml").
                         read_text())
    cfg["loader"]["resolution"] = [H, W]
    cfg["loader"]["crop"] = None
    cfg["loader"]["batch_size"] = 1
    return cfg


@pytest.fixture(scope="module")
def server():
    with FlowServer(_config(), bf16=False) as s:
        s.warmup()
        yield s


def test_next_bucket():
    assert next_bucket(1) == 4096
    assert next_bucket(4096) == 4096
    assert next_bucket(4097) == 8192
    assert next_bucket(100_000) == 131072


def test_voxel_requests_pipeline(server):
    rng = np.random.default_rng(0)
    futs = [server.submit(rng.normal(size=(10, H, W)).astype(np.float32))
            for _ in range(5)]
    flows = [f.result(timeout=120) for f in futs]
    for flow in flows:
        assert flow.shape == (2, H, W)
        assert np.isfinite(flow).all()
    # deterministic: same input -> same output
    x = rng.normal(size=(10, H, W)).astype(np.float32)
    a = server.infer(x)
    b = server.infer(x)
    np.testing.assert_array_equal(a, b)
    assert server.stats()["served"] >= 7
    assert "latency_ms_p50" in server.stats()


def test_event_requests_bucketed(server):
    rng = np.random.default_rng(1)
    for n in (1000, 3000):  # same 4096 bucket -> one compile
        ev = {"x": rng.uniform(0, W - 1, n).astype(np.float32),
              "y": rng.uniform(0, H - 1, n).astype(np.float32),
              "t": np.sort(rng.uniform(0, 1, n)).astype(np.float32),
              "p": rng.integers(0, 2, n).astype(np.float32)}
        flow = server.infer(ev)
        assert flow.shape == (2, H, W)
        assert np.isfinite(flow).all()


def test_events_match_precomputed_voxels(server):
    """An events request must equal the voxel request of its own grid."""
    import jax.numpy as jnp
    from sdformerflow_tpu.ops.voxel import voxel_grid_signed

    rng = np.random.default_rng(2)
    n = 2000
    ev = {"x": rng.uniform(0, W - 1, n).astype(np.float32),
          "y": rng.uniform(0, H - 1, n).astype(np.float32),
          "t": np.sort(rng.uniform(0, 1, n)).astype(np.float32),
          "p": rng.integers(0, 2, n).astype(np.float32)}
    grid = np.asarray(voxel_grid_signed(
        jnp.asarray(ev["x"]), jnp.asarray(ev["y"]), jnp.asarray(ev["t"]),
        jnp.asarray(ev["p"]), num_bins=10, height=H, width=W))
    np.testing.assert_allclose(server.infer(ev), server.infer(grid),
                               atol=1e-5)


def test_warmup_bucket_coverage(server):
    """Default warmup compiles only the target bucket; all_buckets walks
    every bucket from the minimum up (so no request ever hits
    first-arrival compile latency)."""
    before = server.stats()["served"]
    server.warmup(5000)  # one voxel + the 8192 bucket
    assert server.stats()["served"] == before + 2
    before = server.stats()["served"]
    server.warmup(5000, all_buckets=True)  # voxel + 4096 + 8192
    assert server.stats()["served"] == before + 3


def test_error_surfaces_through_future(server):
    with pytest.raises(Exception):
        server.infer(np.zeros((3, 7), np.float32))  # bad rank
    # server still alive afterwards
    flow = server.infer(np.zeros((10, H, W), np.float32))
    assert flow.shape == (2, H, W)


@pytest.fixture(scope="module")
def mesh_server():
    from sdformerflow_tpu.parallel.mesh import make_mesh
    cfg = _config()
    with FlowServer(cfg, bf16=False, mesh=make_mesh(n_data=4),
                    max_pending=16, batch_window_s=0.05) as s:
        s.warmup()
        yield s


def test_mesh_batched_voxel_matches_single(server, mesh_server):
    """Concurrent requests coalesced into one data-sharded batch must
    return the same flows as single-device single-request serving (eval
    mode is per-sample independent: BN uses running stats)."""
    rng = np.random.default_rng(7)
    xs = [rng.normal(size=(10, H, W)).astype(np.float32) for _ in range(6)]
    futs = [mesh_server.submit(x) for x in xs]  # > data axis: two groups
    for x, fut in zip(xs, futs):
        np.testing.assert_allclose(fut.result(timeout=120),
                                   server.infer(x), atol=1e-5)


def test_mesh_batched_events_and_mixed_kinds(server, mesh_server):
    """Event requests batch by bucket; an incompatible request parks as
    the next group's leader rather than corrupting the batch."""
    rng = np.random.default_rng(8)

    def ev(n, seed):
        r = np.random.default_rng(seed)
        return {"x": r.uniform(0, W - 1, n).astype(np.float32),
                "y": r.uniform(0, H - 1, n).astype(np.float32),
                "t": np.sort(r.uniform(0, 1, n)).astype(np.float32),
                "p": r.integers(0, 2, n).astype(np.float32)}

    evs = [ev(1500, i) for i in range(3)]
    vox = rng.normal(size=(10, H, W)).astype(np.float32)
    futs = [mesh_server.submit(evs[0]), mesh_server.submit(evs[1]),
            mesh_server.submit(vox), mesh_server.submit(evs[2])]
    flows = [f.result(timeout=120) for f in futs]
    for e, flow in zip(evs, [flows[0], flows[1], flows[3]]):
        np.testing.assert_allclose(flow, server.infer(e), atol=1e-5)
    np.testing.assert_allclose(flows[2], server.infer(vox), atol=1e-5)


def test_http_round_trip(server):
    import serve as serve_mod  # noqa: E402
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.build_handler(server))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"

        buf = io.BytesIO()
        np.savez(buf, chunk=np.random.default_rng(3).normal(
            size=(10, H, W)).astype(np.float32))
        req = urllib.request.Request(f"http://127.0.0.1:{port}/flow",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out["flow"].shape == (2, H, W)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats") as r:
            stats = json.loads(r.read())
        assert stats["served"] >= 1

        # the client helpers speak the same protocol (scripts/flow_client.py)
        import flow_client
        url = f"http://127.0.0.1:{port}"
        flow = flow_client.post_flow(
            url, chunk=np.zeros((10, H, W), np.float32))
        assert flow.shape == (2, H, W)
        rng = np.random.default_rng(4)
        flow = flow_client.post_flow(url, events={
            "x": rng.uniform(0, W - 1, 500).astype(np.float32),
            "y": rng.uniform(0, H - 1, 500).astype(np.float32),
            "t": np.sort(rng.uniform(0, 1, 500)).astype(np.float32),
            "p": rng.integers(0, 2, 500).astype(np.float32)})
        assert flow.shape == (2, H, W)
        assert flow_client.get_stats(url)["served"] >= 3
    finally:
        httpd.shutdown()
        thread.join(timeout=5)


def test_s2d_server_smoke():
    """FlowServer(s2d=True): the embed params are actually rearranged into
    block space and requests resolve to finite flows. Numeric exactness of
    the transform is locked in f64 by tests/test_s2d_embed.py (f32 spiking
    outputs are chaotic under summation reorder, so no A/B here)."""
    with FlowServer(_config(), bf16=False, s2d=True) as s:

        def find_head_kernel(tree):
            if "patch_embed" in tree:
                return tree["patch_embed"]["head"]["conv"]["kernel"]
            for v in tree.values():
                if isinstance(v, dict):
                    k = find_head_kernel(v)
                    if k is not None:
                        return k
            return None

        k = find_head_kernel(s._state.params)
        assert k.shape[:3] == (3, 3, 8)  # 4x block channels
        flow = s.submit(np.random.default_rng(7).normal(
            size=(10, H, W)).astype(np.float32)).result(timeout=300)
        assert flow.shape == (2, H, W)
        assert np.isfinite(flow).all()


def test_fused_attn_server_smoke():
    """FlowServer(fused_attn=True): the serving state's apply_fn carries
    cfg.fused_qk_attn (interpret-mode Pallas on CPU hosts) and requests
    resolve to finite flows. Numeric parity of the kernel itself is locked
    by tests/test_pallas_attn.py / tests/test_fused_attn_model.py."""
    with FlowServer(_config(), bf16=False, fused_attn=True) as s:
        flow = s.submit(np.random.default_rng(8).normal(
            size=(10, H, W)).astype(np.float32)).result(timeout=300)
        assert flow.shape == (2, H, W)
        assert np.isfinite(flow).all()
