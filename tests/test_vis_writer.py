"""AsyncVisWriter: background artifact writing for the eval drivers."""

import numpy as np
import pytest

from sdformerflow_tpu.utils.visualization import (AsyncVisWriter,
                                                  FlowVisualizer,
                                                  read_flow_png)


def test_async_writer_writes_all(tmp_path):
    import jax.numpy as jnp
    vis = FlowVisualizer(str(tmp_path), store=True)
    w = AsyncVisWriter(vis)
    rng = np.random.default_rng(0)
    flows = [rng.normal(size=(2, 8, 12)).astype(np.float32)
             for _ in range(5)]
    for f in flows:
        # device arrays are accepted and fetched on the writer thread
        w.update(flow=jnp.asarray(f), gt_flow=f, submission_flow=f,
                 event_cnt=None)
    w.close()
    assert len(list((tmp_path / "flow").glob("*.png"))) == 5
    assert len(list((tmp_path / "gtflow").glob("*.png"))) == 5
    subs = sorted((tmp_path / "submission").glob("*.png"))
    assert len(subs) == 5
    # submission PNGs round-trip at the 1/128 px quantization
    got, _ = read_flow_png(str(subs[2]))
    np.testing.assert_allclose(got, flows[2], atol=1 / 128.0)


def test_async_writer_raises_worker_errors(tmp_path):
    vis = FlowVisualizer(str(tmp_path), store=True)

    def boom(**kw):
        raise ValueError("bad frame")

    vis.update = boom
    w = AsyncVisWriter(vis)
    w.update(flow=np.zeros((2, 4, 4), np.float32))
    with pytest.raises(ValueError, match="bad frame"):
        w.close()


class TestLiveViewer:
    """LiveViewer: the reference's Visualization_DSEC.update live-window
    surface (/root/reference/utils/visualization.py:32-121), headless-safe."""

    def test_headless_probe_disables(self, monkeypatch):
        from sdformerflow_tpu.utils.visualization import LiveViewer
        monkeypatch.delenv("DISPLAY", raising=False)
        v = LiveViewer()
        assert v.enabled is False
        # update/close must be cheap no-ops, not crashes
        v.update(flow=np.zeros((2, 4, 4), np.float32))
        v.close()

    def test_render_matches_store_path(self):
        """Live rendering must be pixel-identical (mod RGB->BGR) to the
        parity-tested store-path renderers."""
        from sdformerflow_tpu.utils.visualization import (LiveViewer,
                                                          events_to_image,
                                                          flow_to_image)
        rng = np.random.default_rng(1)
        flow = rng.normal(size=(2, 6, 8)).astype(np.float32)
        cnt = rng.integers(0, 3, size=(2, 6, 8)).astype(np.float32)
        v = LiveViewer(enabled=False)
        imgs = v.render(event_cnt=cnt, flow=flow, gt_flow=flow,
                        flow_window=flow)
        assert set(imgs) == {"event_cnt", "flow", "gt_flow", "flow_window"}
        np.testing.assert_array_equal(
            imgs["flow"], flow_to_image(flow[0], flow[1])[..., ::-1])
        np.testing.assert_array_equal(
            imgs["event_cnt"], events_to_image(cnt)[..., ::-1])

    def test_update_drives_cv2_windows(self, monkeypatch):
        """With a (mocked) GUI backend, update creates the reference's named
        windows, sizes them to px, shows each image, and pumps waitKey."""
        import sys
        import types
        from sdformerflow_tpu.utils import visualization as V

        calls = {"named": [], "resized": [], "shown": [], "wait": 0}
        fake = types.SimpleNamespace(
            WINDOW_NORMAL=0,
            namedWindow=lambda t, f: calls["named"].append(t),
            resizeWindow=lambda t, w, h: calls["resized"].append((t, w, h)),
            imshow=lambda t, img: calls["shown"].append((t, img.shape)),
            waitKey=lambda ms: calls.__setitem__("wait", calls["wait"] + 1),
            destroyAllWindows=lambda: None,
        )
        monkeypatch.setitem(sys.modules, "cv2", fake)
        v = V.LiveViewer(px=123, enabled=True)
        flow = np.zeros((2, 4, 4), np.float32)
        cnt = np.zeros((2, 4, 4), np.float32)
        v.update(event_cnt=cnt, flow=flow, gt_flow=flow)
        v.update(flow=flow)  # windows created once, reused after
        assert sorted(calls["named"]) == sorted(
            ["Input Events", "Estimated Flow", "Ground-truth Flow"])
        assert ("Estimated Flow", 123, 123) in calls["resized"]
        assert calls["wait"] == 2
        assert len(calls["shown"]) == 4
        v.close()
