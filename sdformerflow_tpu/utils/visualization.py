"""Flow/event visualization and the DSEC test-server submission writer.

Parity targets: /root/reference/utils/visualization.py
- flow_to_image (:256-282): HSV color wheel (hue = angle, value = normalized
  magnitude).
- DSEC submission writer (:198-207): 16-bit PNG with
  channel0 = flow_x * 128 + 2^15, channel1 = flow_y * 128 + 2^15, channel2=0.
- events_to_image (:296-341): green(ON)/red(OFF) event rendering.

Host-side numpy + PIL/imageio. Live windows (the reference's
``Visualization_DSEC.update`` per-batch cv2 windows, :32-121) are
:class:`LiveViewer`; it degrades to a no-op on headless TPU hosts (no GUI
backend / no display), where the store path is the intended surface.
"""

from __future__ import annotations

import os

import numpy as np


def flow_to_image(flow_x: np.ndarray, flow_y: np.ndarray) -> np.ndarray:
    """[H, W] x2 -> [H, W, 3] uint8 color-wheel rendering."""
    import matplotlib.colors
    mag = np.sqrt(flow_x ** 2 + flow_y ** 2)
    min_mag = mag.min()
    mag_range = mag.max() - min_mag
    ang = (np.arctan2(flow_y, flow_x) + np.pi) / (2.0 * np.pi)
    hsv = np.zeros(flow_x.shape + (3,))
    hsv[..., 0] = ang
    hsv[..., 1] = 1.0
    hsv[..., 2] = mag - min_mag
    if mag_range != 0.0:
        hsv[..., 2] /= mag_range
    return (255 * matplotlib.colors.hsv_to_rgb(hsv)).astype(np.uint8)


def events_to_image(event_cnt: np.ndarray) -> np.ndarray:
    """[2, H, W] per-polarity counts -> green(ON)/red(OFF) uint8 image."""
    pos, neg = event_cnt[0], event_cnt[1]
    img = np.zeros(pos.shape + (3,), np.uint8)
    img[pos > 0] = [0, 255, 0]
    img[neg > 0] = [255, 0, 0]
    img[(pos > 0) & (neg > 0)] = [255, 255, 0]
    return img


def write_flow_png(path: str, flow: np.ndarray):
    """DSEC submission format: [2, H, W] float flow -> 16-bit RGB PNG with
    v * 128 + 2^15 encoding in channels 0/1 (cv2 writes uint16 PNGs)."""
    import cv2
    h, w = flow.shape[-2:]
    out = np.zeros((h, w, 3), np.uint16)
    out[..., 0] = (flow[0] * 128.0 + 2 ** 15).astype(np.uint16)
    out[..., 1] = (flow[1] * 128.0 + 2 ** 15).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])  # cv2 expects BGR channel order


def read_flow_png(path: str):
    """Inverse of write_flow_png: returns (flow [2, H, W], valid [H, W])."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)[..., ::-1].astype(np.float64)
    flow = np.stack([(img[..., 0] - 2 ** 15) / 128.0,
                     (img[..., 1] - 2 ** 15) / 128.0])
    valid = img[..., 2].astype(bool) if img.shape[-1] > 2 else np.ones(
        img.shape[:2], bool)
    return flow.astype(np.float32), valid


class FlowVisualizer:
    """Store per-sample visualizations under a run directory (replaces the
    reference's live cv2 windows + store mode)."""

    def __init__(self, out_dir: str, store: bool = True):
        self.out_dir = out_dir
        self.store = store
        self.idx = 0
        if store:
            for sub in ("flow", "events", "gtflow", "submission"):
                os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    def update(self, event_cnt=None, gt_flow=None, flow=None,
               submission_flow=None):
        if not self.store:
            self.idx += 1
            return
        import imageio.v2 as imageio
        if flow is not None:
            img = flow_to_image(np.asarray(flow[0]), np.asarray(flow[1]))
            imageio.imwrite(os.path.join(self.out_dir, "flow",
                                         f"{self.idx:09d}.png"), img)
        if gt_flow is not None:
            img = flow_to_image(np.asarray(gt_flow[0]), np.asarray(gt_flow[1]))
            imageio.imwrite(os.path.join(self.out_dir, "gtflow",
                                         f"{self.idx:09d}.png"), img)
        if event_cnt is not None:
            imageio.imwrite(os.path.join(self.out_dir, "events",
                                         f"{self.idx:09d}.png"),
                            events_to_image(np.asarray(event_cnt)))
        if submission_flow is not None:
            write_flow_png(os.path.join(self.out_dir, "submission",
                                        f"{self.idx:06d}.png"),
                           np.asarray(submission_flow))
        self.idx += 1


class LiveViewer:
    """Per-batch live cv2 windows during evaluation.

    Parity target: ``Visualization_DSEC.update``
    (/root/reference/utils/visualization.py:32-121) — named, resizable
    windows for the input events, the estimated flow, the ground-truth
    flow, and (when provided) the eval-window variants, refreshed with
    ``cv2.waitKey(1)`` per batch. Differences by design:

    - Headless-safe: window creation is probed once; on hosts without a
      GUI backend (typical TPU pods — cv2 raises or the window silently
      cannot map) the viewer disables itself and every ``update`` is a
      cheap no-op, so the same driver flag works on a workstation and in
      CI. The reference crashes on headless hosts.
    - Rendering reuses the store path's :func:`flow_to_image` /
      :func:`events_to_image` (themselves parity-tested), so live and
      stored artifacts are pixel-identical.
    - Arrays arrive channels-first host numpy ([2, H, W] flow,
      [2, H, W] per-polarity counts) exactly like :class:`FlowVisualizer`.
    """

    _WINDOWS = {
        "event_cnt": "Input Events",
        "flow": "Estimated Flow",
        "gt_flow": "Ground-truth Flow",
        "event_cnt_window": "Input Events - Eval window",
        "flow_window": "Estimated Flow - Eval window",
    }

    def __init__(self, px: int = 400, enabled: bool | None = None):
        self.px = int(px)
        self._made: set = set()
        if enabled is None:
            enabled = self._probe()
        self.enabled = bool(enabled)

    @staticmethod
    def _probe() -> bool:
        """One-shot check that cv2 can actually create a window here."""
        if not os.environ.get("DISPLAY") and os.name != "nt":
            return False
        try:
            import cv2
            cv2.namedWindow("__probe__", cv2.WINDOW_NORMAL)
            cv2.destroyWindow("__probe__")
            return True
        except Exception:  # pragma: no cover - backend-dependent
            return False

    def _show(self, key: str, img, wide: bool = False):
        import cv2
        title = self._WINDOWS[key]
        if key not in self._made:
            cv2.namedWindow(title, cv2.WINDOW_NORMAL)
            cv2.resizeWindow(title, self.px * (2 if wide else 1), self.px)
            self._made.add(key)
        cv2.imshow(title, img)

    def render(self, event_cnt=None, flow=None, gt_flow=None,
               event_cnt_window=None, flow_window=None) -> dict:
        """Pure rendering half of ``update`` (testable headless): returns
        {window_key: uint8 BGR image} for every array provided."""
        out = {}
        if event_cnt is not None:
            out["event_cnt"] = events_to_image(np.asarray(event_cnt))[
                ..., ::-1]
        if event_cnt_window is not None:
            out["event_cnt_window"] = events_to_image(
                np.asarray(event_cnt_window))[..., ::-1]
        for key, arr in (("flow", flow), ("gt_flow", gt_flow),
                         ("flow_window", flow_window)):
            if arr is not None:
                a = np.asarray(arr)
                # RGB -> BGR, matching the reference's cvtColor(RGB2BGR)
                out[key] = flow_to_image(a[0], a[1])[..., ::-1]
        return out

    def update(self, **arrays):
        if not self.enabled:
            return
        import cv2
        for key, img in self.render(**arrays).items():
            self._show(key, img)
        cv2.waitKey(1)

    def close(self):
        if self.enabled:
            import cv2
            cv2.destroyAllWindows()


class AsyncVisWriter:
    """Background-thread artifact writer around :class:`FlowVisualizer`.

    ``update`` accepts device (or host) arrays and returns immediately; a
    worker thread performs the device->host fetch and the PNG encode, so
    per-batch visualization/submission writing no longer serializes the
    eval dispatch loop (same pattern as parallel.mesh.host_prefetch on the
    input side; the reference's writer blocks the loop,
    eval_DSEC_flow_SNN.py:278-280). A bounded queue applies backpressure;
    worker exceptions re-raise on ``close``.
    """

    def __init__(self, vis: FlowVisualizer, max_pending: int = 4):
        import queue
        import threading
        self.vis = vis
        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._errs: list = []
        self._end = object()

        def worker():
            while True:
                item = self._q.get()
                if item is self._end:
                    return
                try:
                    fetched = {k: np.asarray(v)
                               for k, v in item.items() if v is not None}
                    self.vis.update(**fetched)
                except Exception as e:  # noqa: BLE001 — raised on close
                    self._errs.append(e)

        self._thread = threading.Thread(target=worker, daemon=True,
                                        name="vis-writer")
        self._thread.start()

    def update(self, **arrays):
        self._q.put(arrays)

    def close(self):
        self._q.put(self._end)
        self._thread.join()
        if self._errs:
            raise self._errs[0]
