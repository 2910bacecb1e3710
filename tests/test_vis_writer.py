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
