"""host_prefetch: background host-side batch producer (parallel/mesh.py).

The reference relies on torch DataLoader worker processes for this
(num_workers in the driver loader construction); here a bounded-queue
thread overlaps dataset work with device compute.
"""

import time

import numpy as np
import pytest

from sdformerflow_tpu.parallel.mesh import host_prefetch


def test_yields_all_items_in_order():
    items = list(range(57))
    assert list(host_prefetch(iter(items), size=2)) == items


def test_producer_exception_reraises_in_consumer():
    def gen():
        yield 1
        yield 2
        raise ValueError("producer broke")

    out = []
    with pytest.raises(ValueError, match="producer broke"):
        for x in host_prefetch(gen(), size=2):
            out.append(x)
    assert out == [1, 2]


def test_early_break_stops_producer_promptly():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = host_prefetch(gen(), size=2)
    for x in it:
        if x == 3:
            break
    it.close()  # sets the stop flag
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.3)
    # producer has stopped: nothing new after the stop flag settles
    assert len(produced) == n
    assert n < 20  # bounded queue kept it from running ahead


def test_overlaps_producer_and_consumer():
    """With a slow producer and a slow consumer, total time approaches
    max(producer, consumer), not their sum."""
    n, d = 8, 0.05

    def gen():
        for i in range(n):
            time.sleep(d)
            yield np.full((4,), i)

    t0 = time.time()
    for x in host_prefetch(gen(), size=2):
        time.sleep(d)
    elapsed = time.time() - t0
    # serial would be ~2*n*d = 0.8 s; overlapped ~n*d + d. Allow slack.
    assert elapsed < 1.6 * n * d, elapsed
