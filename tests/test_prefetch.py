"""Batch prefetcher: ordering, exception propagation, concurrency."""

import time

import numpy as np
import pytest

from frameino_tpu.data.prefetch import BatchPrefetcher


def test_order_preserved():
    def make(idxs):
        time.sleep(0.01 * (idxs[0] % 3))     # jittered work
        return sum(idxs)

    batches = [[i, i + 1] for i in range(20)]
    out = list(BatchPrefetcher(make, batches, num_workers=4, depth=3))
    assert out == [sum(b) for b in batches]


def test_exception_surfaces_in_order():
    def make(idxs):
        if idxs[0] == 3:
            raise ValueError("boom")
        return idxs[0]

    pf = BatchPrefetcher(make, [[i] for i in range(6)], num_workers=2)
    got = []
    with pytest.raises(ValueError, match="boom"):
        for x in pf:
            got.append(x)
    assert got == [0, 1, 2]


def test_overlaps_work():
    t0 = time.time()

    def make(idxs):
        time.sleep(0.05)
        return idxs[0]

    out = list(BatchPrefetcher(make, [[i] for i in range(8)],
                               num_workers=4, depth=4))
    elapsed = time.time() - t0
    assert out == list(range(8))
    assert elapsed < 0.05 * 8  # parallel speedup observed


def test_early_break_releases_workers():
    import threading
    before = threading.active_count()

    def make(idxs):
        time.sleep(0.02)
        return idxs[0]

    for _ in range(5):                     # repeated early breaks
        for x in BatchPrefetcher(make, [[i] for i in range(10)],
                                 num_workers=3, depth=2):
            break
    time.sleep(0.5)
    after = threading.active_count()
    assert after - before <= 3, (before, after)
