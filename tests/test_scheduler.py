"""Multi-host scheduling primitives."""

import time

import pytest

from clairs_to_tpu.parallel.scheduler import PrefetchPipeline, owned_chunks


def test_owned_chunks_partition():
    chunks = list(range(10))
    parts = [owned_chunks(chunks, i, 3) for i in range(3)]
    assert sorted(sum(parts, [])) == chunks
    assert parts[0] == [0, 3, 6, 9]


def test_prefetch_pipeline_order_and_results():
    def produce(x):
        time.sleep(0.01 * (5 - x % 5))  # out-of-order completion
        return x * x

    out = list(PrefetchPipeline(produce, range(8), depth=3, workers=3))
    assert [item for item, _ in out] == list(range(8))
    assert [res for _, res in out] == [x * x for x in range(8)]


def test_prefetch_pipeline_propagates_errors():
    def produce(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = iter(PrefetchPipeline(produce, range(5), depth=2, workers=2))
    assert next(it)[1] == 0
    assert next(it)[1] == 1
    assert next(it)[1] == 2
    with pytest.raises(ValueError):
        next(it)
