"""Multi-chip / multi-host work scheduling.

The reference's distribution layer is GNU parallel over local processes with
filesystem handoff (SURVEY.md §2.9, §5.8).  The TPU-native equivalents:

* single host, one chip: the plain chunk loop (cli/run.py);
* single host, many chips: a 1-D `jax.sharding.Mesh` over local devices —
  the engine shards the candidate batch axis, params replicated
  (infer/engine.py `mesh=`);
* many hosts: `jax.distributed` + round-robin chunk ownership by process
  index; each host runs its own BAM decode + host stages for the chunks it
  owns, devices consume fixed-shape batches, and per-chunk VCFs are merged
  by process 0 after a host barrier (replacing the reference's sequential
  step boundaries).

CPU host stages (decode, candidate gating, filters) overlap device compute
through a double-buffered prefetch: chunk N+1 is decoded on worker threads
while chunk N's batches run on the device — the in-process analog of the
reference's loader/compute thread pair (clairs/predict.py:610-718).
"""

import queue
import threading
from typing import Callable, Iterable, List, Optional

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed when running multi-host; no-op otherwise."""
    import jax

    if coordinator_address is None:
        return 1, 0
    # CPU backends need an explicit cross-process collectives impl for the
    # client to register as multi-node (xla_bridge.make_cpu_client)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count(), jax.process_index()


def owned_chunks(chunks: List, process_index: int, process_count: int) -> List:
    """Round-robin chunk ownership across hosts (static, deterministic —
    matching the reference's CHUNK_LIST static split, run_clairs_to:553-561)."""
    return [c for i, c in enumerate(chunks) if i % process_count == process_index]


class PrefetchPipeline:
    """Decode-ahead pipeline: host workers prepare chunk work items while the
    consumer (device loop) drains them in order."""

    def __init__(self, produce: Callable, items: Iterable, depth: int = 2,
                 workers: int = 2):
        self._produce = produce
        self._items = list(items)
        self._results = {}
        self._cv = threading.Condition()
        self._next_to_emit = 0
        self._next_to_take = 0
        self._depth = depth
        self._threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(workers)
        ]
        self._errors = []
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            with self._cv:
                while (
                    self._next_to_take < len(self._items)
                    and self._next_to_take - self._next_to_emit >= self._depth
                ):
                    self._cv.wait()
                if self._next_to_take >= len(self._items):
                    return
                idx = self._next_to_take
                self._next_to_take += 1
            try:
                res = self._produce(self._items[idx])
            except Exception as e:  # propagate to the consumer
                res = None
                with self._cv:
                    self._errors.append((idx, e))
                    self._cv.notify_all()
                continue
            with self._cv:
                self._results[idx] = res
                self._cv.notify_all()

    def __iter__(self):
        for idx in range(len(self._items)):
            with self._cv:
                while idx not in self._results and not any(
                    i == idx for i, _ in self._errors
                ):
                    self._cv.wait()
                for i, e in self._errors:
                    if i == idx:
                        raise e
                res = self._results.pop(idx)
                self._next_to_emit = idx + 1
                self._cv.notify_all()
            yield self._items[idx], res


def all_hosts_barrier(name: str = "chunks_done"):
    """Barrier across hosts (multihost_utils); no-op single-host."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
