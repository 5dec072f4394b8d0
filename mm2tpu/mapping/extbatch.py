"""Cross-read batched extension dispatch (VERDICT r1 item 4).

The reference amortizes per-call FPGA cost by DMA-batching each chaining
task's buffers (chain_hardware.cpp:104-189); the TPU equivalent for the
EXTENSION stage is batching many reads' ksw2 fills into one Pallas
dispatch. align1's control flow is sequential per read (two-pass zdrop,
splits, inversions), so batching across reads uses threads: N reads run
align1 concurrently; each align_pair fill eligible for the device posts a
request to this service and blocks on its future. The dispatcher flushes
a bucket when every live worker is blocked (progress guarantee) or a
batch fills, grouping by the extd2_batch parameter contract
(mat/gaps/w/zdrop/flag must match within one dispatch).

Placement stays cost-model driven: fills below `min_cells` run on the
host native kernel inline (the device dispatch floor dwarfs them — same
PROCESS_ON_SW_IF_HW_BUSY philosophy, chain.c:105-164). On a
tunnel-attached chip the effective device win threshold is very large
(see docs/STATUS.md measurements); on a directly-attached TPU host the
same code amortizes real PCIe, which is the deployment target.
"""
from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import numpy as np


class ExtBatcher:
    """Batching service for extd2 fills across concurrently-aligned reads."""

    def __init__(self, max_batch: int = 64, min_cells: int = 0,
                 interpret: Optional[bool] = None):
        self.max_batch = max_batch
        self.min_cells = min_cells
        self.interpret = interpret
        self._lock = threading.Condition()
        self._pending: Dict[tuple, List[Tuple[tuple, Future]]] = {}
        self._n_pending = 0
        self._active = 0          # workers currently inside align work
        self._blocked = 0         # workers waiting on a future
        self.n_dispatches = 0
        self.n_batched = 0

    # -- worker lifecycle ---------------------------------------------------
    def worker_enter(self):
        with self._lock:
            self._active += 1

    def worker_exit(self):
        with self._lock:
            self._active -= 1
            self._maybe_flush_locked()

    # -- fill submission ----------------------------------------------------
    def submit(self, qseq, tseq, mat, q, e, q2, e2, w, zdrop, end_bonus,
               flag):
        """Blocking: returns the ExtzResult once a flush covers this fill."""
        key = (mat.tobytes(), q, e, q2, e2, w, zdrop, end_bonus, flag)
        fut: Future = Future()
        with self._lock:
            self._pending.setdefault(key, []).append(
                ((np.asarray(qseq, np.uint8), np.asarray(tseq, np.uint8),
                  mat), fut))
            self._n_pending += 1
            self._blocked += 1
            self._maybe_flush_locked()
            while not fut.done():
                # another worker's flush may complete us while we wait
                self._lock.wait(timeout=0.05)
                self._maybe_flush_locked()
        with self._lock:
            self._blocked -= 1
        err = fut.exception()
        if err is not None:
            raise err
        return fut.result()

    # -- dispatch -----------------------------------------------------------
    def _maybe_flush_locked(self):
        """Flush when everyone is blocked (or a bucket is full). Called
        with the lock held; the actual device call runs outside it."""
        if self._n_pending == 0:
            return
        full = any(len(v) >= self.max_batch for v in self._pending.values())
        all_blocked = self._blocked >= self._active > 0
        if not (full or all_blocked):
            return
        # pick the largest bucket
        key = max(self._pending, key=lambda k: len(self._pending[k]))
        group = self._pending.pop(key)[: self.max_batch]
        if not group:
            return
        self._n_pending -= len(group)
        self._lock.release()
        try:
            self._run_group(key, group)
        finally:
            self._lock.acquire()
            self._lock.notify_all()

    def _run_group(self, key, group):
        from ..ops.ksw2_pallas import extd2_batch
        _, q, e, q2, e2, w, zdrop, end_bonus, flag = key
        tasks = [(t[0][0], t[0][1]) for t in group]
        mat = group[0][0][2]
        self.n_dispatches += 1
        self.n_batched += len(tasks)
        try:
            results = extd2_batch(tasks, mat, q=q, e=e, q2=q2, e2=e2, w=w,
                                  zdrop=zdrop, end_bonus=end_bonus,
                                  flag=flag, interpret=self.interpret)
            for (_, fut), rz in zip(group, results):
                fut.set_result(rz)
        except Exception as err:  # noqa: BLE001
            for _, fut in group:
                if not fut.done():
                    fut.set_exception(err)


_TLS = threading.local()


def current() -> Optional[ExtBatcher]:
    return getattr(_TLS, "batcher", None)


class worker_scope:
    """Context manager installing `batcher` for align_pair on this thread."""

    def __init__(self, batcher: Optional[ExtBatcher]):
        self._b = batcher

    def __enter__(self):
        if self._b is not None:
            _TLS.batcher = self._b
            self._b.worker_enter()
        return self._b

    def __exit__(self, *exc):
        if self._b is not None:
            _TLS.batcher = None
            self._b.worker_exit()
        return False
