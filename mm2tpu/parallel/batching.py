"""Length-bucketed packing of chaining tasks into fixed-shape batches.

The reference steals work across threads at per-read granularity
(kthread.c:30-51); on a fixed-shape machine the equivalent is bucketing
reads by anchor count and padding to the bucket size, so one kernel launch
serves many reads (SURVEY.md §2.3 item 1).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..ops.chain_pallas import pack_anchors, WINDOW
from ..ops.chain_ref import avg_qspan_scaled


# bucket boundaries in anchors; multiples of the 1024 ring so tiles
# align. 1.5x intermediate rungs (3072, 6144, ...) bound padding waste
# at 1.5x instead of 2x — the bench accounting showed padded/real
# anchors at 2.4x, and padding ships on the wire like real anchors
BUCKETS = (1024, 2048, 3072, 4096, 6144, 8192, 12288, 16384, 24576,
           32768, 49152, 65536, 98304, 131072)


def bucket_for(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return -(-n // WINDOW) * WINDOW


@dataclass
class PackedBatch:
    hi: np.ndarray
    lo: np.ndarray
    qi: np.ndarray
    span: np.ndarray
    sid: np.ndarray
    n: np.ndarray       # (B, 1) int32
    avg: np.ndarray     # (B, 1) float32
    task_ids: List[int]


def pack_tasks(tasks: Sequence[np.ndarray], task_ids: Sequence[int],
               N: int) -> PackedBatch:
    """Pack anchor arrays (each (n,2) uint64, n <= N) into one (B,N) batch."""
    B = len(tasks)
    cols = [np.zeros((B, N), np.int32) for _ in range(5)]
    cols[0][:] = -0x7FFFFF0
    n_arr = np.zeros((B, 1), np.int32)
    avg_arr = np.zeros((B, 1), np.float32)
    for b, a in enumerate(tasks):
        hi, lo, qi, span, sid = pack_anchors(a, N)
        for c, v in zip(cols, (hi, lo, qi, span, sid)):
            c[b] = v
        n_arr[b, 0] = len(a)
        avg_arr[b, 0] = avg_qspan_scaled(a) if len(a) else 0.0
    return PackedBatch(*cols, n=n_arr, avg=avg_arr, task_ids=list(task_ids))


def group_by_bucket(tasks: Sequence[np.ndarray]
                    ) -> List[Tuple[int, List[int]]]:
    """Group task indices by bucket size. Returns [(N, [task_idx...]), ...]."""
    groups: dict = {}
    for i, a in enumerate(tasks):
        groups.setdefault(bucket_for(len(a)), []).append(i)
    return sorted(groups.items())
