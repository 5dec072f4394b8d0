"""Multi-host scale-out: jax.distributed runtime + ordered output merge.

The reference is strictly single-node (SURVEY §5 'Distributed
communication backend: none'); its only sharded computation is the
multi-part index merge (--split-prefix, map.c:469-524,671-714). The
TPU-native scale-out re-expresses BASELINE's '>=2 hosts' target as:

- one process per host, rendezvoused with `jax.distributed.initialize`
  (coordinator address + process count + id, the standard JAX multi-host
  runtime on TPU pods);
- per-host INPUT sharding: fragments are striped round-robin by fragment
  index (host h maps fragments with idx % n_hosts == h) — deterministic,
  seekable, no coordination on the hot path;
- a REPLICATED index: every host builds/loads the same index into its
  own chips' HBM (the all-gather-free layout SURVEY §5 prescribes for
  mapping; index-sharded ava-* layering comes later);
- ordered emission: each host writes its stripe to a per-host part file;
  after a coordination-service barrier, host 0 interleaves the parts
  round-robin — byte-identical to the single-host output (the ordered
  in-order-delivery invariant of kt_pipeline, kthread.c:97-128, across
  hosts).

The mapping hot path needs NO cross-host collectives (pure data
parallelism over reads); coordination uses the jax.distributed
coordination service (barrier + key-value store) only at batch
boundaries. On a real pod each process also drives its local chips via
the usual local mesh (parallel/mesh.py); nothing here depends on
cross-host XLA collectives, so the same code runs multi-process on CPU
for testing (tests/test_multihost.py) and on TPU pod slices.

SHARED-FILESYSTEM REQUIREMENT: the merge step has host 0 read every
host's part file, so `-o OUTPUT` must live on a filesystem visible to
all hosts (NFS/GCS-fuse on pod slices; any path on a single machine).
This mirrors the reference's --split-prefix temp files, which likewise
assume one filesystem (map.c:469-524). Host 0 raises a clear error
naming this requirement if a part file is missing after the map_done
barrier. Outputs stream through part files rather than the
coordination-service KV store because mapping output is unbounded
(gigabytes at genome scale) while the KV store is a control-plane
channel.

FAILURE MODE: if any host dies mid-run, the remaining hosts block at
the next barrier and fail when it times out (cfg.timeout_s, default
600 s; also applied to the initial rendezvous) — every surviving
process exits nonzero and the merged output is never written, so a
partial result can't be mistaken for a complete one (the degraded-mode
stance of SURVEY §5 applied across hosts).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional


@dataclass
class HostConfig:
    n_hosts: int = 1
    host_id: int = 0
    coordinator: Optional[str] = None   # "ip:port"; None = single host
    timeout_s: int = 600   # rendezvous + barrier timeout (failure bound)

    @property
    def active(self) -> bool:
        return self.n_hosts > 1


_CLIENT = None
_TIMEOUT_MS = 600_000


def init_distributed(cfg: HostConfig) -> None:
    """Bring up the JAX distributed runtime (no-op for a single host)."""
    global _CLIENT, _TIMEOUT_MS
    if not cfg.active:
        return
    import jax
    _TIMEOUT_MS = max(1, cfg.timeout_s) * 1000
    jax.distributed.initialize(coordinator_address=cfg.coordinator,
                               num_processes=cfg.n_hosts,
                               process_id=cfg.host_id,
                               initialization_timeout=max(1, cfg.timeout_s))
    from jax._src import distributed
    _CLIENT = distributed.global_state.client


def barrier(name: str, timeout_ms: Optional[int] = None) -> None:
    if _CLIENT is not None:
        _CLIENT.wait_at_barrier(name, timeout_ms or _TIMEOUT_MS)


def kv_set(key: str, value: str) -> None:
    assert _CLIENT is not None
    _CLIENT.key_value_set(key, value)


def kv_get(key: str, timeout_ms: int = 600_000) -> str:
    assert _CLIENT is not None
    return _CLIENT.blocking_key_value_get(key, timeout_ms)


def part_path(out_path: str, host_id: int) -> str:
    return "%s.host%04d.part" % (out_path, host_id)


def merge_parts(out_path: str, n_hosts: int, out_fh) -> int:
    """Host 0: interleave the per-host part files round-robin by fragment
    index — the cross-host generalization of the --split-prefix merge
    (map.c:671-714). Each part is a sequence of length-prefixed records,
    one per fragment mapped by that host (in stripe order). Returns the
    total record count."""
    missing = [h for h in range(n_hosts)
               if not os.path.exists(part_path(out_path, h))]
    if missing:
        raise RuntimeError(
            "multi-host merge: part file(s) missing for host(s) %s — "
            "-o OUTPUT must be on a filesystem shared by all hosts "
            "(see mm2tpu/parallel/multihost.py)" % missing)
    readers = [open(part_path(out_path, h), "rb") for h in range(n_hosts)]

    def next_rec(f):
        hdr = f.read(8)
        if len(hdr) < 8:
            return None
        n = int.from_bytes(hdr, "little")
        return f.read(n)

    total = 0
    alive = True
    while alive:
        alive = False
        for f in readers:
            rec = next_rec(f)
            if rec is not None:
                out_fh.write(rec.decode())
                total += 1
                alive = True
    for f in readers:
        f.close()
    return total


class PartWriter:
    """Per-host stripe output: length-prefixed records in fragment order."""

    def __init__(self, out_path: str, host_id: int):
        self._f = open(part_path(out_path, host_id), "wb")

    def write(self, text: str) -> None:
        b = text.encode()
        self._f.write(len(b).to_bytes(8, "little"))
        self._f.write(b)

    def close(self) -> None:
        self._f.close()


def cleanup_parts(out_path: str, n_hosts: int) -> None:
    for h in range(n_hosts):
        try:
            os.remove(part_path(out_path, h))
        except OSError:
            pass
