"""Device-mesh scale-out: data parallelism over reads with a replicated
HBM-resident index (SURVEY.md §5 'Distributed communication backend').

The reference is single-node pthreads + one PCIe FPGA; the TPU-native
equivalent shards read batches over a 1-D 'data' mesh axis with shard_map,
keeps the minimizer index replicated in HBM on every chip, and gathers
per-read results to the host for ordered emission. No collectives are
needed on the hot path (pure data parallelism).

For indexes that overflow a single chip's HBM when replicated (hg38-class
probe arrays are ~10 GB; ava-* workloads add dense occurrence tails), the
**index-sharded layout** (shard_index_arrays + sharded_probe_step) range-
partitions the sorted CSR key space over the same axis: each chip holds
1/D of (keys, start, cnt), queries all-gather over ICI, every chip probes
its range (exactly one can hit — the partition is by key order), and the
per-query results reduce-scatter back to the row shards. This is the
SURVEY §5 'host-sharded with all-gather of candidate hits' variant; the
pos payload arrays shard by the same ranges and hits are merged on host.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.chain_pallas_v2 import chain_scores_device_v2 as chain_scores_device
from ..ops.chain_pallas_v3 import chain_scores_device_v3


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices=None) -> Mesh:
    """1-D data mesh over THIS process's chips. local_devices (not
    jax.devices()): under jax.distributed the global list includes other
    hosts' non-addressable devices — each host shards its own stripe
    over its own chips (multihost.py handles the cross-host axis), so a
    mesh must never span processes."""
    devs = devices if devices is not None else jax.local_devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _chain_auto(*, max_dist_x, max_dist_y, bw, iter_cap, gap_scale,
                is_cdna, n_segs, interpret):
    """Per-shard chaining kernel selector: the v3 cross-task-lane kernel
    (the production uniseg fast path, matching the FPGA's 8x128
    decomposition, device/minimap2_opencl.cl:5-8) whenever the shard
    shape allows; v2 chunked max-plus otherwise (multiseg/cDNA scoring,
    or shard batches not divisible by 8)."""
    def run(hi, lo, qi, span, sid, n, avg):
        Bl = hi.shape[0]
        if (not is_cdna) and n_segs == 1 and Bl % 8 == 0:
            g = next(g for g in (4, 2, 1) if Bl % (8 * g) == 0)
            return chain_scores_device_v3(
                hi, lo, qi, span, n, avg, max_dist_x=max_dist_x,
                max_dist_y=max_dist_y, bw=bw, iter_cap=iter_cap,
                gap_scale=gap_scale, interpret=interpret,
                groups_per_program=g)
        return chain_scores_device(
            hi, lo, qi, span, sid, n, avg, max_dist_x=max_dist_x,
            max_dist_y=max_dist_y, bw=bw, iter_cap=iter_cap,
            gap_scale=gap_scale, is_cdna=is_cdna, n_segs=n_segs,
            interpret=interpret)
    return run


def sharded_chain_step(mesh: Mesh, *, max_dist_x: int, max_dist_y: int,
                       bw: int, iter_cap: int, gap_scale: float,
                       is_cdna: bool, n_segs: int, interpret: bool = False,
                       axis: str = "data"):
    """Returns a jitted function mapping sharded (B,N) anchor batches to
    sharded (B,N) chaining scores; B must be divisible by the mesh size.
    Uniseg shards divisible by 8 run the v3 kernel (see _chain_auto)."""
    kernel = _chain_auto(
        max_dist_x=max_dist_x, max_dist_y=max_dist_y,
        bw=bw, iter_cap=iter_cap, gap_scale=gap_scale, is_cdna=is_cdna,
        n_segs=n_segs, interpret=interpret)

    spec = P(axis, None)
    spec1 = P(axis, None)

    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(spec, spec, spec, spec, spec, spec1, spec1),
                       out_specs=(spec, spec))
    def step(hi, lo, qi, span, sid, n, avg):
        return kernel(hi, lo, qi, span, sid, n, avg)

    return jax.jit(step)


def sharded_chain_step8(mesh: Mesh, *, max_dist_x: int, max_dist_y: int,
                        bw: int, iter_cap: int, gap_scale: float,
                        is_cdna: bool, n_segs: int, interpret: bool = False,
                        axis: str = "data"):
    """sharded_chain_step on the delta-packed 8 B/anchor wire
    (ops/chain_packed.py): host->chip planes are (d uint16, qi int32,
    spansid uint16) + the exception side channel, decoded per shard row
    with _decode8 (pure row-wise: cumsum/cummax never cross the batch
    axis, so the shard_map split is exact); the back plane is the
    relative-int16 predecessor. Same kernel, ~2.4x less ICI/PCIe
    traffic per chip than the 20 B raw-plane step."""
    kernel = _chain_auto(
        max_dist_x=max_dist_x, max_dist_y=max_dist_y,
        bw=bw, iter_cap=iter_cap, gap_scale=gap_scale, is_cdna=is_cdna,
        n_segs=n_segs, interpret=interpret)

    spec = P(axis, None)
    spec1 = P(axis, None)

    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(spec, spec, spec, spec, spec, spec,
                                 spec1, spec1),
                       out_specs=(spec, spec))
    def step(d, qi, spansid, exc_pos, exc_c, exc_hib, n, avg):
        from ..ops.chain_packed import _decode8, _p_rel
        hi, lo, qi2, span, sid = _decode8(d, qi, spansid, exc_pos,
                                          exc_c, exc_hib)
        f, p = kernel(hi, lo, qi2, span, sid, n, avg)
        return f, _p_rel(p)

    return jax.jit(step)


def split_keys(keys_u64: np.ndarray):
    """uint64 minimizer hashes -> (hi, lo) int32 pair for device search.
    hi = top 32 bits (< 2^24 for k<=28, so plain int32); lo = low 32 bits
    stored sign-flipped so int32 comparison matches unsigned order."""
    hi = (keys_u64 >> np.uint64(32)).astype(np.int64).astype(np.int32)
    lo = ((keys_u64 & np.uint64(0xFFFFFFFF)) ^ np.uint64(0x80000000))
    return hi, lo.astype(np.int64).astype(np.int32)


def lookup_index_device(khi: jnp.ndarray, klo: jnp.ndarray,
                        start: jnp.ndarray, cnt: jnp.ndarray,
                        qhi: jnp.ndarray, qlo: jnp.ndarray):
    """Vectorized index probe on device (mm_idx_get equivalent): branchless
    lexicographic binary search over the replicated CSR key array, one
    gather per log2 step — no 64-bit integer support needed. Returns
    (start, cnt) with cnt==0 on miss."""
    n = khi.shape[0]
    steps = max(1, int(np.ceil(np.log2(n + 1))))
    lo_b = jnp.zeros(qhi.shape, jnp.int32)
    hi_b = jnp.full(qhi.shape, n, jnp.int32)
    for _ in range(steps):
        mid = (lo_b + hi_b) >> 1
        midc = jnp.minimum(mid, n - 1)
        kh = khi[midc]
        kl = klo[midc]
        less = (kh < qhi) | ((kh == qhi) & (kl < qlo))
        lo_b = jnp.where(less, mid + 1, lo_b)
        hi_b = jnp.where(less, hi_b, mid)
    idx = jnp.minimum(lo_b, n - 1)
    hit = (khi[idx] == qhi) & (klo[idx] == qlo) & (lo_b < n)
    return (jnp.where(hit, start[idx], 0).astype(jnp.int32),
            jnp.where(hit, cnt[idx], 0).astype(jnp.int32))


PAD_KHI = np.int32(0x7FFFFF7)  # sentinel key hi: > any real (< 2^24) key


def shard_index_arrays(keys: np.ndarray, start: np.ndarray,
                       cnt: np.ndarray, n_shards: int):
    """Range-partition the sorted CSR key arrays for a D-way mesh: pads
    the key count to a multiple of D with never-matching sentinels (cnt
    0), keeps `start` GLOBAL (values index the global pos array, so no
    per-shard rebasing is needed), and returns (khi, klo, start, cnt)
    ready for P('data') sharding plus the per-shard key ranges
    [lo, hi) for host-side pos distribution."""
    n = len(keys)
    npad = -(-max(n, n_shards) // n_shards) * n_shards
    khi, klo = split_keys(keys)
    khi_p = np.full(npad, PAD_KHI, np.int32)
    klo_p = np.zeros(npad, np.int32)
    start_p = np.zeros(npad, np.int64)
    cnt_p = np.zeros(npad, np.int32)
    khi_p[:n] = khi
    klo_p[:n] = klo
    start_p[:n] = start
    cnt_p[:n] = cnt
    per = npad // n_shards
    ranges = [(min(d * per, n), min((d + 1) * per, n))
              for d in range(n_shards)]
    return khi_p, klo_p, start_p, cnt_p, ranges


def sharded_probe_step(mesh: Mesh, axis: str = "data"):
    """Index-sharded probe (mm_idx_get over a range-partitioned key
    space): queries arrive row-sharded, all-gather to every chip, each
    chip binary-searches its key shard, and the (start, cnt) results —
    exactly one shard can hit per query — reduce-scatter back to the
    row shards. Both collectives ride the mesh axis (ICI).

    Returns jit(step)(khi, klo, start, cnt, qhi, qlo) -> (start, cnt)
    with khi/klo/start/cnt sharded P(axis) (use shard_index_arrays) and
    qhi/qlo sharded P(axis, None); B must be divisible by mesh size."""
    D = mesh.shape[axis]

    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(axis), P(axis), P(axis), P(axis),
                                 P(axis, None), P(axis, None)),
                       out_specs=(P(axis, None), P(axis, None)))
    def step(khi, klo, start, cnt, qhi, qlo):
        qh = jax.lax.all_gather(qhi, axis, axis=0, tiled=True)
        ql = jax.lax.all_gather(qlo, axis, axis=0, tiled=True)
        B, M = qh.shape
        s, c = lookup_index_device(khi, klo, start.astype(jnp.int32), cnt,
                                   qh.reshape(-1), ql.reshape(-1))
        s = s.reshape(B, M)
        c = c.reshape(B, M)
        s = jax.lax.psum_scatter(s, axis, scatter_dimension=0, tiled=True)
        c = jax.lax.psum_scatter(c, axis, scatter_dimension=0, tiled=True)
        return s, c

    del D
    return jax.jit(step)


def sharded_map_step(mesh: Mesh, *, max_dist_x: int, max_dist_y: int,
                     bw: int, iter_cap: int, gap_scale: float,
                     is_cdna: bool, n_segs: int, interpret: bool = False,
                     ext_params: Optional[dict] = None, axis: str = "data"):
    """The full device-side mapping step over a mesh: per-shard index probe
    of query minimizers (replicated index), bounded-lookback chaining of
    pre-built anchors and — when ext_params is given — the banded extd2
    extension kernel over the shard's alignment tasks. This is the unit
    the multi-chip dry-run compiles."""
    chain = _chain_auto(
        max_dist_x=max_dist_x, max_dist_y=max_dist_y,
        bw=bw, iter_cap=iter_cap, gap_scale=gap_scale, is_cdna=is_cdna,
        n_segs=n_segs, interpret=interpret)
    ext = None
    if ext_params is not None:
        from ..ops.ksw2_pallas import extd2_device
        ext = functools.partial(extd2_device, interpret=interpret,
                                **ext_params)

    dp = P(axis, None)
    dp1 = P(axis, None)
    rep = P(None)

    in_specs = [rep, rep, rep, rep, P(axis, None), P(axis, None),
                dp, dp, dp, dp, dp, dp1, dp1]
    out_specs = [P(axis, None), P(axis, None), dp, dp]
    if ext is not None:
        in_specs += [dp, dp, dp]
        out_specs += [P(None, axis, None), dp]

    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=tuple(in_specs), out_specs=tuple(out_specs))
    def step(khi, klo, kstart, kcnt, qhi, qlo, hi, lo, qi, span, sid, n, avg,
             *ext_args):
        hit_start, hit_cnt = lookup_index_device(khi, klo, kstart, kcnt, qhi, qlo)
        f, p = chain(hi, lo, qi, span, sid, n, avg)
        if ext is None:
            return hit_start, hit_cnt, f, p
        d, ez = ext(*ext_args)
        return hit_start, hit_cnt, f, p, d, ez

    return jax.jit(step)
