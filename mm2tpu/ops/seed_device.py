"""Device-side seeding: index probe + anchor construction + sort on TPU,
fused with the chaining kernel (SURVEY §7 step 3; reference semantics
map.c:90-247).

The host sketches each read (native mm2_sketch) and ships only the
minimizer arrays; the device probes the replicated CSR index in HBM,
expands hits into anchors, applies the occurrence filter, sorts by
position and runs the bounded-lookback chaining kernel — one dispatch
per size bucket, no anchor upload. The host reads back (anchors, f, p)
for backtrack and the downstream region pipeline, byte-identical to host
seeding.

Coverage contract (callers fall back to host seeding otherwise):
single-segment reads, no qname-dependent skip rules (NO_DIAG/NO_DUAL —
the ava presets), no FOR/REV_ONLY, occurrence cap = mid_occ. The
TANDEM flag is precomputed on host (it only depends on neighbouring
query minimizers); SELF never fires without the qname rules.

64-bit values are carried as split int32 pairs throughout (TPUs have no
int64): minimizer hashes as (hi, lo sign-flipped) like
parallel/mesh.split_keys, anchor x as (xhi sign-flipped for signed
compare, rpos), index position payloads as (rid, pos<<1|strand).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import lookup_index_device, split_keys

PAD_HI = np.int32(0x7FFFFFF0)  # padded-slot xhi: never equals a real one


def prepare_index_device(mi) -> dict:
    """Split the CSR index into device-ready int32 arrays (cached on mi)."""
    cached = getattr(mi, "_dev_idx", None)
    if cached is not None:
        return cached
    khi, klo = split_keys(mi.keys)
    pos = mi.pos
    d = dict(
        khi=jnp.asarray(khi),
        klo=jnp.asarray(klo),
        start=jnp.asarray(mi.start.astype(np.int32)),
        cnt=jnp.asarray(mi.cnt.astype(np.int32)),
        poshi=jnp.asarray((pos >> np.uint64(32)).astype(np.int64)
                          .astype(np.int32)),
        poslo=jnp.asarray((pos & np.uint64(0xFFFFFFFF)).astype(np.int64)
                          .astype(np.int32)),
    )
    mi._dev_idx = d
    return d


@functools.partial(jax.jit, static_argnames=("interpret",))
def probe_counts(khi, klo, start, cnt, qhi, qlo, interpret=False):
    """Raw occurrence count per query minimizer ((B, M) int32; 0 on miss
    or padding)."""
    del interpret
    B, M = qhi.shape
    s, c = lookup_index_device(khi, klo, start, cnt,
                               qhi.reshape(-1), qlo.reshape(-1))
    return c.reshape(B, M)


@functools.partial(jax.jit, static_argnames=(
    "N", "mid_occ", "max_dist_x", "max_dist_y", "bw", "iter_cap",
    "gap_scale", "interpret", "rows_per_program"))
def seed_chain_device(khi, klo, start, cnt, poshi, poslo,
                      qhi, qlo, qpos, qspan, qtandem, qlen, avg, *,
                      N: int, mid_occ: int, max_dist_x: int,
                      max_dist_y: int, bw: int, iter_cap: int,
                      gap_scale: float, interpret: bool = False,
                      rows_per_program: int = 1):
    """Fused probe -> expand -> sort -> chain for one (B, M) bucket.

    qhi/qlo: split minimizer hashes, (B, M), padded with a miss value;
    qpos: strand<<0|lastpos<<1 per minimizer; qspan; qtandem in {0,1};
    qlen: (B,) int32; avg: (B, 1) float32 avg_qspan computed on host
    (the f32 rounding of chain.c:48-49 must match the host path
    bit-for-bit). Returns (xhi_flip, xlo, yhi:int16, ylo, f, prel:int16,
    n) each (B, N) (n is (B,)): the sorted anchors + chaining scores.
    The readback is wire-packed (ops/chain_packed.py): yhi carries only
    span|tandem (< 2^11) so it ships as int16, and p ships as the
    relative-predecessor int16 (decode with chain_packed.unpack_prel) —
    20 B/anchor on the link instead of 24."""
    from .chain_packed import _p_rel
    from .chain_pallas_v2 import chain_scores_device_v2

    B, M = qhi.shape
    s, c = lookup_index_device(khi, klo, start, cnt,
                               qhi.reshape(-1), qlo.reshape(-1))
    s = s.reshape(B, M)
    c = c.reshape(B, M)
    keep = c < mid_occ
    c_eff = jnp.where(keep, c, 0)
    # per-read prefix sums -> slot ownership via searchsorted
    cum = jnp.cumsum(c_eff, axis=1)                       # (B, M)
    total = cum[:, -1]                                    # (B,)
    slots = jnp.arange(N, dtype=jnp.int32)[None, :]       # (1, N)
    m_of = jax.vmap(lambda cu: jnp.searchsorted(cu, slots[0],
                                                side="right"))(cum)
    m_of = jnp.minimum(m_of, M - 1)
    prev = jnp.where(m_of > 0,
                     jnp.take_along_axis(cum, jnp.maximum(m_of - 1, 0),
                                         axis=1), 0)
    k_of = slots - prev                                   # hit index
    valid = slots < total[:, None]

    g = lambda a: jnp.take_along_axis(a, m_of, axis=1)
    hit_idx = g(s) + k_of
    hit_idx = jnp.clip(hit_idx, 0, poshi.shape[0] - 1)
    rid = poshi[hit_idx]
    plo = poslo[hit_idx]
    r_pos = plo >> 1
    r_strand = plo & 1
    mpos = g(qpos)
    mspan = g(qspan)
    mtand = g(qtandem)
    q_strand = mpos & 1
    forward = r_strand == q_strand
    ql = qlen[:, None]
    y_pos = jnp.where(forward, mpos >> 1,
                      ql - ((mpos >> 1) + 1 - mspan) - 1)
    # x = strand<<63 | rid<<32 | rpos ; hi is sign-flipped so SIGNED int32
    # compare reproduces the unsigned uint64 order
    xhi = jnp.where(forward, rid, rid | np.int32(-0x80000000))
    xhi_flip = xhi ^ np.int32(-0x80000000)
    yhi = mspan | (mtand << 10)                           # TANDEM = y bit 42
    xhi_flip = jnp.where(valid, xhi_flip, PAD_HI)
    xlo = jnp.where(valid, r_pos, 0)
    ylo = jnp.where(valid, y_pos, 0)
    yhi = jnp.where(valid, yhi, 0)
    xhi_s, xlo_s, yhi_s, ylo_s = jax.lax.sort(
        (xhi_flip, xlo, yhi, ylo), dimension=1, num_keys=2,
        is_stable=True)
    # chaining (the kernel only tests hi for equality, so the flipped
    # encoding is transparent); v3 cross-task-lane kernel when the batch
    # shape allows, else v2
    del rows_per_program
    spans = yhi_s & 0xFF
    if B % 8 == 0:
        from .chain_pallas_v3 import chain_scores_device_v3
        f, p = chain_scores_device_v3(
            xhi_s, xlo_s, ylo_s, spans,
            total[:, None].astype(jnp.int32), avg,
            max_dist_x=max_dist_x, max_dist_y=max_dist_y, bw=bw,
            iter_cap=iter_cap, gap_scale=gap_scale, interpret=interpret,
            groups_per_program=next(
                g for g in (4, 2, 1) if B % (8 * g) == 0))
    else:
        f, p = chain_scores_device_v2(
            xhi_s, xlo_s, ylo_s, spans, jnp.zeros_like(xhi_s),
            total[:, None].astype(jnp.int32), avg,
            max_dist_x=max_dist_x, max_dist_y=max_dist_y, bw=bw,
            iter_cap=iter_cap, gap_scale=gap_scale, is_cdna=False,
            n_segs=1, interpret=interpret)
    return (xhi_s, xlo_s, yhi_s.astype(jnp.int16), ylo_s, f,
            _p_rel(p), total)


def anchors_from_device(xhi_s, xlo, yhi, ylo, n: int) -> np.ndarray:
    """Reassemble the (n, 2) uint64 anchor array from split readback."""
    xhi = (np.asarray(xhi_s[:n]).astype(np.int64) ^ -0x80000000) & 0xFFFFFFFF
    x = (xhi.astype(np.uint64) << np.uint64(32)) | \
        np.asarray(xlo[:n]).astype(np.uint64)
    y = (np.asarray(yhi[:n]).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(ylo[:n]).astype(np.uint64)
    a = np.empty((n, 2), np.uint64)
    a[:, 0] = x
    a[:, 1] = y
    return a


def split_query_minimizers(mv: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Host-side prep of one read's minimizer arrays for the device:
    (qhi, qlo, qpos, qspan, qtandem), matching seed.py's field extraction
    (map.c:90-123)."""
    miniers = mv[:, 0] >> np.uint64(8)
    qhi, qlo = split_keys(miniers)
    qpos = (mv[:, 1] & np.uint64(0xFFFFFFFF)).astype(np.int64) \
        .astype(np.int32)
    qspan = (mv[:, 0] & np.uint64(0xFF)).astype(np.int32)
    tandem = np.zeros(len(mv), np.int32)
    if len(mv) > 1:
        same_prev = miniers[1:] == miniers[:-1]
        tandem[1:] |= same_prev
        tandem[:-1] |= same_prev
    return qhi, qlo, qpos, qspan, tandem
