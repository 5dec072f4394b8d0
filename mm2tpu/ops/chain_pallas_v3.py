"""Pallas TPU anchor-chaining kernel, v3 (cross-task lanes).

Same contract as chain_pallas_v2 (bounded 1024-anchor lookback, exact
reference gates, ties -> largest j) with the tile layout re-mapped from
(8 anchors x 128 predecessors) of ONE task to **(8 tasks x 128
predecessors)**: all 8 tasks' DP frontiers advance in lockstep, one
anchor per task per step (docs/ROOFLINE.md 'kernel v3 design').

Why: v2 is latency-bound on its serial chunk chain (its max-plus closure
resolves intra-chunk dependencies). v3 has NO intra-step dependency —
each task retires one anchor per step whose predecessors are all from
strictly earlier steps — and each step's nine (8,128) candidate tiles
are mutually independent, so the VPU pipeline stays fed. The current
tile's f/p live in the loop carry (registers), not scratch, so steps
chain only through register selects. `groups_per_program` (the v2
rows_per_program idea) additionally interleaves whole 8-task groups.

Window structure per step i (local lane li in tile k of the current
1024-anchor block): the 1024-lookback window is exactly
  current-block tiles 0..k   (d = li - j)        [partially: tile k]
  previous-block tiles k..7  (d = li - j + 1024)  [partially: tile k]
— a STATIC set of 9 tiles per (k, lane) step because the outer loop over
k is a Python loop (the Mosaic program has 8 specialized sections), so
no dynamic tile indexing is needed anywhere; the d-range gates mask the
partial tiles' out-of-window lanes.

Layout: inputs/outputs are natural (B, N) arrays, block
(groups*8, WINDOW); no host-side permutation at all (v2 needs its slot
unpermute). Restriction: single-segment, non-cDNA scoring only (the
production uniseg fast path); callers fall back to v2 otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain_pallas import WINDOW, TILE
from .chain_pallas_v2 import NEG, _pair_key

R8 = 8  # tasks per group = sublane count


def _chain_kernel_v3(max_dist_x: int, max_dist_y: int, bw: int,
                     iter_cap: int, gap_scale: float, G: int,
                     n_ref, avg_ref, hi_ref, lo_ref, qi_ref, span_ref,
                     f_out, p_out,
                     phi_s, plo_s, pqi_s, pspan_s, fprev_s, fcur_s, pcur_s):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R8, TILE), 1)
    avg_cols = [jnp.concatenate(
        [jnp.full((1, 1), avg_ref[(b * G + g) * R8 + r, 0], jnp.float32)
         for r in range(R8)], axis=0) for g in range(G)]   # G x (8,1)

    @pl.when(t == 0)
    def _init():
        phi_s[:] = jnp.full((G * R8, WINDOW), -0x7FFFFFF0, jnp.int32)
        plo_s[:] = jnp.zeros((G * R8, WINDOW), jnp.int32)
        pqi_s[:] = jnp.zeros((G * R8, WINDOW), jnp.int32)
        pspan_s[:] = jnp.zeros((G * R8, WINDOW), jnp.int32)
        fprev_s[:] = jnp.zeros((G * R8, WINDOW), jnp.int32)

    zt = jnp.zeros((R8, TILE), jnp.int32)

    for k in range(WINDOW // TILE):           # static: 8 program sections
        ksl = slice(k * TILE, (k + 1) * TILE)

        def step(g, li2, f_tile, p_tile, k=k, ksl=ksl):
            gs = slice(g * R8, (g + 1) * R8)
            li = k * TILE + li2
            # extract this step's 8 anchors: lane li2 of current tile k
            # (sum-extraction, not max: a reverse-strand hi packs the
            # strand into the int32 sign bit, below any mask sentinel)
            at = lane == li2

            def sel(tile):
                return jnp.sum(jnp.where(at, tile, zt), axis=1,
                               keepdims=True)            # (8,1)

            a_hi = sel(hi_ref[gs, ksl])
            a_lo = sel(lo_ref[gs, ksl])
            a_qi = sel(qi_ref[gs, ksl])
            a_span = sel(span_ref[gs, ksl])

            key_acc = jnp.full((R8, TILE), NEG, jnp.int32)
            # current-block tiles 0..k  (predecessor j = kk*TILE + lane)
            for kk in range(k + 1):
                sl2 = slice(kk * TILE, (kk + 1) * TILE)
                d = (li - kk * TILE) - lane
                f_src = f_tile if kk == k else fcur_s[gs, sl2]
                key_c, _ = _pair_key(
                    a_lo - lo_ref[gs, sl2], a_qi - qi_ref[gs, sl2], True,
                    hi_ref[gs, sl2] == a_hi, a_span, f_src, d,
                    avg_cols[g], max_dist_x, max_dist_y, bw, iter_cap,
                    gap_scale, False, 1, need_sc=False)
                key_acc = jnp.maximum(key_acc, key_c)
            # previous-block tiles k..7 (d shifted by +WINDOW)
            for kk in range(k, WINDOW // TILE):
                sl2 = slice(kk * TILE, (kk + 1) * TILE)
                d = (li + WINDOW - kk * TILE) - lane
                key_c, _ = _pair_key(
                    a_lo - plo_s[gs, sl2], a_qi - pqi_s[gs, sl2], True,
                    phi_s[gs, sl2] == a_hi, a_span, fprev_s[gs, sl2], d,
                    avg_cols[g], max_dist_x, max_dist_y, bw, iter_cap,
                    gap_scale, False, 1, need_sc=False)
                key_acc = jnp.maximum(key_acc, key_c)

            best_key = jnp.max(key_acc, axis=1, keepdims=True)   # (8,1)
            best_sc = best_key >> 10
            best_d = WINDOW - (best_key & (WINDOW - 1))
            better = best_sc > a_span
            i_abs = t * WINDOW + li
            p_col = jnp.where(better, i_abs - best_d, -1)
            f_col = jnp.where(better, best_sc, a_span)

            return (jnp.where(at, f_col, f_tile),
                    jnp.where(at, p_col, p_tile))

        def step2(u2, carry):
            for u in range(2):
                carry = tuple(
                    x for g in range(G)
                    for x in step(g, 2 * u2 + u, carry[2 * g],
                                  carry[2 * g + 1]))
            return carry

        init = tuple(
            x for _ in range(G)
            for x in (jnp.zeros((R8, TILE), jnp.int32),
                      jnp.full((R8, TILE), -1, jnp.int32)))
        carry = jax.lax.fori_loop(0, TILE // 2, step2, init)
        for g in range(G):
            gs = slice(g * R8, (g + 1) * R8)
            fcur_s[gs, ksl] = carry[2 * g]
            pcur_s[gs, ksl] = carry[2 * g + 1]

    # flush outputs; rotate current block into the 'previous' scratches
    f_out[:, :] = fcur_s[:]
    p_out[:, :] = pcur_s[:]

    @pl.when(t < nt - 1)
    def _rotate():
        phi_s[:] = hi_ref[:, :]
        plo_s[:] = lo_ref[:, :]
        pqi_s[:] = qi_ref[:, :]
        pspan_s[:] = span_ref[:, :]
        fprev_s[:] = fcur_s[:]


@functools.partial(jax.jit, static_argnames=(
    "max_dist_x", "max_dist_y", "bw", "iter_cap", "gap_scale",
    "interpret", "groups_per_program"))
def chain_scores_device_v3(hi, lo, qi, span, n, avg, *, max_dist_x: int,
                           max_dist_y: int, bw: int, iter_cap: int,
                           gap_scale: float, interpret: bool = False,
                           groups_per_program: int = 1):
    """Batched bounded-lookback chaining scores, v3 kernel (uniseg).
    Inputs (B, N) int32 with B % (8*groups) == 0; returns (f, p) (B, N)
    int32."""
    B, N = hi.shape
    G = groups_per_program
    assert N % WINDOW == 0 and B % (R8 * G) == 0
    kern = functools.partial(_chain_kernel_v3, max_dist_x, max_dist_y, bw,
                             min(iter_cap, WINDOW), gap_scale, G)
    nt = N // WINDOW
    per_read_scalar = pl.BlockSpec((B, 1), lambda b, t: (0, 0),
                                   memory_space=pltpu.SMEM)
    blk = pl.BlockSpec((G * R8, WINDOW), lambda b, t: (b, t))
    f, p = pl.pallas_call(
        kern,
        grid=(B // (R8 * G), nt),
        in_specs=[per_read_scalar, per_read_scalar] + [blk] * 4,
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((G * R8, WINDOW), jnp.int32)] * 7,
        interpret=interpret,
    )(n, avg, hi, lo, qi, span)
    return f, p
