"""Pallas TPU kernel for the ksw2 extd2 extension DP (dual affine gaps).

TPU-native re-expression of ksw_extd2_sse (ksw2_extd2_sse.c): B alignment
tasks run as one batch; the anti-diagonal wavefront r is the (sequential)
Pallas grid dimension; every per-row quantity is a (B, Tpad) vector op on
the VPU. The kernel reproduces the SSE build's observable semantics
exactly (the same quirks ops/ksw2_ref.py documents), so its outputs are
bit-identical to the host port and therefore to minimap2:

  - 16-lane-aligned band [st, en] with stale cells persisting outside the
    fresh region (full-width masked updates give this for free),
  - the score row's 16-wide block stores from st0 (fresh-mask
    [st0, st0 + 16*ceil((en0-st0+1)/16))),
  - boundary conditions incl. the long_thres/long_diff first-column decay
    (ksw2_extd2_sse.c:186-198),
  - the exact-max scan's 4-lane tie-breaking (seed at en0 wins ties, then
    SSE lanes in order with first-occurrence-per-lane, then the scalar
    tail) via a value+priority double reduction,
  - the approximate-max H0 diagonal walk and both Z-drop variants.

Per-task query windows (qr[qlen-1-r+t], i.e. query[r-t]) advance by one
element per row, so they are kept as an in-VMEM shift register — the same
trick as the reference FPGA kernel's 1025-deep anchor shift register
(device/minimap2_opencl.cl:30-32): each row shifts the window right and
inserts query[r] at position 0 (a masked-reduction gather per row).

Direction rows stream to HBM through the output BlockSpec; traceback is
O(|cigar|) on the host (ksw2.h:119-151 semantics via ops/ksw2_ref.py).

The reference offloads chaining to an FPGA and leaves ksw2 on SSE cores;
here both superlinear DPs live on the TPU. Large/rare tasks fall back to
the host ports — the same heterogeneous-routing idea as the reference's
HW/SW split (chain.c:80-111) with static size bucketing as the cost model.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ksw2_ref import (
    KSW_EZ_APPROX_DROP,
    KSW_EZ_APPROX_MAX,
    KSW_EZ_EXTZ_ONLY,
    KSW_EZ_REV_CIGAR,
    KSW_EZ_RIGHT,
    KSW_NEG_INF,
    ExtzResult,
    _push_cigar,
)

NEG32 = -0x7FFFFFFF
PADC = 128  # static front pad so the t-1 shifted reads are static slices

# regs columns
R_ZDROP, R_MAX, R_MAXQ, R_MAXT, R_MQE, R_MQET, R_MTE, R_MTEQ, \
    R_SCORE, R_H0, R_LAST, R_PST, R_PEN, R_BREAK = range(14)


def _rset(rg, k, val):
    """regs row with column k replaced by val (B,1). jnp's
    ``.at[:, k:k+1].set`` lowers through XLA scatter, which the Mosaic
    TPU backend cannot lower inside a kernel (interpret mode hides it);
    a lane-mask select is a single VPU op on the (B, 128) register row."""
    rcol = jax.lax.broadcasted_iota(jnp.int32, rg.shape, 1)
    return jnp.where(rcol == k, val, rg)


def _gather_col(arr, idx, valid=None, col=None):
    """arr[b, idx[b]] as (B, 1) via a masked reduction (idx (B,1) int32).
    col: global column ids per cell when `arr` is a window of a wider
    array (idx is then matched against global positions)."""
    if col is None:
        col = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    m = col == idx
    if valid is not None:
        m = m & valid
    return jnp.sum(jnp.where(m, arr, 0), axis=1, keepdims=True)


def _extd2_kernel(q: int, e: int, q2: int, e2: int, zdrop: int,
                  sc_mch: int, sc_mis: int, sc_N: int, w_static: int,
                  long_thres: int, long_diff: int, right: bool, approx: bool,
                  approx_drop: bool, Tpad: int, Rmax: int, rpp: int,
                  Wwin: int,
                  lens_ref, tsf_ref, qcol_ref, d_out, ez_out,
                  u_s, v_s, x_s, y_s, x2_s, y2_s, H_s, s_s, qrw_s, regs):
    g = pl.program_id(0)
    B = lens_ref.shape[0]
    qe = q + e
    W = Wwin                    # static band-window width (== Tpad => full)
    windowed = W < Tpad

    @pl.when(g == 0)
    def _init():
        qrw_s[:] = jnp.zeros(qrw_s.shape, jnp.int32)
        u_s[:] = jnp.full(u_s.shape, -qe, jnp.int32)
        v_s[:] = jnp.full(v_s.shape, -qe, jnp.int32)
        x_s[:] = jnp.full(x_s.shape, -qe, jnp.int32)
        y_s[:] = jnp.full(y_s.shape, -qe, jnp.int32)
        x2_s[:] = jnp.full(x2_s.shape, -q2 - e2, jnp.int32)
        y2_s[:] = jnp.full(y2_s.shape, -q2 - e2, jnp.int32)
        H_s[:] = jnp.full(H_s.shape, KSW_NEG_INF, jnp.int32)
        s_s[:] = jnp.zeros(s_s.shape, jnp.int32)
        rcol = jax.lax.broadcasted_iota(jnp.int32, regs.shape, 1)
        init = jnp.zeros(regs.shape, jnp.int32)
        for k in (R_MAXQ, R_MAXT, R_MQET, R_MTEQ, R_PST, R_PEN):
            init = jnp.where(rcol == k, -1, init)
        for k in (R_MQE, R_MTE, R_SCORE):
            init = jnp.where(rcol == k, KSW_NEG_INF, init)
        regs[:] = init

    # Band window (per PROGRAM, from its first row r0 = g*rpp): every
    # task's 16-aligned band [st, en] of every row in the program lies
    # inside the 128-aligned global window [win, win+W) because
    # st >= max(0,(r-w+1)>>1) - 15 and en <= ((r+w)>>1) + 15 with
    # (hi-lo) <= w, en grows by <= ceil((rpp-1)/2) over the program's
    # rows, and lo only grows with r — so W = 128*ceil((w+176+rpp//2+1)
    # /128) suffices (the -32 guard plus <=127 align loss on the left,
    # +16 blocks right, +rpp//2+1 right growth; extd2_device sets Wwin).
    # Cells outside the window keep their stale values — exactly the
    # reference's stale-cell band semantics (ksw2_extd2_sse.c:115-124).
    if windowed:
        lo0_p = jnp.maximum((g * rpp - w_static + 1) >> 1, 0)
        win = jnp.clip((lo0_p - 32) // 128 * 128, 0, Tpad - W)
        win = pl.multiple_of(win, 128)
    else:
        win = 0
    col = win + jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    dsw = pl.ds(win, W)          # [win, win+W) in the W-wide arrays
    dsp = pl.ds(PADC + win, W)   # the window in the PADC-padded arrays
    dsl = pl.ds(win, W + 128)    # [win-128, win+W) in the padded arrays

    # Value-carried row fusion: the rpp rows of one program chain their
    # u/v/x/y/x2/y2/qrw/s/H/regs state as VALUES (loaded from scratch
    # once per program, stored back once), so the sequential per-row VMEM
    # round trip — the latency bound of the windowed kernel
    # (docs/ROOFLINE.md) — is paid once per rpp rows. The 128-col prefix
    # [win-128, win) feeds the shifted (t-1) reads and is never written:
    # fresh updates only land at cols >= st >= win (coverage proof above).
    def _row(r, slot, cu, cv, cx, cy, cx2, cy2, cq, cs, cH, rg):
        qlen = lens_ref[:, 0:1]
        tlen = lens_ref[:, 1:2]
        wl = jnp.full((B, 1), w_static, jnp.int32) if w_static >= 0 \
            else jnp.maximum(qlen, tlen)
        wr = wl

        brk = rg[:, R_BREAK:R_BREAK + 1]
        alive0 = (r < qlen + tlen - 1) & (brk == 0)

        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - wr + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + wl) >> 1)
        band_brk = alive0 & (st0 > en0)
        alive = alive0 & (st0 <= en0)
        st = (st0 // 16) * 16
        en = ((en0 + 16) // 16) * 16 - 1

        prev_st = rg[:, R_PST:R_PST + 1]
        prev_en = rg[:, R_PEN:R_PEN + 1]
        covered = (st > 0) & (prev_st <= st - 1) & (st - 1 <= prev_en)
        # first-column boundary decay (ksw2_extd2_sse.c:190,194)
        row0_bnd = jnp.where(
            jnp.full((B, 1), r, jnp.int32) == 0, -qe,
            jnp.where(jnp.full((B, 1), r, jnp.int32) < long_thres, -e,
                      jnp.where(jnp.full((B, 1), r, jnp.int32) == long_thres,
                                long_diff, -e2)))
        v1_def = jnp.where(st > 0, -qe, row0_bnd)

        # y[r]/y2[r]/u[r] boundary writes when the band reaches column r
        bnd_m = (col == r) & (en >= r) & alive
        y_c = jnp.where(bnd_m, -qe, cy[:, 128:])
        y2_c = jnp.where(bnd_m, -q2 - e2, cy2[:, 128:])
        u_c = jnp.where(bnd_m, row0_bnd, cu[:, 128:])

        # query shift register (windowed): the value entering at the
        # window's left edge is query[r - win] (== query[r] at col 0 when
        # win == 0 — the original insertion); positions the window has
        # passed are exactly those the band never revisits
        r_ins = jnp.int32(r) - win
        e_al = pl.multiple_of(r_ins // 128 * 128, 128)
        icol = e_al + jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        q_ins = jnp.sum(jnp.where(icol == r_ins, qcol_ref[:, pl.ds(e_al, 128)],
                                  0), axis=1, keepdims=True)
        qrw = jnp.where(col == win, q_ins, cq[:, 127:127 + W])
        cq = jnp.concatenate([cq[:, :128], qrw], axis=1)

        # score row: fresh 16-blocks from st0 (stale cells persist)
        sq = tsf_ref[:, dsw]
        wild = (sq == 4) | (qrw == 4)
        s_new = jnp.where(wild, sc_N, jnp.where(sq == qrw, sc_mch, sc_mis))
        fresh = (col >= st0) & (col < st0 + ((en0 - st0) // 16) * 16 + 16) & alive
        s_row = jnp.where(fresh, s_new, cs)
        cs = s_row

        # shifted reads (t-1) with boundary insertion at col st
        at_st = col == st
        x_sh = cx[:, 127:127 + W]
        v_sh = cv[:, 127:127 + W]
        x2_sh = cx2[:, 127:127 + W]
        xt1 = jnp.where(at_st & ~covered, -qe, x_sh)
        x2t1 = jnp.where(at_st & ~covered, -q2 - e2, x2_sh)
        vt1 = jnp.where(at_st, jnp.where(covered, v_sh, v1_def), v_sh)

        z = s_row
        a = xt1 + vt1
        b = y_c + u_c
        a2 = x2t1 + vt1
        b2 = y2_c + u_c
        if not right:  # gap left-alignment
            d = jnp.where(a > z, 1, 0)
            z = jnp.maximum(z, a)
            d = jnp.where(b > z, 2, d)
            z = jnp.maximum(z, b)
            d = jnp.where(a2 > z, 3, d)
            z = jnp.maximum(z, a2)
            d = jnp.where(b2 > z, 4, d)
            z = jnp.maximum(z, b2)
        else:  # gap right-alignment
            d = jnp.where(z > a, 0, 1)
            z = jnp.maximum(z, a)
            d = jnp.where(z > b, d, 2)
            z = jnp.maximum(z, b)
            d = jnp.where(z > a2, d, 3)
            z = jnp.maximum(z, a2)
            d = jnp.where(z > b2, d, 4)
            z = jnp.maximum(z, b2)
        z = jnp.minimum(z, sc_mch)
        u_new = z - vt1
        v_new = z - u_c
        t1 = z - q
        a = a - t1
        b = b - t1
        t2 = z - q2
        a2 = a2 - t2
        b2 = b2 - t2
        if not right:
            ga, gb, ga2, gb2 = a > 0, b > 0, a2 > 0, b2 > 0
        else:
            ga, gb, ga2, gb2 = a >= 0, b >= 0, a2 >= 0, b2 >= 0
        x_new = jnp.where(ga, a, 0) - qe
        y_new = jnp.where(gb, b, 0) - qe
        x2_new = jnp.where(ga2, a2, 0) - (q2 + e2)
        y2_new = jnp.where(gb2, b2, 0) - (q2 + e2)
        d = (d | jnp.where(ga, 0x08, 0) | jnp.where(gb, 0x10, 0)
             | jnp.where(ga2, 0x20, 0) | jnp.where(gb2, 0x40, 0))

        bm = (col >= st) & (col <= en) & alive
        d8 = jnp.where(bm, d, 0).astype(jnp.int8)
        if windowed:
            d_out[slot] = jnp.zeros((B, Tpad), jnp.int8)
            d_out[slot, :, dsw] = d8
        else:
            d_out[slot] = d8
        u_w = jnp.where(bm, u_new, u_c)
        v_w = jnp.where(bm, v_new, cv[:, 128:])
        x_w = jnp.where(bm, x_new, cx[:, 128:])
        y_w = jnp.where(bm, y_new, y_c)
        x2_w = jnp.where(bm, x2_new, cx2[:, 128:])
        y2_w = jnp.where(bm, y2_new, y2_c)
        cu = jnp.concatenate([cu[:, :128], u_w], axis=1)
        cv = jnp.concatenate([cv[:, :128], v_w], axis=1)
        cx = jnp.concatenate([cx[:, :128], x_w], axis=1)
        cy = jnp.concatenate([cy[:, :128], y_w], axis=1)
        cx2 = jnp.concatenate([cx2[:, :128], x2_w], axis=1)
        cy2 = jnp.concatenate([cy2[:, :128], y2_w], axis=1)

        is_r0 = r == 0
        r_b = jnp.full((B, 1), r, jnp.int32)
        if not approx:
            # exact max with the 32-bit H row (ksw2_extd2_sse.c:326-358)
            H_old = cH
            upd = (col >= st0) & (col < en0) & alive & (r > 0)
            H_new = jnp.where(upd, H_old + v_new, H_old)
            H_pm1 = _gather_col(H_old, en0 - 1, col=col)
            u_en0 = _gather_col(u_new, en0, col=col)
            v_en0 = _gather_col(v_new, en0, col=col)
            H_en0_old = _gather_col(H_old, en0, col=col)
            H_en0 = jnp.where(en0 > 0, H_pm1 + u_en0, H_en0_old + v_en0)
            if True:  # r == 0 special case: H[0] = v[0] - qe
                v0 = _gather_col(v_new, jnp.zeros((B, 1), jnp.int32),
                                 col=col)
                H_en0 = jnp.where(is_r0, v0 - qe, H_en0)
            H_new = jnp.where((col == en0) & alive, H_en0, H_new)
            cH = H_new

            # max scan with SSE tie-breaking: value first, then priority
            # (seed at en0 > 4-lane block by (lane, row-in-lane) > scalar tail)
            valid = (col >= st0) & (col <= en0) & alive
            en1 = st0 + ((en0 - st0) // 4) * 4
            rel = col - st0
            lane = rel & 3
            rowl = rel >> 2
            pri = jnp.where(
                col == en0, 3 << 26,
                jnp.where(col < en1, (2 << 26) - (lane << 22) - rowl,
                          (1 << 26) - col))
            M = jnp.max(jnp.where(valid, H_new, NEG32), axis=1, keepdims=True)
            is_m = valid & (H_new == M)
            P = jnp.max(jnp.where(is_m, pri, NEG32), axis=1, keepdims=True)
            max_t = jnp.sum(jnp.where(is_m & (pri == P), col, 0),
                            axis=1, keepdims=True)
            max_t = jnp.where(is_r0, 0, max_t)
            max_H = jnp.where(is_r0, H_en0, M)

            mte = rg[:, R_MTE:R_MTE + 1]
            mte_c = alive & (en0 == tlen - 1) & (H_en0 > mte)
            rg = _rset(rg, R_MTE, jnp.where(mte_c, H_en0, mte))
            rg = _rset(rg, R_MTEQ, jnp.where(
                mte_c, r_b - en, rg[:, R_MTEQ:R_MTEQ + 1]))
            H_st0 = _gather_col(H_new, st0, col=col)
            mqe = rg[:, R_MQE:R_MQE + 1]
            mqe_c = alive & (r_b - st0 == qlen - 1) & (H_st0 > mqe)
            rg = _rset(rg, R_MQE, jnp.where(mqe_c, H_st0, mqe))
            rg = _rset(rg, R_MQET, jnp.where(
                mqe_c, st0, rg[:, R_MQET:R_MQET + 1]))
            zH, zt, do_drop = max_H, max_t, True
        else:
            # approximate max: walk H0 along the main diagonal (the walk
            # index `last` stays in [0, en0+1] ⊆ the window — from inside
            # the band it can only advance via c2 which caps at en0, and
            # from below it advances 1/row until it re-enters)
            last = rg[:, R_LAST:R_LAST + 1]
            H0 = rg[:, R_H0:R_H0 + 1]
            u_full = u_w
            v_full = v_w
            c1 = (last >= st0) & (last <= en0)
            c2 = (last + 1 >= st0) & (last + 1 <= en0)
            d0 = _gather_col(v_full, last, col=col)
            d1 = _gather_col(u_full, last + 1, col=col)
            take1 = (c1 & c2 & (d1 >= d0)) | ~c1
            last_n = jnp.where(take1, last + 1, last)
            u_at = _gather_col(u_full, last_n, col=col)
            inc = jnp.where(c1 & c2, jnp.maximum(d0, d1),
                            jnp.where(c1, d0, u_at))
            v0 = _gather_col(v_full, jnp.zeros((B, 1), jnp.int32), col=col)
            H0_n = jnp.where(is_r0, v0 - qe, H0 + inc)
            last_n = jnp.where(is_r0, 0, last_n)
            rg = _rset(rg, R_H0, jnp.where(alive, H0_n, H0))
            rg = _rset(rg, R_LAST, 
                jnp.where(alive, last_n, last))
            zH, zt, do_drop = H0_n, last_n, approx_drop

        # ksw_apply_zdrop (ksw2.h:160-176), e2 as the drop slope
        ez_max = rg[:, R_MAX:R_MAX + 1]
        ez_max_t = rg[:, R_MAXT:R_MAXT + 1]
        ez_max_q = rg[:, R_MAXQ:R_MAXQ + 1]
        upd_max = alive & (zH > ez_max) & (True if do_drop or not approx
                                           else False)
        if do_drop:
            chk = alive & ~upd_max & (zt >= ez_max_t) & (r_b - zt >= ez_max_q)
            tl = zt - ez_max_t
            ql = (r_b - zt) - ez_max_q
            ldiff = jnp.abs(tl - ql)
            dropped = chk & (ez_max - zH > zdrop + ldiff * e2) \
                if zdrop >= 0 else jnp.zeros_like(chk)
            rg = _rset(rg, R_MAX, jnp.where(upd_max, zH, ez_max))
            rg = _rset(rg, R_MAXT, 
                jnp.where(upd_max, zt, ez_max_t))
            rg = _rset(rg, R_MAXQ, 
                jnp.where(upd_max, r_b - zt, ez_max_q))
            rg = _rset(rg, R_ZDROP, jnp.where(
                dropped, 1, rg[:, R_ZDROP:R_ZDROP + 1]))
        else:
            dropped = jnp.zeros((B, 1), jnp.bool_)

        sc_c = alive & ~dropped & (r_b == qlen + tlen - 2) & (en0 == tlen - 1)
        rg = _rset(rg, R_SCORE, jnp.where(
            sc_c, zH if approx else _gather_col(H_new, tlen - 1, col=col),
            rg[:, R_SCORE:R_SCORE + 1]))

        rg = _rset(rg, R_ZDROP, jnp.where(
            band_brk, 1, rg[:, R_ZDROP:R_ZDROP + 1]))
        rg = _rset(rg, R_BREAK, jnp.where(
            band_brk | dropped, 1, rg[:, R_BREAK:R_BREAK + 1]))
        rg = _rset(rg, R_PST, jnp.where(alive, st, prev_st))
        rg = _rset(rg, R_PEN, jnp.where(alive, en, prev_en))
        return cu, cv, cx, cy, cx2, cy2, cq, cs, cH, rg

    carry = (u_s[:, dsl], v_s[:, dsl], x_s[:, dsl], y_s[:, dsl],
             x2_s[:, dsl], y2_s[:, dsl], qrw_s[:, dsl],
             s_s[:, dsw], H_s[:, dsw], regs[:])
    for _u in range(rpp):
        carry = _row(g * rpp + _u, _u, *carry)
    cu, cv, cx, cy, cx2, cy2, cq, cs, cH, rg = carry
    u_s[:, dsp] = cu[:, 128:]
    v_s[:, dsp] = cv[:, 128:]
    x_s[:, dsp] = cx[:, 128:]
    y_s[:, dsp] = cy[:, 128:]
    x2_s[:, dsp] = cx2[:, 128:]
    y2_s[:, dsp] = cy2[:, 128:]
    qrw_s[:, dsp] = cq[:, 128:]
    s_s[:, dsw] = cs
    if not approx:
        H_s[:, dsw] = cH
    regs[:] = rg

    @pl.when(g == Rmax // rpp - 1)
    def _flush():
        ez_out[:, 0:128] = regs[:]


@functools.partial(jax.jit, static_argnames=(
    "q", "e", "q2", "e2", "zdrop", "sc_mch", "sc_mis", "sc_N", "w",
    "right", "approx", "approx_drop", "Rmax", "rpp", "interpret"))
def extd2_device(lens, tsf, qcol, *, q: int, e: int, q2: int, e2: int,
                 zdrop: int, sc_mch: int, sc_mis: int, sc_N: int, w: int,
                 right: bool, approx: bool, approx_drop: bool, Rmax: int,
                 rpp: int = 1, interpret: bool = False):
    """Batched extd2 rows. lens (B,2)=[qlen,tlen]; tsf (B,Tpad) sf image;
    qcol (B,Rmax) queries zero-padded past qlen.
    rpp = wavefront rows computed per Pallas program instance (Rmax must
    be a multiple): the rows chain their DP state as VALUES within one
    program (value-carried row fusion), so the per-program grid/prologue
    overhead AND the sequential VMEM scratch round trip — the latency
    bounds for thin bands (docs/ROOFLINE.md) — are paid once per rpp
    rows. Returns (d_rows (Rmax,B,Tpad) int8, ez (B,128) int32)."""
    # base codes fit uint8: callers ship 1 B/base and the cast to the
    # kernel's int32 lanes runs device-side, after the wire
    lens = lens.astype(jnp.int32)
    tsf = tsf.astype(jnp.int32)
    qcol = qcol.astype(jnp.int32)
    B, Tpad = tsf.shape
    assert Rmax % rpp == 0 and rpp <= 128
    # the kernel's aligned-slice query gather reads 128-wide blocks
    qpad = -(-max(qcol.shape[1], Rmax) // 128) * 128
    if qcol.shape[1] != qpad:
        qcol = jnp.pad(qcol, ((0, 0), (0, qpad - qcol.shape[1])))
    if q2 + e2 < q + e:  # reference swaps so (q,e) is the short-gap pair
        q, q2, e, e2 = q2, q, e2, e
    long_thres = (q2 - q) // (e - e2) - 1 if e != e2 else 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2
    # static band-window width (see the coverage proof in _extd2_kernel);
    # W == Tpad disables windowing (unbanded, or the band spans the row);
    # +rpp//2+1 covers the band's right-edge growth over a fused program
    Wwin = Tpad if w < 0 else min(
        Tpad, -(-(w + 176 + rpp // 2 + 1) // 128) * 128)
    kern = functools.partial(
        _extd2_kernel, q, e, q2, e2, zdrop, sc_mch, sc_mis, sc_N, w,
        long_thres, long_diff, right, approx, approx_drop, Tpad, Rmax, rpp,
        Wwin)
    full = pl.BlockSpec((B, Tpad), lambda r: (0, 0), memory_space=pltpu.VMEM)
    d, ez = pl.pallas_call(
        kern,
        grid=(Rmax // rpp,),
        in_specs=[
            pl.BlockSpec((B, 2), lambda r: (0, 0), memory_space=pltpu.VMEM),
            full,
            pl.BlockSpec((B, qcol.shape[1]), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rpp, B, Tpad), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 128), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rmax, B, Tpad), jnp.int8),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((B, PADC + Tpad), jnp.int32)] * 6
        + [pltpu.VMEM((B, Tpad), jnp.int32)] * 2
        + [pltpu.VMEM((B, PADC + Tpad), jnp.int32)]
        + [pltpu.VMEM((B, 128), jnp.int32)],
        interpret=interpret,
    )(lens, tsf, qcol)
    return d, ez


def _backtrack_abs(rows, off, off_end, i0, j0, rev_cigar,
                   min_intron_len: int = 0) -> List[int]:
    """ksw_backtrack on absolute-indexed full-width direction rows."""
    cigar: List[int] = []
    i, j, state = i0, j0, 0
    while i >= 0 and j >= 0:
        r = i + j
        force_state = -1
        if i < off[r]:
            force_state = 2
        if i > off_end[r]:
            force_state = 1
        tmp = int(rows[r][i]) if force_state < 0 else 0
        if state == 0:
            state = tmp & 7
        elif not (tmp >> (state + 2) & 1):
            state = 0
        if state == 0:
            state = tmp & 7
        if force_state >= 0:
            state = force_state
        if state == 0:
            _push_cigar(cigar, 0, 1)
            i -= 1
            j -= 1
        elif state == 1 or (state == 3 and min_intron_len <= 0):
            _push_cigar(cigar, 2, 1)
            i -= 1
        elif state == 3 and min_intron_len > 0:
            _push_cigar(cigar, 3, 1)
            i -= 1
        else:
            _push_cigar(cigar, 1, 1)
            j -= 1
    if i >= 0:
        _push_cigar(cigar, 3 if (min_intron_len > 0 and
                                 i >= min_intron_len) else 2, i + 1)
    if j >= 0:
        _push_cigar(cigar, 1, j + 1)
    if not rev_cigar:
        cigar.reverse()
    return cigar


# wavefront rows per Pallas program instance (extd2_device rpp).
# Round-5 steady-state on-chip sweep with the scoreboard harness
# (scripts/sweep_ksw2_rpp.py: chained-jit, (t3-t1)/2 per-invocation,
# B=64, L=2048, w=751): rpp 1/2/4/8/16 = 11.7/11.6/10.5/10.7/9.3
# Gcells/s — rpp=1 is best AND compiles ~8x faster. The round-3 manual
# reading of 20.3 at rpp=8 does not reproduce under steady-state timing
# and is withdrawn (docs/ROOFLINE.md round-5 reconciliation).
ROWS_PER_PROGRAM = 1


def rows_per_program(interpret: bool) -> int:
    """rpp is a pure perf knob (bit-identical across values, pinned by the
    on-chip sweep + differentials). In interpret mode the kernel body is
    traced rpp times per program, making CPU-backend XLA programs ~rpp x
    larger — minutes of compile per shape on a 1-core box — for zero
    benefit, so interpret runs always use rpp=1."""
    return 1 if interpret else ROWS_PER_PROGRAM

# 1.5x-geometric row-count ladder: coarse enough that a whole mapping run
# compiles only a handful of (B, Tpad, Rmax) programs (a cold XLA cache
# paid dozens of ad-hoc Mosaic compiles before), fine enough that padded
# rows waste < 33% (padding rows/tasks are masked inert, not wrong)
_ROW_LADDER = sorted({128 * 2 ** k for k in range(14)}
                     | {192 * 2 ** k for k in range(14)})


def quantize_shapes(B: int, t_need: int, r_need: int):
    """Quantized (Bp, Tpad, Rmax) for a fill batch: Bp/Tpad to powers of
    two, Rmax to the 1.5x ladder (all multiples of ROWS_PER_PROGRAM and
    the 16-lane block)."""
    Bp = 8
    while Bp < B:
        Bp *= 2
    Tpad = 128
    while Tpad < t_need:
        Tpad *= 2
    Rmax = next(v for v in _ROW_LADDER if v >= r_need)
    return Bp, Tpad, Rmax


def band_offsets(qlen: int, tlen: int, w: int):
    """Host replica of the per-row band [st0, en0] -> 16-aligned [st, en]
    (pure function of the geometry; the kernel needn't emit it)."""
    if w < 0:
        w = max(qlen, tlen)
    R = qlen + tlen - 1
    r = np.arange(R, dtype=np.int64)
    st0 = np.maximum(np.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
    en0 = np.minimum(np.minimum(tlen - 1, r), (r + w) >> 1)
    st = st0 // 16 * 16
    en = (en0 + 16) // 16 * 16 - 1
    return st, en, st0, en0


def _sf_image(t8: np.ndarray, Tpad: int, qr: np.ndarray) -> np.ndarray:
    """target + zero pad to the C tpad, then the qr bytes the SIMD loadu
    runs into (ops/ksw2_ref.py sf_read semantics), padded to Tpad."""
    tlen = len(t8)
    tpad_c = (tlen + 15) // 16 * 16
    out = np.zeros(Tpad, np.int32)
    out[:tlen] = t8
    if tpad_c < Tpad:
        n = min(Tpad - tpad_c, len(qr))
        out[tpad_c:tpad_c + n] = qr[:n]
    return out


@functools.partial(jax.jit, static_argnames=("w", "Smax"))
def trace_device(d, lens, i0, j0, *, w: int, Smax: int):
    """ksw_backtrack ON DEVICE (VERDICT r4 item 3): the direction plane d
    (Rmax, B, Tpad) int8 — the extension stage's down-wire killer at
    Tpad bytes/row — never leaves HBM. A (B,)-vectorized lax.while_loop
    replays the exact _backtrack_abs state machine (ksw2.h:119-151
    semantics incl. the banded force-state rows) and ships back only the
    per-step op codes: (B, Smax) uint8, ~Tpad x less wire. min_intron=0
    (extd2 only; the splice path keeps the host backtrack).

    Returns (ops (B, Smax) uint8 [255 = inactive], i_fin, j_fin) — the
    host run-length-encodes ops and appends the i/j tail runs."""
    B = lens.shape[0]
    qlen = lens[:, 0].astype(jnp.int32)
    tlen = lens[:, 1].astype(jnp.int32)
    wv = jnp.full((B,), jnp.int32(w)) if w >= 0 \
        else jnp.maximum(qlen, tlen)
    bidx = jnp.arange(B, dtype=jnp.int32)
    Rmax, _, Tpad = d.shape

    def cond(c):
        k, i, j, state, out = c
        return (k < Smax) & jnp.any((i >= 0) & (j >= 0))

    def body(c):
        k, i, j, state, out = c
        act = (i >= 0) & (j >= 0)
        r = i + j
        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - wv + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + wv) >> 1)
        st = st0 // 16 * 16
        en = (en0 + 16) // 16 * 16 - 1
        f2 = i < st
        f1 = i > en
        rc = jnp.clip(r, 0, Rmax - 1)
        ic = jnp.clip(i, 0, Tpad - 1)
        tmp = d[rc, bidx, ic].astype(jnp.int32)
        tmp = jnp.where(f1 | f2, 0, tmp)
        # the two-step state transition of _backtrack_abs
        s1 = jnp.where(state == 0, tmp & 7,
                       jnp.where(((tmp >> (state + 2)) & 1) == 0, 0,
                                 state))
        sn = jnp.where(s1 == 0, tmp & 7, s1)
        sn = jnp.where(f2, 2, jnp.where(f1, 1, sn))
        opc = jnp.where(sn == 0, 0,
                        jnp.where((sn == 1) | (sn == 3), 2, 1))
        i_n = jnp.where(act & (opc != 1), i - 1, i)
        j_n = jnp.where(act & (opc != 2), j - 1, j)
        state = jnp.where(act, sn, state)
        col = jnp.where(act, opc.astype(jnp.uint8), jnp.uint8(255))
        out = jax.lax.dynamic_update_slice(out, col[:, None], (0, k))
        return k + 1, i_n, j_n, state, out

    out0 = jnp.full((B, Smax), jnp.uint8(255))
    _, i_f, j_f, _, ops = jax.lax.while_loop(
        cond, body, (jnp.int32(0), i0.astype(jnp.int32),
                     j0.astype(jnp.int32), jnp.zeros(B, jnp.int32), out0))
    return ops, i_f, j_f


@functools.partial(jax.jit, static_argnames=(
    "q", "e", "q2", "e2", "zdrop", "sc_mch", "sc_mis", "sc_N", "w",
    "right", "approx", "approx_drop", "Rmax", "rpp", "interpret",
    "extz_only", "end_bonus", "Smax"))
def extd2_device_traced(lens, tsf, qcol, *, q: int, e: int, q2: int,
                        e2: int, zdrop: int, sc_mch: int, sc_mis: int,
                        sc_N: int, w: int, right: bool, approx: bool,
                        approx_drop: bool, Rmax: int, rpp: int,
                        interpret: bool, extz_only: bool, end_bonus: int,
                        Smax: int):
    """extd2 rows + backtrack-start selection + device trace in ONE
    dispatch: the per-task (i0, j0) choice (_backtrack_abs dispatch in
    extd2_batch) is pure ez arithmetic, so running it device-side
    removes the ez readback sync AND halves the dispatch-floor cost of
    every extension flush (2 launches -> 1). d never leaves HBM."""
    d, ez = extd2_device(lens, tsf, qcol, q=q, e=e, q2=q2, e2=e2,
                         zdrop=zdrop, sc_mch=sc_mch, sc_mis=sc_mis,
                         sc_N=sc_N, w=w, right=right, approx=approx,
                         approx_drop=approx_drop, Rmax=Rmax, rpp=rpp,
                         interpret=interpret)
    qlen = lens[:, 0].astype(jnp.int32)
    tlen = lens[:, 1].astype(jnp.int32)
    zdropped = ez[:, R_ZDROP] != 0
    mx = ez[:, R_MAX]
    mq, mt = ez[:, R_MAXQ], ez[:, R_MAXT]
    mqe, mqe_t = ez[:, R_MQE], ez[:, R_MQET]
    have_max = (mt >= 0) & (mq >= 0)
    if not extz_only:
        i0 = jnp.where(~zdropped, tlen - 1,
                       jnp.where(have_max, mt, -1))
        j0 = jnp.where(~zdropped, qlen - 1,
                       jnp.where(have_max, mq, -1))
    else:
        reach = (~zdropped) & (mqe + end_bonus > mx)
        i0 = jnp.where(reach, mqe_t, jnp.where(have_max, mt, -1))
        j0 = jnp.where(reach, qlen - 1, jnp.where(have_max, mq, -1))
    ops, i_f, j_f = trace_device(d, lens, i0, j0, w=w, Smax=Smax)
    return ez, ops, i_f, j_f


def _cigar_from_ops(ops_row: np.ndarray, i_fin: int, j_fin: int,
                    rev_cigar: bool) -> List[int]:
    """Host tail of trace_device: RLE the op codes + the final D/I runs,
    reproducing _backtrack_abs's _push_cigar merging exactly."""
    n = int(np.argmax(ops_row == 255)) if ops_row[-1] == 255 else \
        len(ops_row)
    if n == 0 and ops_row[0] == 255:
        n = 0
    cigar: List[int] = []
    if n:
        v = ops_row[:n].astype(np.int32)
        brk = np.flatnonzero(v[1:] != v[:-1])
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk + 1, [n]))
        for s, t in zip(starts, ends):
            _push_cigar(cigar, int(v[s]), int(t - s))
    if i_fin >= 0:
        _push_cigar(cigar, 2, i_fin + 1)
    if j_fin >= 0:
        _push_cigar(cigar, 1, j_fin + 1)
    if not rev_cigar:
        cigar.reverse()
    return cigar


def extd2_batch(tasks: Sequence[tuple], mat, q: int, e: int, q2: int,
                e2: int, w: int, zdrop: int, end_bonus: int, flag: int,
                interpret: bool | None = None,
                device_trace: bool | None = None) -> List[ExtzResult]:
    """Run a batch of (q8, t8) pairs through the device kernel and finish
    each on the host (backtrack + ez tail logic, ops/ksw2_ref.py:376-385).
    All tasks share (mat, gaps, w, zdrop, flag) — the bucketing contract."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mat = np.asarray(mat, np.int32).reshape(-1)
    sc_mch, sc_mis = int(mat[0]), int(mat[1])
    sc_N = -e2 if mat[24] == 0 else int(mat[24])
    results: List[ExtzResult] = [ExtzResult() for _ in tasks]
    min_sc = int(mat[1:].min())
    run_idx = [i for i, (q8, t8) in enumerate(tasks)
               if len(q8) > 0 and len(t8) > 0 and -min_sc <= 2 * (q + e)]
    if not run_idx:
        return results
    B = len(run_idx)
    Bp, Tpad, Rmax = quantize_shapes(
        B, max(len(tasks[i][1]) + 16 for i in run_idx),
        max(len(tasks[i][0]) + len(tasks[i][1]) - 1 for i in run_idx))
    lens = np.zeros((Bp, 2), np.int32)
    lens[:, 0] = 1  # inert padding tasks
    lens[:, 1] = 1
    # uint8 wire planes (1 B/base; extd2_device casts device-side)
    tsf = np.zeros((Bp, Tpad), np.uint8)
    # width to a 128 multiple: the kernel's aligned-slice query gather
    qcol = np.zeros((Bp, -(-Rmax // 128) * 128), np.uint8)
    for bi, i in enumerate(run_idx):
        q8, t8 = tasks[i]
        qlen, tlen = len(q8), len(t8)
        lens[bi] = (qlen, tlen)
        qr = np.zeros((qlen + 15) // 16 * 16 + 16, np.int32)
        qr[:qlen] = np.asarray(q8, np.int32)[::-1]
        tsf[bi] = _sf_image(np.asarray(t8, np.int32), Tpad, qr)
        qcol[bi, :qlen] = np.asarray(q8, np.uint8)
    if device_trace is None:
        # on a real accelerator the d readback IS the wire bottleneck
        # (Tpad bytes/row); in interpret mode the host backtrack is free
        device_trace = not interpret
    rev_cigar = bool(flag & KSW_EZ_REV_CIGAR)
    kw = dict(q=q, e=e, q2=q2, e2=e2, zdrop=zdrop, sc_mch=sc_mch,
              sc_mis=sc_mis, sc_N=sc_N, w=w,
              right=bool(flag & KSW_EZ_RIGHT),
              approx=bool(flag & KSW_EZ_APPROX_MAX),
              approx_drop=bool(flag & KSW_EZ_APPROX_DROP),
              Rmax=Rmax, rpp=rows_per_program(bool(interpret)),
              interpret=bool(interpret))
    if device_trace:
        # ONE dispatch: rows + start-point selection + trace fused;
        # d never leaves HBM
        ez, ops, i_f, j_f = extd2_device_traced(
            jnp.asarray(lens), jnp.asarray(tsf), jnp.asarray(qcol),
            extz_only=bool(flag & KSW_EZ_EXTZ_ONLY),
            end_bonus=int(end_bonus), Smax=Rmax, **kw)
        ez = np.asarray(ez)
        ops = np.asarray(ops)
        i_f = np.asarray(i_f)
        j_f = np.asarray(j_f)
        d = None
    else:
        d, ez = extd2_device(
            jnp.asarray(lens), jnp.asarray(tsf), jnp.asarray(qcol), **kw)
        ez = np.asarray(ez)

    from ..utils import profiling as _prof
    if _prof.enabled:  # align-stage transport evidence (bench breakdown)
        _prof.count("ext.dispatches", 1)
        _prof.count("ext.fills", len(run_idx))
        _prof.count("ext.bytes_up",
                    lens.nbytes + tsf.nbytes + qcol.nbytes)
        _prof.count("ext.bytes_down",
                    (Bp * Rmax + ez.nbytes + 8 * Bp) if device_trace
                    else (Rmax * Bp * Tpad + ez.nbytes))
        _prof.count("ext.cells", float(sum(
            min(2 * w + 1, len(tasks[i][0])) * len(tasks[i][1])
            for i in run_idx)) if w >= 0 else float(sum(
                len(tasks[i][0]) * len(tasks[i][1]) for i in run_idx)))

    for bi, i in enumerate(run_idx):
        q8, t8 = tasks[i]
        rz = results[i]
        rz.zdropped = bool(ez[bi, R_ZDROP])
        rz.max = int(ez[bi, R_MAX])
        rz.max_q = int(ez[bi, R_MAXQ])
        rz.max_t = int(ez[bi, R_MAXT])
        rz.mqe = int(ez[bi, R_MQE])
        rz.mqe_t = int(ez[bi, R_MQET])
        rz.mte = int(ez[bi, R_MTE])
        rz.mte_q = int(ez[bi, R_MTEQ])
        rz.score = int(ez[bi, R_SCORE])

    def _start(bi, i):
        """(i0, j0) per _backtrack_abs dispatch; (-1, -1) = no cigar.
        MUST mirror extd2_device_traced's device-side selection."""
        q8, t8 = tasks[i]
        qlen, tlen = len(q8), len(t8)
        rz = results[i]
        if not rz.zdropped and not (flag & KSW_EZ_EXTZ_ONLY):
            return tlen - 1, qlen - 1
        if not rz.zdropped and (flag & KSW_EZ_EXTZ_ONLY) \
                and rz.mqe + end_bonus > rz.max:
            rz.reach_end = True
            return rz.mqe_t, qlen - 1
        if rz.max_t >= 0 and rz.max_q >= 0:
            return rz.max_t, rz.max_q
        return -1, -1

    if device_trace:
        for bi, i in enumerate(run_idx):
            s_i, s_j = _start(bi, i)  # also sets reach_end from ez
            if s_i >= 0 and s_j >= 0:
                results[i].cigar = _cigar_from_ops(
                    ops[bi], int(i_f[bi]), int(j_f[bi]), rev_cigar)
        return results

    d = np.asarray(d)
    for bi, i in enumerate(run_idx):
        q8, t8 = tasks[i]
        qlen, tlen = len(q8), len(t8)
        rz = results[i]
        st, en, _, _ = band_offsets(qlen, tlen, w)
        rows = d[:, bi, :]
        s_i, s_j = _start(bi, i)
        if s_i >= 0 and s_j >= 0:
            rz.cigar = _backtrack_abs(rows, st, en, s_i, s_j, rev_cigar)
    return results


# ---------------------------------------------------------------------------
# exts2: splice-aware extension (ksw2_exts2_sse.c semantics; see
# ops/ksw2_splice_ref.py for the model differences vs extd2)

def _exts2_kernel(q: int, e: int, q2: int, zdrop: int,
                  sc_mch: int, sc_mis: int, sc_N: int,
                  long_thres: int, long_diff: int, right: bool, approx: bool,
                  approx_drop: bool, Tpad: int, Rmax: int, rpp: int,
                  lens_ref, tsf_ref, qcol_ref, don_ref, acc_ref,
                  d_out, ez_out,
                  u_s, v_s, x_s, y_s, x2_s, H_s, s_s, qrw_s, regs):
    g = pl.program_id(0)
    B = lens_ref.shape[0]
    qe = q + e

    @pl.when(g == 0)
    def _init():
        qrw_s[:] = jnp.zeros(qrw_s.shape, jnp.int32)
        u_s[:] = jnp.full(u_s.shape, -qe, jnp.int32)
        v_s[:] = jnp.full(v_s.shape, -qe, jnp.int32)
        x_s[:] = jnp.full(x_s.shape, -qe, jnp.int32)
        y_s[:] = jnp.full(y_s.shape, -qe, jnp.int32)
        x2_s[:] = jnp.full(x2_s.shape, -q2, jnp.int32)
        H_s[:] = jnp.full(H_s.shape, KSW_NEG_INF, jnp.int32)
        s_s[:] = jnp.zeros(s_s.shape, jnp.int32)
        rcol = jax.lax.broadcasted_iota(jnp.int32, regs.shape, 1)
        init = jnp.zeros(regs.shape, jnp.int32)
        for k in (R_MAXQ, R_MAXT, R_MQET, R_MTEQ, R_PST, R_PEN):
            init = jnp.where(rcol == k, -1, init)
        for k in (R_MQE, R_MTE, R_SCORE):
            init = jnp.where(rcol == k, KSW_NEG_INF, init)
        regs[:] = init

    col = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1)
    dsl = pl.ds(PADC - 128, 128 + Tpad)   # [-128, Tpad) in padded arrays
    dsp = pl.ds(PADC, Tpad)

    # Value-carried row fusion (see _extd2_kernel): the rpp rows of one
    # program chain u/v/x/y/x2/qrw/s/H/regs as VALUES; scratch is read
    # once per program and written once. The 128-col prefix feeds the
    # shifted (t-1) reads and is never written (fresh updates land at
    # cols >= st >= 0).
    def _row(r, slot, cu, cv, cx, cy, cx2, cq, cs, cH, rg):
        qlen = lens_ref[:, 0:1]
        tlen = lens_ref[:, 1:2]

        brk = rg[:, R_BREAK:R_BREAK + 1]
        alive = (r < qlen + tlen - 1) & (brk == 0)

        # no band in the splice kernel (ksw2_exts2_sse.c:179-181)
        st0 = jnp.maximum(0, r - qlen + 1)
        en0 = jnp.minimum(tlen - 1, r)
        st = (st0 // 16) * 16
        en = ((en0 + 16) // 16) * 16 - 1

        prev_st = rg[:, R_PST:R_PST + 1]
        prev_en = rg[:, R_PEN:R_PEN + 1]
        covered = (st > 0) & (prev_st <= st - 1) & (st - 1 <= prev_en)
        # first-column boundary decay (ksw2_exts2_sse.c:190-199): past
        # long_thres it is 0 (free intron extension), not -e2
        r_b = jnp.full((B, 1), r, jnp.int32)
        row0_bnd = jnp.where(
            r_b == 0, -qe,
            jnp.where(r_b < long_thres, -e,
                      jnp.where(r_b == long_thres, long_diff, 0)))
        v1_def = jnp.where(st > 0, -qe, row0_bnd)

        bnd_m = (col == r) & (en >= r) & alive
        y_c = jnp.where(bnd_m, -qe, cy[:, 128:])
        u_c = jnp.where(bnd_m, row0_bnd, cu[:, 128:])

        q_r = _gather_col(qcol_ref[:], jnp.full((B, 1), r, jnp.int32))
        qrw = jnp.where(col == 0, q_r, cq[:, 127:127 + Tpad])
        cq = jnp.concatenate([cq[:, :128], qrw], axis=1)

        sq = tsf_ref[:]
        wild = (sq == 4) | (qrw == 4)
        s_new = jnp.where(wild, sc_N, jnp.where(sq == qrw, sc_mch, sc_mis))
        fresh = (col >= st0) & (col < st0 + ((en0 - st0) // 16) * 16 + 16) & alive
        s_row = jnp.where(fresh, s_new, cs)
        cs = s_row

        at_st = col == st
        x_sh = cx[:, 127:127 + Tpad]
        v_sh = cv[:, 127:127 + Tpad]
        x2_sh = cx2[:, 127:127 + Tpad]
        xt1 = jnp.where(at_st & ~covered, -qe, x_sh)
        x2t1 = jnp.where(at_st & ~covered, -q2, x2_sh)
        vt1 = jnp.where(at_st, jnp.where(covered, v_sh, v1_def), v_sh)

        dn = don_ref[:]
        ac = acc_ref[:]
        z = s_row
        a = xt1 + vt1
        b = y_c + u_c
        a2 = x2t1 + vt1
        a2a = a2 + ac
        if not right:
            d = jnp.where(a > z, 1, 0)
            z = jnp.maximum(z, a)
            d = jnp.where(b > z, 2, d)
            z = jnp.maximum(z, b)
            d = jnp.where(a2a > z, 3, d)
            z = jnp.maximum(z, a2a)
        else:
            d = jnp.where(z > a, 0, 1)
            z = jnp.maximum(z, a)
            d = jnp.where(z > b, d, 2)
            z = jnp.maximum(z, b)
            d = jnp.where(z > a2a, d, 3)
            z = jnp.maximum(z, a2a)
        u_new = z - vt1
        v_new = z - u_c
        t1 = z - q
        a = a - t1
        b = b - t1
        a2 = a2 - (z - q2)
        if not right:
            ga, gb, ga2 = a > 0, b > 0, a2 > dn
        else:
            ga, gb, ga2 = a >= 0, b >= 0, a2 >= dn
        x_new = jnp.where(ga, a, 0) - qe
        y_new = jnp.where(gb, b, 0) - qe
        x2_new = jnp.maximum(a2, dn) - q2
        d = (d | jnp.where(ga, 0x08, 0) | jnp.where(gb, 0x10, 0)
             | jnp.where(ga2, 0x20, 0))

        bm = (col >= st) & (col <= en) & alive
        d_out[slot] = jnp.where(bm, d, 0).astype(jnp.int8)
        u_w = jnp.where(bm, u_new, u_c)
        v_w = jnp.where(bm, v_new, cv[:, 128:])
        x_w = jnp.where(bm, x_new, cx[:, 128:])
        y_w = jnp.where(bm, y_new, y_c)
        x2_w = jnp.where(bm, x2_new, cx2[:, 128:])
        cu = jnp.concatenate([cu[:, :128], u_w], axis=1)
        cv = jnp.concatenate([cv[:, :128], v_w], axis=1)
        cx = jnp.concatenate([cx[:, :128], x_w], axis=1)
        cy = jnp.concatenate([cy[:, :128], y_w], axis=1)
        cx2 = jnp.concatenate([cx2[:, :128], x2_w], axis=1)

        is_r0 = r == 0
        if not approx:
            H_old = cH
            upd = (col >= st0) & (col < en0) & alive & (r > 0)
            H_new = jnp.where(upd, H_old + v_new, H_old)
            H_pm1 = _gather_col(H_old, en0 - 1)
            u_en0 = _gather_col(u_new, en0)
            v_en0 = _gather_col(v_new, en0)
            H_en0_old = _gather_col(H_old, en0)
            H_en0 = jnp.where(en0 > 0, H_pm1 + u_en0, H_en0_old + v_en0)
            v0 = _gather_col(v_new, jnp.zeros((B, 1), jnp.int32))
            H_en0 = jnp.where(is_r0, v0 - qe, H_en0)
            H_new = jnp.where((col == en0) & alive, H_en0, H_new)
            cH = H_new

            valid = (col >= st0) & (col <= en0) & alive
            en1 = st0 + ((en0 - st0) // 4) * 4
            rel = col - st0
            lane = rel & 3
            rowl = rel >> 2
            pri = jnp.where(
                col == en0, 3 << 26,
                jnp.where(col < en1, (2 << 26) - (lane << 22) - rowl,
                          (1 << 26) - col))
            M = jnp.max(jnp.where(valid, H_new, NEG32), axis=1, keepdims=True)
            is_m = valid & (H_new == M)
            P = jnp.max(jnp.where(is_m, pri, NEG32), axis=1, keepdims=True)
            max_t = jnp.sum(jnp.where(is_m & (pri == P), col, 0),
                            axis=1, keepdims=True)
            max_t = jnp.where(is_r0, 0, max_t)
            max_H = jnp.where(is_r0, H_en0, M)

            mte = rg[:, R_MTE:R_MTE + 1]
            mte_c = alive & (en0 == tlen - 1) & (H_en0 > mte)
            rg = _rset(rg, R_MTE, jnp.where(mte_c, H_en0, mte))
            rg = _rset(rg, R_MTEQ, jnp.where(
                mte_c, r_b - en, rg[:, R_MTEQ:R_MTEQ + 1]))
            H_st0 = _gather_col(H_new, st0)
            mqe = rg[:, R_MQE:R_MQE + 1]
            mqe_c = alive & (r_b - st0 == qlen - 1) & (H_st0 > mqe)
            rg = _rset(rg, R_MQE, jnp.where(mqe_c, H_st0, mqe))
            rg = _rset(rg, R_MQET, jnp.where(
                mqe_c, st0, rg[:, R_MQET:R_MQET + 1]))
            zH, zt, do_drop = max_H, max_t, True
        else:
            last = rg[:, R_LAST:R_LAST + 1]
            H0 = rg[:, R_H0:R_H0 + 1]
            u_full = u_w
            v_full = v_w
            c1 = (last >= st0) & (last <= en0)
            c2 = (last + 1 >= st0) & (last + 1 <= en0)
            d0 = _gather_col(v_full, last)
            d1 = _gather_col(u_full, last + 1)
            take1 = (c1 & c2 & (d1 >= d0)) | ~c1
            last_n = jnp.where(take1, last + 1, last)
            u_at = _gather_col(u_full, last_n)
            inc = jnp.where(c1 & c2, jnp.maximum(d0, d1),
                            jnp.where(c1, d0, u_at))
            v0 = _gather_col(v_full, jnp.zeros((B, 1), jnp.int32))
            H0_n = jnp.where(is_r0, v0 - qe, H0 + inc)
            last_n = jnp.where(is_r0, 0, last_n)
            rg = _rset(rg, R_H0, jnp.where(alive, H0_n, H0))
            rg = _rset(rg, R_LAST, 
                jnp.where(alive, last_n, last))
            zH, zt, do_drop = H0_n, last_n, approx_drop

        # Z-drop with slope e=0 (ksw2_exts2_sse.c:382)
        ez_max = rg[:, R_MAX:R_MAX + 1]
        ez_max_t = rg[:, R_MAXT:R_MAXT + 1]
        ez_max_q = rg[:, R_MAXQ:R_MAXQ + 1]
        upd_max = alive & (zH > ez_max)
        if do_drop:
            chk = alive & ~upd_max & (zt >= ez_max_t) & (r_b - zt >= ez_max_q)
            dropped = chk & (ez_max - zH > zdrop) \
                if zdrop >= 0 else jnp.zeros_like(chk)
            rg = _rset(rg, R_MAX, jnp.where(upd_max, zH, ez_max))
            rg = _rset(rg, R_MAXT, 
                jnp.where(upd_max, zt, ez_max_t))
            rg = _rset(rg, R_MAXQ, 
                jnp.where(upd_max, r_b - zt, ez_max_q))
            rg = _rset(rg, R_ZDROP, jnp.where(
                dropped, 1, rg[:, R_ZDROP:R_ZDROP + 1]))
        else:
            dropped = jnp.zeros((B, 1), jnp.bool_)

        sc_c = alive & ~dropped & (r_b == qlen + tlen - 2) & (en0 == tlen - 1)
        rg = _rset(rg, R_SCORE, jnp.where(
            sc_c, zH if approx else _gather_col(cH, tlen - 1),
            rg[:, R_SCORE:R_SCORE + 1]))

        rg = _rset(rg, R_BREAK, jnp.where(
            dropped, 1, rg[:, R_BREAK:R_BREAK + 1]))
        rg = _rset(rg, R_PST, jnp.where(alive, st, prev_st))
        rg = _rset(rg, R_PEN, jnp.where(alive, en, prev_en))
        return cu, cv, cx, cy, cx2, cq, cs, cH, rg

    carry = (u_s[:, dsl], v_s[:, dsl], x_s[:, dsl], y_s[:, dsl],
             x2_s[:, dsl], qrw_s[:, dsl], s_s[:], H_s[:], regs[:])
    for _u in range(rpp):
        carry = _row(g * rpp + _u, _u, *carry)
    cu, cv, cx, cy, cx2, cq, cs, cH, rg = carry
    u_s[:, dsp] = cu[:, 128:]
    v_s[:, dsp] = cv[:, 128:]
    x_s[:, dsp] = cx[:, 128:]
    y_s[:, dsp] = cy[:, 128:]
    x2_s[:, dsp] = cx2[:, 128:]
    qrw_s[:, dsp] = cq[:, 128:]
    s_s[:] = cs
    if not approx:
        H_s[:] = cH
    regs[:] = rg

    @pl.when(g == Rmax // rpp - 1)
    def _flush():
        ez_out[:, 0:128] = regs[:]


@functools.partial(jax.jit, static_argnames=(
    "q", "e", "q2", "zdrop", "sc_mch", "sc_mis", "sc_N",
    "right", "approx", "approx_drop", "Rmax", "rpp", "interpret"))
def exts2_device(lens, tsf, qcol, donor, acceptor, *, q: int, e: int,
                 q2: int, zdrop: int, sc_mch: int, sc_mis: int, sc_N: int,
                 right: bool, approx: bool, approx_drop: bool, Rmax: int,
                 rpp: int = 1, interpret: bool = False):
    """Batched splice-extension rows. Extra vs extd2_device: per-task
    donor/acceptor site-score arrays (B, Tpad); rpp as in extd2_device."""
    B, Tpad = tsf.shape
    assert Rmax % rpp == 0
    long_thres = (q2 - q) // e - 1
    if q2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * e - (q2 - q)
    kern = functools.partial(
        _exts2_kernel, q, e, q2, zdrop, sc_mch, sc_mis, sc_N,
        long_thres, long_diff, right, approx, approx_drop, Tpad, Rmax, rpp)
    full = pl.BlockSpec((B, Tpad), lambda r: (0, 0), memory_space=pltpu.VMEM)
    d, ez = pl.pallas_call(
        kern,
        grid=(Rmax // rpp,),
        in_specs=[
            pl.BlockSpec((B, 2), lambda r: (0, 0), memory_space=pltpu.VMEM),
            full,
            pl.BlockSpec((B, qcol.shape[1]), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            full,
            full,
        ],
        out_specs=[
            pl.BlockSpec((rpp, B, Tpad), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 128), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rmax, B, Tpad), jnp.int8),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((B, PADC + Tpad), jnp.int32)] * 5
        + [pltpu.VMEM((B, Tpad), jnp.int32)] * 2
        + [pltpu.VMEM((B, PADC + Tpad), jnp.int32)]
        + [pltpu.VMEM((B, 128), jnp.int32)],
        interpret=interpret,
    )(lens, tsf, qcol, donor, acceptor)
    return d, ez


def exts2_batch(tasks: Sequence[tuple], mat, q: int, e: int, q2: int,
                noncan: int, zdrop: int, junc_bonus: int, flag: int,
                juncs: Sequence = None,
                interpret: bool | None = None) -> List[ExtzResult]:
    """Batch of (q8, t8) splice-extension tasks on device; host finishes
    backtrack with the intron (N) op. juncs: per-task --junc-bed flag
    arrays (or None). All tasks share (mat, costs, flag)."""
    from .ksw2_splice_ref import _site_arrays

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mat = np.asarray(mat, np.int32).reshape(-1)
    sc_mch, sc_mis = int(mat[0]), int(mat[1])
    sc_N = -e if mat[24] == 0 else int(mat[24])
    min_sc = int(mat[1:].min())
    results: List[ExtzResult] = [ExtzResult() for _ in tasks]
    if q2 <= q + e:
        return results
    run_idx = [i for i, (q8, t8) in enumerate(tasks)
               if len(q8) > 0 and len(t8) > 0 and -min_sc <= 2 * (q + e)]
    if not run_idx:
        return results
    long_thres = (q2 - q) // e - 1
    if q2 > q + e + long_thres * e:
        long_thres += 1
    B = len(run_idx)
    Bp, Tpad, Rmax = quantize_shapes(
        B, max(len(tasks[i][1]) + 16 for i in run_idx),
        max(len(tasks[i][0]) + len(tasks[i][1]) - 1 for i in run_idx))
    lens = np.zeros((Bp, 2), np.int32)
    lens[:, 0] = 1
    lens[:, 1] = 1
    tsf = np.zeros((Bp, Tpad), np.int32)
    qcol = np.zeros((Bp, Rmax), np.int32)
    don = np.zeros((Bp, Tpad), np.int32)
    acc = np.zeros((Bp, Tpad), np.int32)
    for bi, i in enumerate(run_idx):
        q8, t8 = tasks[i]
        qlen, tlen = len(q8), len(t8)
        lens[bi] = (qlen, tlen)
        qr = np.zeros((qlen + 15) // 16 * 16 + 16, np.int32)
        qr[:qlen] = np.asarray(q8, np.int32)[::-1]
        tsf[bi] = _sf_image(np.asarray(t8, np.int32), Tpad, qr)
        qcol[bi, :qlen] = np.asarray(q8, np.int32)
        tpad_c = (tlen + 15) // 16 * 16
        dn, ac = _site_arrays(tlen, tpad_c, np.asarray(t8, np.int32),
                              juncs[i] if juncs is not None else None,
                              noncan, junc_bonus, flag)
        don[bi, :tpad_c] = dn
        acc[bi, :tpad_c] = ac
    d, ez = exts2_device(
        jnp.asarray(lens), jnp.asarray(tsf), jnp.asarray(qcol),
        jnp.asarray(don), jnp.asarray(acc),
        q=q, e=e, q2=q2, zdrop=zdrop, sc_mch=sc_mch, sc_mis=sc_mis,
        sc_N=sc_N, right=bool(flag & KSW_EZ_RIGHT),
        approx=bool(flag & KSW_EZ_APPROX_MAX),
        approx_drop=bool(flag & KSW_EZ_APPROX_DROP),
        Rmax=Rmax, rpp=rows_per_program(bool(interpret)),
        interpret=bool(interpret))
    d = np.asarray(d)
    ez = np.asarray(ez)
    rev_cigar = bool(flag & KSW_EZ_REV_CIGAR)
    for bi, i in enumerate(run_idx):
        q8, t8 = tasks[i]
        qlen, tlen = len(q8), len(t8)
        rz = results[i]
        rz.zdropped = bool(ez[bi, R_ZDROP])
        rz.max = int(ez[bi, R_MAX])
        rz.max_q = int(ez[bi, R_MAXQ])
        rz.max_t = int(ez[bi, R_MAXT])
        rz.mqe = int(ez[bi, R_MQE])
        rz.mqe_t = int(ez[bi, R_MQET])
        rz.mte = int(ez[bi, R_MTE])
        rz.mte_q = int(ez[bi, R_MTEQ])
        rz.score = int(ez[bi, R_SCORE])
        st, en, _, _ = band_offsets(qlen, tlen, -1)
        rows = d[:, bi, :]
        if not rz.zdropped and not (flag & KSW_EZ_EXTZ_ONLY):
            rz.cigar = _backtrack_abs(rows, st, en, tlen - 1, qlen - 1,
                                      rev_cigar,
                                      min_intron_len=long_thres)
        elif rz.max_t >= 0 and rz.max_q >= 0:
            rz.cigar = _backtrack_abs(rows, st, en, rz.max_t, rz.max_q,
                                      rev_cigar,
                                      min_intron_len=long_thres)
    return results
