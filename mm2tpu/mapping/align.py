"""Base-level alignment orchestration (reference: align.c).

Round-1 placeholder: raises until the ksw2 extension kernels land
(ops/ksw2_ref.py, ops/ksw2_pallas.py). See SURVEY.md §7 step 6.
"""
from __future__ import annotations


def align_skeleton(mi, opt, qlen, seq, regs, a):
    raise NotImplementedError(
        "base-level alignment (-a/-c) not yet implemented; PAF without CIGAR only")
