"""SDUST low-complexity masking of minimizers (reference: sdust.c,
mm_dust_minier map.c:38-62). Port pending; sdust_thres=0 (default in every
preset) disables it."""


def dust_minimizers(mm, seq, thres, offset):
    raise NotImplementedError("SDUST masking (-T) not yet implemented")
