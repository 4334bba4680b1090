"""Noll indexing (aotools.functions.zernike API)."""

from fast_tpu.ops.zernike import noll_to_nm


def zernIndex(j):
    return list(noll_to_nm(j))
