from fast_tpu.utils.fits import Header, writeto, getheader, getdata  # noqa: F401
