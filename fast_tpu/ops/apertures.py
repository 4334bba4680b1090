"""Apertures, launch modes and the pupil spatial filter.

Host-side (numpy, float64) construction of the static pupil/mode fields the
engine precomputes once per configuration (reference ``fast/funcs.py:261-350``
plus the ``aotools`` ``circle``/``gaussian2d`` surface it imports, SURVEY.md
§2.8). These feed the device-side Monte Carlo path as constants.

Grid conventions match the reference's aotools dependency, including its
known half-pixel quirk: ``circle`` samples pixel centres at ``i + 0.5 - N/2``
while ``gaussian2d`` centres the peak at index ``N/2`` — the two are offset
by half a pixel. We reproduce this deliberately so pupil-overlap integrals,
fibre-coupling optima and the link budget cross-validate against the
reference bit-for-bit (given identical inputs).
"""

import logging

import numpy as np
from scipy.optimize import minimize_scalar

logger = logging.getLogger(__name__)


def circle(radius, size, circle_centre=(0, 0)):
    """Binary circular aperture of ``radius`` pixels on a ``size``^2 grid.

    Pixel-centre coordinates are ``arange(0.5, size) - size/2`` (aotools
    convention; reference call sites ``fast/funcs.py:263``).
    """
    coords = np.arange(0.5, size, 1.0)
    x, y = np.meshgrid(coords, coords)
    x = x - size / 2.0 - circle_centre[0]
    y = y - size / 2.0 - circle_centre[1]
    mask = x * x + y * y <= radius * radius
    out = np.zeros((size, size))
    out[mask] = 1
    return out


def gaussian2d(size, width, amplitude=1.0, cent=None):
    """2-D Gaussian, ``width`` = standard deviation in pixels.

    Peak at index ``size/2`` unless ``cent`` given (aotools convention;
    reference call sites ``fast/funcs.py:290,340,348``, ``fast/comms.py:411``).
    """
    if not np.isscalar(size):
        xsize, ysize = size
    else:
        xsize = ysize = size
    if not np.isscalar(width):
        xwidth, ywidth = width
    else:
        xwidth = ywidth = width
    if cent is None:
        xcent = xsize / 2.0
        ycent = ysize / 2.0
    else:
        xcent, ycent = cent
    i = np.arange(xsize)[:, None]
    j = np.arange(ysize)[None, :]
    return amplitude * np.exp(
        -(((xcent - i) / xwidth) ** 2 + ((ycent - j) / ywidth) ** 2) / 2
    )


def compute_pupil(N, dx, D, obsc=0, Ny=None):
    """Annular aperture normalised to unit energy (``sum * dx^2 == 1``).

    Optional asymmetric padding/cropping of the second axis to ``Ny``
    columns (used by the temporal-mode pupil filter; reference
    ``fast/funcs.py:261-277``).
    """
    circ_ap = circle(D / dx / 2, N) - circle(obsc / dx / 2, N)

    if Ny is not None:
        Nx = N
        assert ((Ny - Nx) % 2) == 0, "(Nx-Ny)/2 must be even"
        if Ny > Nx:
            npad = (Ny - Nx) // 2
            circ_ap = np.pad(circ_ap, [(0, 0), (npad, npad)])
        if Ny < Nx:
            ncut = (Nx - Ny) // 2
            circ_ap = circ_ap[:, ncut:-ncut]

    return circ_ap / np.sqrt(circ_ap.sum() * dx ** 2)


def compute_gaussian_mode(pupil, dx, W0=None, D=None, obsc=None, ptype="gauss"):
    """Gaussian (or axicon ring) launch/receive mode.

    ``W0 == 'opt'`` optimises the waist for maximum fibre coupling against
    ``pupil``. Returns ``(mode, W0)``. Amplitude normalisation matches the
    reference (``fast/funcs.py:280-305``): peak intensity ``2/(pi W0^2)``,
    divided by ``pupil.max()`` so that ``pupil * mode`` carries the mode
    amplitude unweighted by the pupil's own energy normalisation.
    """
    Nx, Ny = pupil.shape

    if ptype == "gauss":
        if isinstance(W0, str) and W0 == "opt":
            g, opt = optimize_fibre(pupil, dx, return_size=True)
            logger.debug("Optimised gaussian size: %s", opt)
            return g / pupil.max(), opt
        I0 = 2 / (np.pi * W0 ** 2)
        g = gaussian2d((Nx, Ny), W0 / dx / np.sqrt(2)) * np.sqrt(I0)
        return g / pupil.max(), W0

    if ptype == "axicon":
        if isinstance(W0, str) and W0 == "opt":
            raise TypeError(
                "Using 'axicon' and W0='opt' not supported, please set W0")
        x = np.arange(-Nx / 2, Nx / 2, 1) * dx
        y = np.arange(-Ny / 2, Ny / 2, 1) * dx
        xx, yy = np.meshgrid(y, x)
        r = np.sqrt(xx ** 2 + yy ** 2)
        midpt = obsc / 2 + (D / 2 - obsc / 2) / 2
        ring = np.exp(-((r - midpt) ** 2) / W0 ** 2)
        P = (ring ** 2).sum() * dx ** 2
        return ring / np.sqrt(P) / pupil.max(), W0

    raise Exception('ptype must be one of "gauss" or "axicon"')


def _np_ft2(g, delta):
    """Centered 2-D DFT (numpy, host side) — same convention as ops.fourier."""
    return np.fft.fftshift(np.fft.fft2(np.fft.fftshift(g))) * delta ** 2


def pupil_filter(pupil):
    """Pupil spatial filter ``|FT(pupil)|^2 / pupil.sum()^2``.

    Reference ``fast/funcs.py:308-315`` (ndarray branch; the spline branch is
    replaced by direct bilinear resampling in the temporal path, see
    ``fast_tpu.ops.interp``).
    """
    P = np.abs(_np_ft2(pupil, 1)) ** 2
    return P / pupil.sum() ** 2


def coupling_loss(W, N, pupil, dx):
    """1 - coupling efficiency of a Gaussian mode of waist ``W`` into ``pupil``."""
    fibre_field = gaussian2d(N, W / dx / np.sqrt(2)) * np.sqrt(
        2.0 / (np.pi * W ** 2))
    coupling = np.abs((fibre_field * pupil).sum() * dx ** 2) ** 2
    return 1 - coupling


def optimize_fibre(pupil, dx, size_min=None, size_max=None, return_size=False):
    """Optimal Gaussian mode waist for coupling into ``pupil``.

    Host-side bracketed scalar minimisation (reference
    ``fast/funcs.py:317-345`` including its retry-with-wider-bracket
    fallback). Runs once per configuration, so it stays off-device.
    """
    Nx, Ny = pupil.shape
    if size_max is None:
        size_max = max(Ny, Nx) * dx
    if size_min is None:
        size_min = dx

    def _opt_func(W):
        return coupling_loss(W, (Nx, Ny), pupil, dx)

    opt = minimize_scalar(_opt_func, bracket=[size_min, size_max]).x
    if abs(opt) < dx:
        logger.info(
            "Gaussian mode optimisation failed, trying different parameters")
        opt = minimize_scalar(_opt_func, bracket=[size_min, 2 * size_max]).x
        if abs(opt) < dx:
            raise Exception("Cannot optimise gaussian mode, try changing DX?")

    g = gaussian2d((Nx, Ny), opt / dx / np.sqrt(2)) * np.sqrt(
        2.0 / (np.pi * opt ** 2))

    if return_size:
        return g, np.abs(opt)
    return g
