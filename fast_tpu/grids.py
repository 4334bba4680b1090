"""Spatial-frequency grids.

Static, host-side (numpy float64) grid metadata. Functional parity targets
the reference's grid semantics (``fast/fast.py:814-928``) — pixel-identical
axes are pinned by the crossval suite — but the construction here is a
single broadcasted mesh over (optionally stacked, optionally rotated) axes
instead of per-layer loops:

* main grid: ``df = 2*pi / (N*dx)``, centered axes;
* subharmonic grids: 3 levels of 3x3 points, ``df_lo = 2*pi / (3**p * D)``;
* temporal grids: per-layer x-axis in *linear* spatial frequency
  ``1/(Nx * v * dt)`` rotated by the wind direction, y-axis equal to the
  main y-axis (integrated over later);
* log-amplitude grid override for the high-resolution temporal pupil filter.

Grid construction is pure metadata and never hot, so it stays in numpy; the
arrays are handed to jitted device functions as constants (one compile per
configuration — shapes are static by design, SURVEY.md §7).
"""

import numpy as np


def _axis_spacing(axis):
    """Bin spacing of (a stack of) uniform axes: ``axis[..., 1] - axis[..., 0]``."""
    return axis[..., 1] - axis[..., 0]


def mesh_frequency_axes(fx_axis, fy_axis, rot=None):
    """Broadcasted centered mesh of (stacked) frequency axes.

    ``fx_axis``/``fy_axis`` are (..., Nx) / (..., Ny); any leading axes
    (subharmonic levels, turbulence layers) broadcast through. ``rot``
    (..., ) rotates the meshed coordinates in-plane (wind-aligned temporal
    grids). Returns ``(fx, fy)`` of shape (..., Ny, Nx) — one vectorised
    expression, no per-layer loop.
    """
    fx = np.asarray(fx_axis, dtype=float)[..., None, :]
    fy = np.asarray(fy_axis, dtype=float)[..., :, None]
    fx, fy = np.broadcast_arrays(fx, fy)
    if rot is not None:
        rot = np.asarray(rot, dtype=float)[..., None, None]
        c, s = np.cos(rot), np.sin(rot)
        fx, fy = fx * c - fy * s, fx * s + fy * c
    return np.ascontiguousarray(fx), np.ascontiguousarray(fy)


class SpatialFrequencyStruct:
    """A frequency grid: meshed ``fx/fy/fabs``, optionally per-layer/rotated.

    ``fx_axis`` may be 1-D (shared single grid) or 2-D (a stack of per-level
    or per-layer axes); construction is the one broadcasted mesh of
    :func:`mesh_frequency_axes` either way.
    """

    def __init__(self, fx_axis, fy_axis=None, rot=None, freq_per_layer=False):
        fx_axis = np.asarray(fx_axis, dtype=float)
        if fx_axis.ndim not in (1, 2):
            raise ValueError(
                f"fx_axis must be 1-D or a 2-D stack, got ndim={fx_axis.ndim}")
        shared = fy_axis is None
        fy_axis = fx_axis if shared else np.asarray(fy_axis, dtype=float)

        self.fx_axis = fx_axis
        self.fy_axis = fy_axis
        self.freq_per_layer = freq_per_layer
        self._n = 1 if fx_axis.ndim == 1 else fx_axis.shape[0]

        self.dfx = _axis_spacing(fx_axis)
        self.dfy = _axis_spacing(fy_axis)
        if shared:  # square grid: single spacing + 1-D axis shorthand
            self.df = self.dfx
            self.f = fx_axis
        else:
            self.df = None

        self.fx, self.fy = mesh_frequency_axes(fx_axis, fy_axis, rot)
        self.fabs = np.hypot(self.fx, self.fy)

    def realspace_sampling(self):
        """Real-space (dx, dy) implied by the grid extent."""
        ny, nx = self.fx.shape[-2:]
        return 2 * np.pi / (nx * self.dfx), 2 * np.pi / (ny * self.dfy)


class _AxesOnlyStruct:
    """Axes-only frequency metadata (no meshed fx/fy/fabs arrays).

    The streamed temporal-PSD assembly consumes axes and rotation directly;
    memory is O(Nx + Ny) instead of O(nlayer * Ny * Nx).
    """

    def __init__(self, fx_axis, fy_axis, rot):
        self.fx_axis = fx_axis
        self.fy_axis = fy_axis
        self.rot = rot
        self.freq_per_layer = True
        self.dfx = _axis_spacing(fx_axis)
        self.dfy = _axis_spacing(fy_axis)
        self.df = None

    def materialize(self):
        """Full meshed struct for this metadata (diagnostics only)."""
        return SpatialFrequencyStruct(self.fx_axis, self.fy_axis,
                                      rot=self.rot, freq_per_layer=True)


def _centered_axis(n, spacing):
    """``n`` centered bins at ``spacing``: [-n/2, n/2) * spacing."""
    return np.arange(-(n / 2.0), n / 2.0) * spacing


class SpatialFrequencies:
    """Factory for the main / subharmonic / temporal / log-amplitude grids."""

    def __init__(self, N, dx):
        self.N = N
        self.dx = dx
        self.make_main_freqs(N, dx)
        # flat aliases for the common (main-grid) case
        self.fx = self.main.fx
        self.fy = self.main.fy
        self.fabs = self.main.fabs
        self.f = self.main.f
        self.df = self.main.df

    def make_main_freqs(self, N, dx):
        self.main = SpatialFrequencyStruct(
            _centered_axis(N, 2 * np.pi / (N * dx)))

    def make_subharm_freqs(self, pmax=3):
        """3x3-point grids at spacings ``2*pi / (3**p * D)``, p = 1..pmax."""
        D = self.dx * self.N
        df_lo = 2 * np.pi / (3.0 ** np.arange(1, pmax + 1) * D)  # (pmax,)
        self.subharm = SpatialFrequencyStruct(
            np.arange(-1, 2)[None, :] * df_lo[:, None])

    def make_temporal_freqs(self, nlayer, Ny, Nx, wind_speed, wind_dir, dt,
                            materialize=True):
        """Per-layer grids whose x-axes align to temporal frequency bins.

        The x-axis spacing ``1/(Nx * v_i * dt)`` is in linear spatial
        frequency and is chosen so index ``k`` maps to the *same* temporal
        frequency ``k/(Nx*dt)`` in every layer, letting per-layer spectra be
        summed bin-wise. ``materialize=False`` stores only the axes and
        rotation; the engine's streamed temporal PSD assembly needs nothing
        more.
        """
        v = np.asarray(wind_speed, dtype=float)
        df_temporal = 1.0 / (Nx * v * dt)  # (nlayer,) linear spatial freq
        fx_axes = _centered_axis(Nx, 1.0)[None, :] * df_temporal[:, None]
        fy_axes = np.tile(_centered_axis(Ny, self.main.dfy), (nlayer, 1))
        rot = np.radians(np.asarray(wind_dir, dtype=float))
        cls = SpatialFrequencyStruct if materialize else _AxesOnlyStruct
        kw = {"freq_per_layer": True} if materialize else {}
        self.temporal = cls(fx_axes, fy_axes, rot=rot, **kw)

    def make_logamp_freqs(self, Nx=None, dx=None, Ny=None, dy=None):
        """High-resolution override grid (temporal pupil filter), or main."""
        if Nx is None and dx is None:
            self.logamp = self.main
            return
        self.logamp = SpatialFrequencyStruct(
            _centered_axis(Nx, 2 * np.pi / (Nx * dx)),
            _centered_axis(Ny, 2 * np.pi / (Ny * dy)))
