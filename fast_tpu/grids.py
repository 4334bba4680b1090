"""Spatial-frequency grids.

Static, host-side (numpy float64) grid metadata mirroring the reference's
``SpatialFrequencies`` / ``SpatialFrequencyStruct`` (``fast/fast.py:814-928``):

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


class SpatialFrequencyStruct:
    """A frequency grid: meshed ``fx/fy/fabs``, optionally per-layer/rotated.

    ``fx_axis`` may be 1-D (shared single grid) or 2-D (a stack of per-level
    or per-layer axes). ``rot`` rotates the meshed coordinates (used for
    wind-aligned temporal grids).
    """

    def __init__(self, fx_axis, fy_axis=None, rot=None, freq_per_layer=False):
        self.fx_axis = np.asarray(fx_axis, dtype=float)
        self.freq_per_layer = freq_per_layer
        if fy_axis is None:
            self.fy_axis = self.fx_axis
            self.f = self.fx_axis
            self.df = self.fx_axis[..., 1] - self.fx_axis[..., 0]
            self.dfx = self.df
            self.dfy = self.df
        else:
            self.fy_axis = np.asarray(fy_axis, dtype=float)
            self.df = None
            self.dfx = self.fx_axis[..., 1] - self.fx_axis[..., 0]
            self.dfy = self.fy_axis[..., 1] - self.fy_axis[..., 0]

        if self.fx_axis.ndim == 2:
            n = self.fx_axis.shape[0]
            self._n = n
            ny = self.fy_axis.shape[1]
            nx = self.fx_axis.shape[1]
            self.fx = np.zeros((n, ny, nx))
            self.fy = np.zeros((n, ny, nx))
            for i in range(n):
                self.fx[i], self.fy[i] = np.meshgrid(
                    self.fx_axis[i], self.fy_axis[i])
                if rot is not None:
                    fx_rot = self.fx[i] * np.cos(rot[i]) - self.fy[i] * np.sin(rot[i])
                    fy_rot = self.fx[i] * np.sin(rot[i]) + self.fy[i] * np.cos(rot[i])
                    self.fx[i] = fx_rot
                    self.fy[i] = fy_rot
        elif self.fx_axis.ndim == 1:
            self._n = 1
            self.fx, self.fy = np.meshgrid(self.fx_axis, self.fy_axis)
            if rot is not None:
                fx_rot = self.fx * np.cos(rot) - self.fy * np.sin(rot)
                fy_rot = self.fx * np.sin(rot) + self.fy * np.cos(rot)
                self.fx = fx_rot
                self.fy = fy_rot
        else:
            raise Exception("fx_axis ndim should be either 1 or 2")

        self.fabs = np.sqrt(self.fx ** 2 + self.fy ** 2)

    def realspace_sampling(self):
        nx = self.fx.shape[-1]
        ny = self.fx.shape[-2]
        dx = 2 * np.pi / (nx * self.dfx)
        dy = 2 * np.pi / (ny * self.dfy)
        return dx, dy


class _AxesOnlyStruct:
    """Axes-only frequency metadata (no meshed fx/fy/fabs arrays)."""

    def __init__(self, fx_axis, fy_axis, rot):
        self.fx_axis = fx_axis
        self.fy_axis = fy_axis
        self.rot = rot
        self.freq_per_layer = True
        self.dfx = fx_axis[..., 1] - fx_axis[..., 0]
        self.dfy = fy_axis[..., 1] - fy_axis[..., 0]
        self.df = None


class SpatialFrequencies:
    """Factory for the main / subharmonic / temporal / log-amplitude grids."""

    def __init__(self, N, dx):
        self.N = N
        self.dx = dx
        self.make_main_freqs(N, dx)
        self.fx = self.main.fx
        self.fy = self.main.fy
        self.fabs = self.main.fabs
        self.f = self.main.f
        self.df = self.main.df

    def make_main_freqs(self, N, dx):
        df = 2 * np.pi / (N * dx)
        fx_axis = np.arange(-N / 2.0, N / 2.0) * df
        self.main = SpatialFrequencyStruct(fx_axis)

    def make_subharm_freqs(self, pmax=3):
        fx_axes = []
        D = self.dx * self.N
        for p in range(1, pmax + 1):
            df_lo = 2 * np.pi / (3 ** p * D)
            fx_axes.append(np.arange(-1, 2) * df_lo)
        self.subharm = SpatialFrequencyStruct(np.array(fx_axes))

    def make_temporal_freqs(self, nlayer, Ny, Nx, wind_speed, wind_dir, dt,
                            materialize=True):
        """Per-layer grids whose x-axes align to temporal frequency bins.

        The x-axis spacing ``1/(Nx * v_i * dt)`` is in linear spatial
        frequency and is chosen so index ``k`` maps to the *same* temporal
        frequency ``k/(Nx*dt)`` in every layer, letting per-layer spectra be
        summed bin-wise (reference ``fast/fast.py:846-864``).

        ``materialize=False`` stores only the axes and rotation (memory
        O(Nx + Ny) instead of O(nlayer * Ny * Nx)); the engine's streamed
        temporal PSD assembly needs nothing more.
        """
        fx_axes = []
        fy_axes = []
        for i in range(nlayer):
            dxl = wind_speed[i] * dt
            df_temporal = 1 / (Nx * dxl)  # linear spatial frequency
            fx_axes.append(np.arange(-Nx / 2, Nx / 2) * df_temporal)
            fy_axes.append(np.arange(-Ny / 2, Ny / 2) * self.main.dfy)
        if materialize:
            self.temporal = SpatialFrequencyStruct(
                np.array(fx_axes), np.array(fy_axes),
                rot=np.radians(wind_dir), freq_per_layer=True)
        else:
            self.temporal = _AxesOnlyStruct(
                np.array(fx_axes), np.array(fy_axes), np.radians(wind_dir))

    def make_logamp_freqs(self, Nx=None, dx=None, Ny=None, dy=None):
        if Nx is None and dx is None:
            self.logamp = self.main
        else:
            dfx = 2 * np.pi / (Nx * dx)
            fx_axis = np.arange(-Nx / 2.0, Nx / 2.0) * dfx
            dfy = 2 * np.pi / (Ny * dy)
            fy_axis = np.arange(-Ny / 2.0, Ny / 2.0) * dfy
            self.logamp = SpatialFrequencyStruct(fx_axis, fy_axis)
