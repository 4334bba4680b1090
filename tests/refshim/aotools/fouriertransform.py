"""Centered FFT conventions (aotools.fouriertransform API)."""

import numpy as np


def ft(data, delta):
    return np.fft.fftshift(
        np.fft.fft(np.fft.fftshift(data, axes=-1), axis=-1), axes=-1) * delta


def ift(DATA, delta_f):
    n = np.shape(DATA)[-1]
    return np.fft.ifftshift(
        np.fft.ifft(np.fft.ifftshift(DATA, axes=-1), axis=-1),
        axes=-1) * n * delta_f


def ft2(data, delta):
    return np.fft.fftshift(
        np.fft.fft2(np.fft.fftshift(data, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1)) * delta ** 2


def ift2(DATA, delta_f):
    n = np.shape(DATA)[-1]
    return np.fft.ifftshift(
        np.fft.ifft2(np.fft.ifftshift(DATA, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1)) * (n * delta_f) ** 2
