"""Microphone array geometries (meters, array center at the origin).

Rebuild of /root/reference/data_loaders/utils/array_geometry.py:14-64.
"""

from __future__ import annotations

import numpy as np


def circular_array(radius: float, mic_num: int) -> np.ndarray:
    """Evenly spaced mics on a horizontal circle; mic 0 on the +x axis."""
    angles = np.arange(mic_num) * 2 * np.pi / mic_num
    pos = np.zeros((mic_num, 3))
    pos[:, 0] = np.cos(angles)
    pos[:, 1] = np.sin(angles)
    return pos * radius


def linear_array(spacing: float, mic_num: int) -> np.ndarray:
    """Uniform line on the x axis, centered at the origin."""
    xs = np.arange(mic_num, dtype=np.float64) * spacing
    xs -= xs.mean()
    pos = np.zeros((mic_num, 3))
    pos[:, 0] = xs
    return pos


def chime3_array() -> np.ndarray:
    """CHiME-3 tablet 2x3 rectangle (0.1 m x 0.19 m)."""
    pos = np.array([
        [-0.1, 0.095, 0.0], [0.0, 0.095, 0.0], [0.1, 0.095, 0.0],
        [-0.1, -0.095, 0.0], [0.0, -0.095, 0.0], [0.1, -0.095, 0.0],
    ])
    return pos


def libricss_array() -> np.ndarray:
    """LibriCSS: one center mic + 6-mic circle of radius 4.25 cm."""
    pos = np.zeros((7, 3))
    pos[1:] = circular_array(radius=0.0425, mic_num=6)
    return pos
