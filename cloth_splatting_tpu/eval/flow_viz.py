"""Tracked-point / trajectory overlays on rendered frames.

Parity with the reference render.py --show_flow path (render.py:95-121
get_mask + :226-286 circle/arrow drawing): tracked points are drawn when
their camera-space depth is not occluded by the rendered depth map, and
short trajectory tails connect consecutive frames. Colors follow the DAVIS
colormap convention.
"""

from __future__ import annotations

import numpy as np


def davis_palette(n: int) -> np.ndarray:
    """First n colors of a DAVIS-style label palette (uint8 [n, 3])."""
    base = np.asarray([
        [255, 99, 71], [65, 105, 225], [60, 179, 113], [255, 215, 0],
        [186, 85, 211], [0, 206, 209], [255, 140, 0], [220, 20, 60],
        [154, 205, 50], [30, 144, 255],
    ], np.uint8)
    reps = int(np.ceil(n / len(base)))
    return np.tile(base, (reps, 1))[:n]


def occlusion_mask(projections: np.ndarray, point_depth: np.ndarray,
                   depth_map: np.ndarray, tol: float = 0.05) -> np.ndarray:
    """Visible-point mask: the point's depth must be within ``tol`` of the
    rendered depth at its pixel (reference get_mask, render.py:95-121)."""
    h, w = depth_map.shape[-2:]
    x = np.clip(np.round(projections[:, 0]).astype(int), 0, w - 1)
    y = np.clip(np.round(projections[:, 1]).astype(int), 0, h - 1)
    d_at = depth_map.reshape(h, w)[y, x]
    on_screen = ((projections[:, 0] >= 0) & (projections[:, 0] < w)
                 & (projections[:, 1] >= 0) & (projections[:, 1] < h))
    return on_screen & (point_depth <= d_at + tol)


def draw_tracks(image: np.ndarray, track_projections: list[np.ndarray],
                visible: np.ndarray, radius: int = 2,
                tail: int = 4) -> np.ndarray:
    """Draw tracked points + trajectory tails onto an HxWx3 uint8 image.

    Args:
        track_projections: list over time of [M, 2] pixel positions
            (last entry = current frame).
        visible: [M] bool visibility at the current frame.
    """
    import cv2

    img = image.copy()
    colors = davis_palette(track_projections[-1].shape[0])
    current = track_projections[-1]
    for t in range(max(len(track_projections) - tail, 0),
                   len(track_projections) - 1):
        a, b = track_projections[t], track_projections[t + 1]
        for m in range(current.shape[0]):
            if visible[m]:
                cv2.line(img, tuple(np.round(a[m]).astype(int)),
                         tuple(np.round(b[m]).astype(int)),
                         colors[m].tolist(), 1, cv2.LINE_AA)
    for m in range(current.shape[0]):
        if visible[m]:
            cv2.circle(img, tuple(np.round(current[m]).astype(int)), radius,
                       colors[m].tolist(), -1, cv2.LINE_AA)
    return img
