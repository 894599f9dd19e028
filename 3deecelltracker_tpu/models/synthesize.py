"""Training-data synthesis for the FFN matcher (reference ``synthesize.py``).

Host-side NumPy (cheap, feeds the device training step):
- ``affine_transform``: random affine (±affine_level) + jitter
  (synthesize.py:75-85),
- ``add_seg_errors``: replace a ratio of points with KDE samples — a
  gaussian-kernel KDE sample is a random data point plus N(0, bandwidth²)
  noise, exactly sklearn KernelDensity(bandwidth).sample
  (synthesize.py:52-72),
- ``no_match_points``: derangement-style mismatched partner points
  (synthesize.py:39-49).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

RATIO_SEG_ERROR = 0.15
K_NEIGHBORS = 20


def affine_transform(points: np.ndarray, affine_level: float,
                     rand_move_level: float,
                     rng: np.random.RandomState) -> np.ndarray:
    random_transform = (rng.rand(3, 3) - 0.5) * affine_level
    random_movements = (rng.rand(*points.shape) - 0.5) * 4 * rand_move_level
    return points @ (np.eye(3) + random_transform) + random_movements


def add_seg_errors(points_normalized: np.ndarray,
                   ratio: float = RATIO_SEG_ERROR,
                   bandwidth: float = 0.1,
                   rng: np.random.RandomState = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Replace ``ratio`` of the points with KDE samples of the cloud."""
    if not 0 < ratio < 1:
        raise ValueError(f"ratio should be in (0, 1) but = {ratio}")
    rng = rng or np.random.RandomState()
    n = points_normalized.shape[0]
    new_points = points_normalized.copy()
    k = int(np.ceil(n * ratio))
    replaced = rng.permutation(n)[:k]
    # KDE(gaussian, bandwidth).sample == data[i] + N(0, bw^2)
    src = rng.randint(0, n, size=k)
    new_points[replaced] = points_normalized[src] + \
        rng.randn(k, 3) * bandwidth
    return new_points, replaced


def no_match_points(n: int, points_wi_errors: np.ndarray,
                    rng: np.random.RandomState) -> np.ndarray:
    """Partner points guaranteed != self (synthesize.py:39-49)."""
    idx = rng.permutation(n)
    out = np.zeros_like(points_wi_errors)
    for i in range(n):
        j = idx[i - 1] if idx[i] == i else idx[i]
        out[i] = points_wi_errors[j]
    return out
