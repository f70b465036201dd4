"""Dynamic landmark selection and smoothing utilities.

The reference's recorder generations explored several selection schemes
beyond the fixed 88-point set:

- index-neighborhood expansion of seed sets
  (important_landmarks.py:75-87 ``expand_by_index_neighbors``);
- per-clip *dynamic* lower-face selection — all landmarks below the nose-base
  cutoff plus cheeks minus the nose set, locked on the first in-range frame
  (inactive/lower_face_record.py:66-85 ``compute_selected_indices``) — the
  source of variable feature dims across datasets;
- EMA stabilization of the ROI center/scale
  (inactive/record_landmarks_v2.py:70-73).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from .landmarks import CHEEKS, MESH_POINTS

# Nose landmarks excluded from lower-face selections
# (important_landmarks.py:17-31).
NOSE_SET = frozenset(
    [1, 2, 4, 5, 6, 19, 94, 97, 98, 99, 115, 164, 165, 167, 220,
     278, 294, 326, 327, 328, 344, 391, 393, 440]
)

# Nose-base cutoff anchor: selection keeps landmarks below this point's y.
NOSE_BASE_IDX = 2


def expand_by_index_neighbors(idx_set: Iterable[int], k: int) -> set[int]:
    """Grow a set by +-1/+-2 *index* neighbors, k rounds.

    Index adjacency is a heuristic the reference used to thicken sparse
    selections (mesh indices are only loosely spatially ordered)."""
    out = set(idx_set)
    for _ in range(max(0, k)):
        more = set()
        for i in out:
            for j in (i - 1, i + 1, i - 2, i + 2):
                if 0 <= j < MESH_POINTS:
                    more.add(j)
        out |= more
    return out


def compute_selected_indices(
    landmarks_xy: np.ndarray,
    *,
    cutoff_idx: int = NOSE_BASE_IDX,
    cheeks: Iterable[int] = CHEEKS,
    exclude: Iterable[int] = NOSE_SET,
) -> np.ndarray:
    """Dynamic lower-face selection from one frame's normalized landmarks:
    every mesh point whose y is below the cutoff anchor's y, plus the cheek
    set, minus the nose set. Returns sorted indices."""
    lm = np.asarray(landmarks_xy)
    cutoff_y = lm[cutoff_idx, 1]
    below = set(np.where(lm[:, 1] > cutoff_y)[0].tolist())
    sel = (below | set(cheeks)) - set(exclude)
    return np.asarray(sorted(sel), dtype=np.int32)


class EMA:
    """Exponential moving average smoother (record_landmarks_v2.py:70-73):
    state = alpha * new + (1 - alpha) * state; first update passes through."""

    def __init__(self, alpha: float = 0.3):
        self.alpha = float(alpha)
        self.state: Optional[np.ndarray] = None

    def update(self, value) -> np.ndarray:
        v = np.asarray(value, dtype=np.float64)
        if self.state is None:
            self.state = v.copy()
        else:
            self.state = self.alpha * v + (1.0 - self.alpha) * self.state
        return self.state

    def reset(self):
        self.state = None


class Hysteresis:
    """Two-threshold open/close detector (important_landmarks.py:57-58,
    131-146): opens above ``high``, closes below ``low``."""

    def __init__(self, low: float, high: float, initial: bool = False):
        assert low <= high
        self.low, self.high = low, high
        self.open = initial

    def update(self, value: float) -> bool:
        if self.open and value < self.low:
            self.open = False
        elif not self.open and value > self.high:
            self.open = True
        return self.open
