"""Results-tree management (the on-disk contract of SURVEY Appendix A).

Layout under ``results_dir/`` (reference ``coord_image_transformer.py:21-27``,
``trackerlite.py:19-27``):

    seg/coords%06d.npy, seg/prob%06d.npy
    auto_vol1/
    manual_vol1/                      (user-provided)
    track_results/coords_real/coords%06d.npy
    track_results/labels/track_results_t%06i_z%04i.tif
    track_results/figure/
    track_results/merged_labels/ , merged_labels_xz/

This on-disk state is also the checkpoint/resume mechanism: segmentation is
fully precomputed into ``seg/``, and tracking can resume from any volume's
confirmed coords (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Optional, Union

import numpy as np

from .imageio import save_label_slices

SEG = "seg"
TRACK_RESULTS = "track_results"
COORDS_REAL = "coords_real"
LABELS = "labels"
FIGURE = "figure"
MERGED_LABELS = "merged_labels"
MERGED_LABELS_XZ = "merged_labels_xz"


class ResultsTree:
    """Typed accessor for the results directory contract."""

    def __init__(self, results_dir: Union[str, Path]):
        self.root = Path(results_dir)

    # ---- dirs ---------------------------------------------------------------
    @property
    def seg_dir(self) -> Path:
        return self.root / SEG

    @property
    def coords_real_dir(self) -> Path:
        return self.root / TRACK_RESULTS / COORDS_REAL

    @property
    def labels_dir(self) -> Path:
        return self.root / TRACK_RESULTS / LABELS

    @property
    def figure_dir(self) -> Path:
        return self.root / TRACK_RESULTS / FIGURE

    def make_dirs(self) -> None:
        for d in (self.seg_dir, self.coords_real_dir, self.labels_dir,
                  self.figure_dir):
            d.mkdir(parents=True, exist_ok=True)

    # ---- segmentation artifacts ----------------------------------------------
    def save_seg_coords(self, t: int, coords: np.ndarray) -> None:
        self.seg_dir.mkdir(parents=True, exist_ok=True)
        np.save(str(self.seg_dir / f"coords{t:06d}.npy"), np.asarray(coords))

    def load_seg_coords(self, t: int) -> np.ndarray:
        return np.load(str(self.seg_dir / f"coords{t:06d}.npy"))

    def save_seg_prob(self, t: int, prob: np.ndarray) -> None:
        self.seg_dir.mkdir(parents=True, exist_ok=True)
        np.save(str(self.seg_dir / f"prob{t:06d}.npy"), np.asarray(prob))

    def load_seg_prob(self, t: int, fmt: str = "prob%06d.npy") -> np.ndarray:
        return np.load(str(self.seg_dir / (fmt % t)))

    # ---- tracking artifacts ----------------------------------------------------
    def save_coords_real(self, t: int, coords_real: np.ndarray) -> None:
        self.coords_real_dir.mkdir(parents=True, exist_ok=True)
        np.save(str(self.coords_real_dir / ("coords%06d.npy" % t)),
                np.asarray(coords_real))

    def load_coords_real(self, t: int) -> np.ndarray:
        return np.load(str(self.coords_real_dir / ("coords%06d.npy" % t)))

    def save_tracked_labels(self, labels_xyz: np.ndarray, t: int,
                            use_8_bit: bool) -> None:
        save_label_slices(labels_xyz, self.labels_dir,
                          "track_results_t%06i_z%04i.tif", t, use_8_bit)

    # ---- exports ---------------------------------------------------------------
    def export_coordinates_csv(self, coords_by_t: dict,
                               filename: str = "tracked_coordinates.csv"
                               ) -> Path:
        """CSV with (t, cell, x, y, z) rows (``tracker.py:1538-1551``)."""
        path = self.root / filename
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["t", "cell", "x", "y", "z"])
            for t in sorted(coords_by_t):
                arr = np.asarray(coords_by_t[t])
                for i, row in enumerate(arr):
                    w.writerow([t, i + 1, *row.tolist()])
        return path

    def export_activities_csv(self, activities: np.ndarray,
                              filename: str = "activities.csv") -> Path:
        path = self.root / filename
        arr = np.asarray(activities)
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["t"] + [f"cell_{i + 1}" for i in
                                range(arr.shape[1])])
            for t, row in enumerate(arr, start=1):
                w.writerow([t] + row.tolist())
        return path
