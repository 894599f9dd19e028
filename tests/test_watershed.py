"""Watershed flood, boundary detection, size filtering: hand-built goldens
and pipeline properties on synthetic cell volumes."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from t3dct.ops.watershed import (watershed_flood, find_boundaries_outer,
                                 remove_small_objects, watershed_2d,
                                 watershed_3d, recalculate_cell_boundaries)


def two_blob_image(shape=(40, 40), c1=(12, 12), c2=(28, 28), r=9):
    """Two overlapping discs -> one connected mask, two obvious basins."""
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    m1 = (yy - c1[0]) ** 2 + (xx - c1[1]) ** 2 <= r * r
    m2 = (yy - c2[0]) ** 2 + (xx - c2[1]) ** 2 <= r * r
    return m1 | m2, m1, m2


def test_flood_assigns_full_mask():
    mask, m1, m2 = two_blob_image()
    dist = ndi.distance_transform_edt(mask)
    markers = np.zeros(mask.shape, np.int32)
    markers[12, 12] = 1
    markers[28, 28] = 2
    lab = np.asarray(watershed_flood(-dist.astype(np.float32), markers, mask))
    # every masked voxel labeled, nothing outside
    assert np.all(lab[mask] > 0)
    assert np.all(lab[~mask] == 0)
    # each basin contains its own marker region's core
    assert lab[12, 12] == 1 and lab[28, 28] == 2
    # cores of each disc (far from the interface) are correctly assigned
    assert np.all(lab[m1 & ~m2] == 1)
    assert np.all(lab[m2 & ~m1] == 2)


def test_flood_minimax_goes_around_ridge():
    """A wall of high elevation must divert flooding around it."""
    elev = np.zeros((7, 11), np.float32)
    elev[:6, 5] = 100.0  # wall with a gap at the bottom row
    mask = np.ones_like(elev, bool)
    markers = np.zeros(elev.shape, np.int32)
    markers[0, 0] = 1
    markers[0, 10] = 2
    lab = np.asarray(watershed_flood(elev, markers, mask))
    # left side all 1, right side all 2 except wall cells flood via the gap
    assert np.all(lab[:, :5] == 1)
    assert np.all(lab[:6, 6:] == 2)


def test_find_boundaries_outer_basic():
    lab = np.zeros((8, 8), np.int32)
    lab[2:4, 2:4] = 1
    lab[2:4, 4:6] = 2  # touching label 1
    b = np.asarray(find_boundaries_outer(lab, connectivity=2))
    # touching interface marked on both sides
    assert b[2, 3] and b[2, 4]
    # background ring around objects marked
    assert b[1, 2] and b[4, 5]
    # interior background far away not marked
    assert not b[7, 7]


def test_remove_small_objects():
    lab = np.zeros((10, 10), np.int32)
    lab[:2, :2] = 1          # size 4
    lab[5:9, 5:9] = 2        # size 16
    out = np.asarray(remove_small_objects(lab, 10, max_labels=8))
    assert np.all(out[lab == 1] == 0)
    assert np.all(out[lab == 2] == 2)


def synth_cells_3d(shape=(48, 48, 12), centers=None, r=5, seed=0):
    """Synthetic binary cell volume with gaussian-ish blobs."""
    if centers is None:
        centers = [(12, 12, 6), (12, 34, 6), (34, 12, 6), (34, 34, 6),
                   (24, 24, 6)]
    xx, yy, zz = np.mgrid[:shape[0], :shape[1], :shape[2]]
    mask = np.zeros(shape, bool)
    for cx, cy, cz in centers:
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - cz) * 2.0) ** 2
        mask |= d2 <= r * r
    return mask, centers


def test_watershed_2d_splits_touching_cells():
    # two touching discs in each z slice
    mask, m1, m2 = two_blob_image(c1=(15, 13), c2=(15, 27), r=8)
    pred = np.repeat(mask[:, :, None].astype(np.float32), 3, axis=2)
    bn_out, boundary = watershed_2d(pred, min_distance=5)
    bn_out = np.asarray(bn_out)
    # after carving boundaries, the two cells are separate components
    lab, n = ndi.label(bn_out[:, :, 1])
    assert n == 2
    # boundary voxels are inside the original mask region or its rim
    assert np.asarray(boundary).any()


def test_watershed_3d_pipeline():
    mask, centers = synth_cells_3d()
    labels_wo_bd, labels_clear, min_size, cell_num = watershed_3d(
        mask, (1.0, 1.0, 2.0), method="min_size", min_size=50,
        min_distance=3, max_labels=64)
    labels_clear = np.asarray(labels_clear)
    labels_wo_bd = np.asarray(labels_wo_bd)
    assert int(cell_num) == len(centers)
    # each center voxel carries a distinct label
    ids = {int(labels_clear[c]) for c in centers}
    assert len(ids) == len(centers) and 0 not in ids
    # boundary removal keeps labels a subset
    fg = labels_wo_bd > 0
    assert np.all(labels_wo_bd[fg] == labels_clear[fg])


def test_watershed_3d_cell_num_method():
    mask, centers = synth_cells_3d()
    _, labels_clear, min_size, cell_num = watershed_3d(
        mask, (1.0, 1.0, 2.0), method="cell_num", cell_num=5,
        min_distance=3, max_labels=64)
    assert int(cell_num) == 5
    kept = np.unique(np.asarray(labels_clear))
    assert len(kept[kept > 0]) == 5


def test_recalculate_cell_boundaries():
    # two cells with an overlapping strip (mask==2) between them
    seg = np.zeros((20, 20, 2), np.int32)
    seg[4:9, 4:16, :] = 1
    seg[11:16, 4:16, :] = 2
    overlap = (seg > 0).astype(np.int32)
    # synthetic overlap strip in the middle, belonging to both
    overlap[9:11, 4:16, :] = 2
    seg2 = seg.copy()
    out = np.asarray(recalculate_cell_boundaries(seg2, overlap,
                                                 sampling_xy=(1.0, 1.0)))
    # non-overlap markers keep their labels
    assert np.all(out[4:9, 4:16, :] == 1)
    assert np.all(out[11:16, 4:16, :] == 2)
    # overlap strip fully reassigned to 1 or 2
    strip = out[9:11, 4:16, :]
    assert np.all((strip == 1) | (strip == 2))
    # split roughly evenly: row 9 adjacent to cell 1, row 10 to cell 2
    assert np.all(out[9, 4:16, :] == 1)
    assert np.all(out[10, 4:16, :] == 2)
