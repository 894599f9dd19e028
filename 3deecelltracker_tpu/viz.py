"""Visualization: matching figures, merged-label overlays, signal grids.

Rebuilds the reference's Draw/plot helpers (``tracker.py:191-461``,
``coord_image_transformer.py:650-779``, ``trackerlite.py:204-239``,
``analyses.py:113-187``) on matplotlib + PIL.  Import is lazy everywhere in
the engine so headless/TPU-pod runs never require a display.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

import matplotlib
# default to Agg ONLY on headless hosts where nothing chose a backend
# yet — unconditionally forcing it would silently clobber an interactive
# session's (%matplotlib widget/qt) backend and break plt.show()
if (os.environ.get("MPLBACKEND") is None
        and os.environ.get("DISPLAY") is None
        and sys.platform != "darwin"
        and "matplotlib.pyplot" not in sys.modules):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import ConnectionPatch  # noqa: E402
from PIL import Image  # noqa: E402


def random_label_cmap(n: int = 2 ** 16, seed: int = 42):
    """Random label colormap (stardist ``random_label_cmap`` equivalent,
    stardistwrapper.py:36)."""
    rng = np.random.RandomState(seed)
    hsv = np.stack([rng.uniform(0, 1, n),
                    rng.uniform(0.4, 1.0, n),
                    rng.uniform(0.6, 1.0, n)], axis=1)
    from matplotlib.colors import ListedColormap, hsv_to_rgb
    cols = hsv_to_rgb(hsv)          # vectorized (a per-entry Python loop
    cols[0] = 0                     # costs ~65536 colorsys calls at import)
    cmap = ListedColormap(cols)
    cmap.colors = cols
    return cmap


lbl_cmap = random_label_cmap()


def plot_img_label_center_slice(img, lbl, img_title="image (XY slice)",
                                lbl_title="label (XY slice)", z=None,
                                path: Optional[str] = None):
    """Side-by-side center z-slice of image + labels
    (``stardistwrapper.plot_img_label_center_slice`` :289-299)."""
    img, lbl = np.asarray(img), np.asarray(lbl)
    if z is None:
        z = img.shape[0] // 2
    fig, (ai, al) = plt.subplots(
        1, 2, figsize=(15, 7), gridspec_kw=dict(width_ratios=(1.25, 1)))
    im = ai.imshow(img[z], cmap="gray", clim=(0, 1))
    ai.set_title(img_title)
    fig.colorbar(im, ax=ai)
    al.imshow(lbl[z], cmap=lbl_cmap)
    al.set_title(lbl_title)
    plt.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
    return fig


def plot_img_label_max_projection(img, lbl,
                                  img_title="image (max projection/x-y)",
                                  lbl_title="label (max projection)",
                                  fig_width_px=1200, dpi=96,
                                  path: Optional[str] = None):
    """x-y max-projection pair (``stardistwrapper`` :302-313)."""
    img, lbl = np.asarray(img), np.asarray(lbl)
    w = fig_width_px / dpi
    fig, (ai, al) = plt.subplots(1, 2, figsize=(w, w / 1.618))
    ai.imshow(img.max(axis=0), clim=(0, 1), vmin=0, vmax=1)
    ai.set_title(img_title)
    al.imshow(lbl.max(axis=0), cmap=lbl_cmap)
    al.set_title(lbl_title)
    plt.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
    return fig


def plot_img_label_max_projection_xz(img, lbl,
                                     img_title="image (max projection/x-z)",
                                     lbl_title="label (max projection)",
                                     fig_width_px=1200, dpi=96,
                                     scale_z: int = 1,
                                     path: Optional[str] = None):
    """x-z max-projection pair with z aspect scaling
    (``stardistwrapper`` :316-329)."""
    img, lbl = np.asarray(img), np.asarray(lbl)
    w = fig_width_px / dpi
    fig, (ai, al) = plt.subplots(1, 2, figsize=(w, w / 1.618))
    ai.imshow(img.max(axis=1), clim=(0, 1), vmin=0, vmax=1, aspect=scale_z)
    ai.set_title(img_title)
    al.imshow(lbl.max(axis=1), cmap=lbl_cmap, aspect=scale_z)
    al.set_title(lbl_title)
    plt.tight_layout()
    if path:
        fig.savefig(path)
        plt.close(fig)
    return fig


def plot_two_pointset_scatters(ref_ptrs, tgt_ptrs, t1, t2,
                               fig_width_px=1200, dpi=96):
    """coord_image_transformer.py:702-757."""
    w_in = fig_width_px / dpi
    h_in = w_in / 1.618
    ry, rx = (np.ptp(ref_ptrs[:, 0]), np.ptp(ref_ptrs[:, 1]))
    ty, tx = (np.ptp(tgt_ptrs[:, 0]), np.ptp(tgt_ptrs[:, 1]))
    top_down = rx + tx >= ry + ty
    if top_down:
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(w_in, h_in))
    else:
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(w_in, h_in))
    ax1.scatter(ref_ptrs[:, 1], -ref_ptrs[:, 0], facecolors="b",
                edgecolors="b")
    ax2.scatter(tgt_ptrs[:, 1], -tgt_ptrs[:, 0], facecolors="b",
                edgecolors="b")
    xl = [min(ax1.get_xlim()[0], ax2.get_xlim()[0]),
          max(ax1.get_xlim()[1], ax2.get_xlim()[1])]
    yl = [min(ax1.get_ylim()[0], ax2.get_ylim()[0]),
          max(ax1.get_ylim()[1], ax2.get_ylim()[1])]
    for ax in (ax1, ax2):
        ax.set_xlim(xl)
        ax.set_ylim(yl)
    if top_down:
        ax1.set_ylabel(f"Point Set t={t1}")
        ax2.set_ylabel(f"Point Set t={t2}")
    else:
        ax1.set_title(f"Point Set t={t1}")
        ax2.set_title(f"Point Set t={t2}")
    return ax1, ax2, fig


def plot_prgls_prediction(ref_ptrs, tgt_ptrs, predicted_ref_ptrs, t1, t2,
                          fig_width_px=1200, dpi=96):
    """coord_image_transformer.py:650-699."""
    ax1, ax2, fig = plot_two_pointset_scatters(ref_ptrs, tgt_ptrs, t1, t2,
                                               fig_width_px, dpi)
    for ref_ptr, tgt_ptr in zip(ref_ptrs, predicted_ref_ptrs):
        con = ConnectionPatch(
            xyA=(tgt_ptr[1], -tgt_ptr[0]), xyB=(ref_ptr[1], -ref_ptr[0]),
            coordsA="data", coordsB="data", axesA=ax2, axesB=ax1,
            color="C1")
        ax2.add_artist(con)
    return fig


def plot_initial_matching(ref_ptrs, tgt_ptrs, pairs_px2, t1, t2,
                          fig_width_px=1200, dpi=96):
    """trackerlite.py:204-239."""
    ax1, ax2, fig = plot_two_pointset_scatters(ref_ptrs, tgt_ptrs, t1, t2,
                                               fig_width_px, dpi)
    for ref_index, tgt_index in pairs_px2:
        con = ConnectionPatch(
            xyA=(tgt_ptrs[tgt_index, 1], -tgt_ptrs[tgt_index, 0]),
            xyB=(ref_ptrs[ref_index, 1], -ref_ptrs[ref_index, 0]),
            coordsA="data", coordsB="data", axesA=ax2, axesB=ax1,
            color="C1")
        ax2.add_artist(con)
    return fig


def save_matching_figure(tree, confirmed_t1_real, seg_t2_real, coords_real,
                         t1: int, t2: int) -> None:
    """Per-volume matching PNG (coord_image_transformer.py:516-522)."""
    fig = plot_prgls_prediction(confirmed_t1_real, seg_t2_real, coords_real,
                                t1, t2)
    tree.figure_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(tree.figure_dir / f"matching_{t2:06d}.png",
                facecolor="white")
    plt.close(fig)


def save_merged_labels(tree, corrected_labels_image, images_path, t: int,
                       interpolation_factor: int) -> None:
    """Overlay of labels + raw, x-y and x-z max projections
    (coord_image_transformer.py:524-558)."""
    from .io.imageio import load_2d_slices_at_time
    # int64: narrow (uint8/16) label dtypes overflow under NumPy 2 casting
    # when taken mod the 65536-entry colormap
    lab = np.asarray(corrected_labels_image).astype(np.int64)
    labels_rgb = lbl_cmap.colors[lab.max(axis=2) % len(lbl_cmap.colors)]
    labels_rgb = Image.fromarray((labels_rgb * 255).astype(np.uint8))
    labels_rgb_xz = lbl_cmap.colors[lab.max(axis=0) % len(lbl_cmap.colors)]
    labels_rgb_xz = np.repeat(labels_rgb_xz.transpose(1, 0, 2),
                              interpolation_factor, axis=0)
    labels_rgb_xz = Image.fromarray((labels_rgb_xz * 255).astype(np.uint8))

    raw = load_2d_slices_at_time(images_path, t=t)
    raw_img = raw.max(axis=0)
    raw_rgb = Image.fromarray(
        (raw_img * 255 / raw_img.max()).astype(np.uint8)).convert("RGB")
    raw_xz = np.repeat(raw.max(axis=1), interpolation_factor, axis=0)
    raw_rgb_xz = Image.fromarray(
        (raw_xz * 255 / raw_xz.max()).astype(np.uint8)).convert("RGB")

    merged = Image.blend(labels_rgb, raw_rgb, alpha=0.5)
    merged_xz = Image.blend(labels_rgb_xz, raw_rgb_xz, alpha=0.5)
    d1 = tree.root / "track_results" / "merged_labels"
    d2 = tree.root / "track_results" / "merged_labels_xz"
    d1.mkdir(parents=True, exist_ok=True)
    d2.mkdir(parents=True, exist_ok=True)
    # compress_level=1: the zlib stage of PIL's PNG encode is ~10 ms/vol
    # of the 1-core host budget at level 6 (scripts/host_profile.json);
    # level 1 is still lossless PNG, just larger files
    merged.save(str(d1 / ("merged_labels_t%06d.png" % t)),
                compress_level=1)
    merged_xz.save(str(d2 / ("merged_labels_xz_t%06d.png" % t)),
                   compress_level=1)


def optimize_row_column(duration, n_signals, figsize):
    """analyses.py:113-146.  Clamped to >= 1 row: the reference divides
    by zero for small duration*n_signals (its own latent crash — the
    clamp is the one deliberate deviation here)."""
    whr = figsize[0] / figsize[1]
    total = duration * n_signals
    row_n = max(int((total / (50 * whr)) ** 0.5), 1)
    col_n = int(np.ceil(n_signals / row_n))
    return row_n, col_n


def draw_signals(signals, ylim_upper=None, ylim_lower=None,
                 figsize=(20, 10)):
    """Per-cell activity grid (analyses.py:149-187)."""
    row_n, col_n = optimize_row_column(signals.shape[0], signals.shape[1],
                                       figsize)
    fig, axes = plt.subplots(row_n, col_n, figsize=figsize, squeeze=False)
    for row in range(row_n):
        for col in range(col_n):
            n = row * col_n + col
            if n >= signals.shape[1]:
                break
            ax = axes[row, col]
            ax.plot(signals[:, n], lw=2)
            up = ylim_upper if ylim_upper is not None else \
                np.nanmax(signals[:, n])
            lo = ylim_lower if ylim_lower is not None else \
                np.nanmin(signals[:, n])
            ax.set_ylim(lo, up)
            ax.set_title("N%d" % (n + 1), va="top")
            if row < row_n - 1:
                ax.get_xaxis().set_visible(False)
    plt.subplots_adjust(left=0.02, bottom=0.02, right=0.98, top=0.98,
                        wspace=0.2, hspace=0.2)
    return fig, axes


def draw_segresult(image3d, segmentation3d, percentile_top=99.9,
                   percentile_bottom=10):
    """Per-z ArtistAnimation of the segmentation (tracker.py:212-252)."""
    from matplotlib import animation
    img = np.asarray(image3d)
    seg = np.asarray(segmentation3d).astype(np.int64)
    vmax = np.percentile(img, percentile_top)
    vmin = np.percentile(img, percentile_bottom)
    fig, (a, b) = plt.subplots(1, 2, figsize=(14, 7))
    a.set_title("raw image")
    b.set_title("segmentation")
    frames = []
    for z in range(img.shape[2]):
        f1 = a.imshow(img[:, :, z], cmap="gray", vmin=vmin, vmax=vmax,
                      animated=True)
        f2 = b.imshow(seg[:, :, z] % len(lbl_cmap.colors), cmap=lbl_cmap,
                      interpolation="none", animated=True)
        frames.append([f1, f2])
    return animation.ArtistAnimation(fig, frames, interval=200)


def draw_manual_seg1(manual_segmentation3d):
    """Max projection of the manually corrected vol-1 labels
    (tracker.py:254-262)."""
    fig, ax = plt.subplots(figsize=(10, 10))
    ax.imshow(np.max(np.asarray(manual_segmentation3d).astype(np.int64),
                     axis=2)
              % len(lbl_cmap.colors), cmap=lbl_cmap, interpolation="none")
    ax.set_title("Manual segmentation at vol 1 (max projection)")
    return fig


def ffn_prgls_animation(rep_frames, seg_coords):
    """Animation over FFN + PR-GLS repetitions (tracker.py:1205-1215):
    ``rep_frames`` is a list of (pre, post) coordinate pairs per rep."""
    from matplotlib import animation
    fig, ax = plt.subplots(figsize=(10, 10))
    artists = []
    for pre, post in rep_frames:
        objs = []
        objs.append(ax.scatter(seg_coords[:, 1], -seg_coords[:, 0],
                               c="C0", s=12, animated=True))
        for s, d in zip(pre, post):
            objs.append(ax.annotate(
                "", xy=(d[1], -d[0]), xytext=(s[1], -s[0]),
                arrowprops=dict(arrowstyle="->", color="C1", lw=0.8)))
        artists.append(objs)
    return animation.ArtistAnimation(fig, artists, interval=200)


def ffn_prgls_grid(member_frames, seg_coords, member_labels=None,
                   path: Optional[str] = None):
    """Static per-rep diagnostic grid of the 5-rep beta-annealed FFN +
    PR-GLS prediction (the grid form of ``ffn_prgls_animation``;
    tracker.py:265-279 draws these frames per rep): one row per ensemble
    member (reference volume), one column per rep.  ``member_frames`` is
    a list over members of per-rep (pre, post) coordinate pairs."""
    seg = np.asarray(seg_coords)
    n_mem = len(member_frames)
    n_rep = max(len(f) for f in member_frames)
    fig, axs = plt.subplots(n_mem, n_rep,
                            figsize=(3.2 * n_rep, 3.2 * n_mem),
                            squeeze=False)
    for mi, frames in enumerate(member_frames):
        for ri in range(n_rep):
            ax = axs[mi, ri]
            if ri >= len(frames):
                ax.axis("off")
                continue
            pre, post = frames[ri]
            plot_transformation_arrows(ax, np.asarray(pre), seg,
                                       np.asarray(post))
            ax.set_xticks([])
            ax.set_yticks([])
            if mi == 0:
                ax.set_title(f"rep {ri + 1}", fontsize=9)
            if ri == 0 and member_labels:
                ax.set_ylabel(member_labels[mi], fontsize=9)
    plt.tight_layout()
    if path:
        fig.savefig(path, bbox_inches="tight", facecolor="white")
        plt.close(fig)
    return fig


def plot_transformation_arrows(ax, ref_ptrs, tgt_ptrs, predicted_ref_ptrs,
                               layercoord=False):
    """FFN + PR-GLS arrow plot for one iteration (track.py:412-471 /
    tracker.py:265-279): segmented targets as dots, arrows from the
    pre-transform reference positions to the predicted ones."""
    ax.scatter(tgt_ptrs[:, 1], -tgt_ptrs[:, 0], c="C0", s=12,
               label="segmented (target)")
    for src, dst in zip(ref_ptrs, predicted_ref_ptrs):
        ax.annotate("", xy=(dst[1], -dst[0]), xytext=(src[1], -src[0]),
                    arrowprops=dict(arrowstyle="->", color="C1", lw=0.8))
    ax.set_aspect("equal")
    return ax


def draw_matching_6panel(raw_img3d, tracked_labels, r_coor_predicted,
                         r_coor_segmented, r_tracked_prev, z_xy_ratio=1.0,
                         path: Optional[str] = None):
    """Per-volume 6-panel tracking figure (tracker.py:342-358, saved per
    volume as anim/track_anim_t%06i.png): raw x-y / x-z projections,
    tracked labels, and prediction arrow plots."""
    fig, axs = plt.subplots(3, 2, figsize=(14, 14))
    raw = np.asarray(raw_img3d)
    lab = np.asarray(tracked_labels).astype(np.int64)
    axs[0, 0].imshow(raw.max(axis=2), cmap="gray")
    axs[0, 0].set_title("raw (x-y projection)")
    axs[0, 1].imshow(np.repeat(raw.max(axis=0).T, max(1, int(z_xy_ratio)),
                               axis=0), cmap="gray")
    axs[0, 1].set_title("raw (x-z projection)")
    axs[1, 0].imshow(lab.max(axis=2) % len(lbl_cmap.colors), cmap=lbl_cmap,
                     interpolation="none")
    axs[1, 0].set_title("tracked labels (x-y)")
    axs[1, 1].imshow(np.repeat((lab.max(axis=0) > 0).T.astype(float),
                               max(1, int(z_xy_ratio)), axis=0),
                     cmap="gray")
    axs[1, 1].set_title("tracked labels (x-z)")
    plot_transformation_arrows(axs[2, 0], np.asarray(r_tracked_prev),
                               np.asarray(r_coor_segmented),
                               np.asarray(r_coor_predicted))
    axs[2, 0].set_title("FFN + PR-GLS prediction")
    axs[2, 1].scatter(np.asarray(r_coor_segmented)[:, 1],
                      -np.asarray(r_coor_segmented)[:, 0], c="C0", s=10,
                      label="segmented")
    axs[2, 1].scatter(np.asarray(r_coor_predicted)[:, 1],
                      -np.asarray(r_coor_predicted)[:, 0], c="C1", s=10,
                      marker="x", label="tracked")
    axs[2, 1].legend()
    axs[2, 1].set_title("segmented vs tracked")
    plt.tight_layout()
    if path:
        fig.savefig(path, bbox_inches="tight", facecolor="white")
        plt.close(fig)
    return fig


def draw_correction(image_cell_bg_xyz, pred_layer, seg_layer,
                    corrected_layer, z_xy_ratio: float = 1.0,
                    path: Optional[str] = None):
    """Accurate-correction overlay (tracker.py:281-314): two panels (y-x
    and y-z planes) with the thresholded cell-region projection in gray,
    segmented centers as dots, and arrows from each FFN+PR-GLS-predicted
    position to its corrected position.  All coordinates in LAYER units
    (z divided by z_xy_ratio)."""
    bg = np.asarray(image_cell_bg_xyz)
    if bg.ndim == 5:                     # reference keeps (1, x, y, z, 1)
        bg = bg[0, ..., 0]
    pred = np.asarray(pred_layer)
    seg = np.asarray(seg_layer)
    corr = np.asarray(corrected_layer)
    fig, (a, b) = plt.subplots(1, 2, figsize=(14, 7))
    a.set_title("Accurate Correction (y-x plane)", size=16)
    b.set_title("Accurate Correction (y-z plane)", size=16)
    a.imshow(bg.max(axis=2) > 0.5, cmap="gray")
    b.imshow((bg.max(axis=0) > 0.5).T, cmap="gray",
             aspect=max(z_xy_ratio, 1e-6))
    a.scatter(seg[:, 1], seg[:, 0], c="C0", s=12, label="segmented")
    b.scatter(seg[:, 1], seg[:, 2], c="C0", s=12, label="segmented")
    for src, dst in zip(pred, corr):
        a.annotate("", xy=(dst[1], dst[0]), xytext=(src[1], src[0]),
                   arrowprops=dict(arrowstyle="->", color="C1", lw=0.8))
        b.annotate("", xy=(dst[1], dst[2]), xytext=(src[1], src[2]),
                   arrowprops=dict(arrowstyle="->", color="C1", lw=0.8))
    a.legend()
    if path:
        fig.savefig(path, facecolor="white")
        plt.close(fig)
    return fig


def draw_overlapping(regions_img3d, labels_before, labels_after,
                     z_xy_ratio: float = 1.0, path: Optional[str] = None,
                     volume2: Optional[int] = None,
                     vol_labels: int = 1):
    """Before/after label overlay (tracker.py:316-390 ``draw_overlapping``
    + ``_draw_matching``): the current volume's cell regions in gray,
    overlaid with the vol-1 interpolated labels ("before matching") and
    the freshly moved tracked labels ("after matching").  ``volume2`` /
    ``vol_labels`` annotate the titles like the reference's."""
    raw = np.asarray(regions_img3d)
    fig, axs = plt.subplots(2, 2, figsize=(14, 14))
    at = "" if volume2 is None else f": cells at vol {volume2}"
    for ax, lab, title in (
            (axs[0], labels_before,
             f"Before matching{at}"
             + ("" if volume2 is None else f" + labels at vol {vol_labels}")),
            (axs[1], labels_after,
             f"After matching{at}"
             + ("" if volume2 is None else f" + labels at vol {volume2}"))):
        lab = np.asarray(lab).astype(np.int64)
        ax[0].imshow(raw.max(axis=2), cmap="gray")
        ax[0].imshow(np.ma.masked_equal(lab.max(axis=2), 0)
                     % len(lbl_cmap.colors), cmap=lbl_cmap, alpha=0.5,
                     interpolation="none")
        ax[0].set_title(f"{title} (x-y)")
        ax[1].imshow(np.repeat(raw.max(axis=0).T, max(1, int(z_xy_ratio)),
                               axis=0), cmap="gray")
        ax[1].imshow(np.repeat(
            np.ma.masked_equal(lab.max(axis=0), 0).T
            % len(lbl_cmap.colors), max(1, int(z_xy_ratio)), axis=0),
            cmap=lbl_cmap, alpha=0.5, interpolation="none")
        ax[1].set_title(f"{title} (x-z)")
    if path:
        fig.savefig(path, facecolor="white")
        plt.close(fig)
    return fig


def replay_track_animation(anim_dir, volume_range, pattern
                           ="track_anim_t%06i.png"):
    """Assemble saved per-volume figures into an animation
    (tracker.py:1433-1460).  Returns a matplotlib ArtistAnimation."""
    from matplotlib import animation
    import matplotlib.image as mgimg
    from pathlib import Path as _P
    fig, ax = plt.subplots(figsize=(10, 10), tight_layout=True)
    ax.axis("off")
    frames = []
    for volume in volume_range:
        p = _P(anim_dir) / (pattern % volume)
        if not p.exists():
            continue
        frames.append([ax.imshow(mgimg.imread(str(p)))])
    return animation.ArtistAnimation(fig, frames, interval=200,
                                     repeat=False)


def draw_segmentation_max_projection(image3d, labels3d, path: Optional[str]
                                     = None):
    """Seg result overlay (tracker.py:212-252 style)."""
    fig, (a, b) = plt.subplots(1, 2, figsize=(14, 7))
    a.imshow(np.max(image3d, axis=2), cmap="gray")
    a.set_title("raw (max projection)")
    b.imshow(np.max(np.asarray(labels3d).astype(np.int64), axis=2)
             % len(lbl_cmap.colors),
             cmap=lbl_cmap, interpolation="none")
    b.set_title("segmentation")
    if path:
        fig.savefig(path, facecolor="white")
        plt.close(fig)
    return fig


# ---- legacy name-parity plot helpers (track.py:412-471,
# coord_image_transformer.py:760-779) --------------------------------------

def plot_arrow(ax, x1, y1, x2, y2):
    """Wedge arrow in axes-fraction coordinates (track.py:412-417)."""
    return ax.annotate("", xy=(x2, y2), xycoords="axes fraction",
                       xytext=(x1, y1), textcoords="axes fraction",
                       arrowprops=dict(arrowstyle="wedge", color="C0"))


def plot_tracking_2d(T_ref, ax, draw_point, ref_ptrs, tgt_ptrs,
                     x_axis, y_axis, sizes):
    """Tracking arrows between two point sets in LAYER coordinates
    (track.py:420-433): reference points as hollow red circles, targets
    as blue crosses, per-point wedge arrows in axes-fraction units
    normalized by ``sizes``."""
    element = []
    ax.invert_yaxis()
    if draw_point:
        element.append(ax.scatter(ref_ptrs[:, x_axis], ref_ptrs[:, y_axis],
                                  facecolors="none", edgecolors="r"))
        element.append(ax.plot(tgt_ptrs[:, x_axis], tgt_ptrs[:, y_axis],
                               "bx")[0])
    for src, dst in zip(np.asarray(ref_ptrs), np.asarray(T_ref)):
        element.append(plot_arrow(
            ax, x1=src[x_axis] / sizes[0], y1=1 - src[y_axis] / sizes[1],
            x2=dst[x_axis] / sizes[0], y2=1 - dst[y_axis] / sizes[1]))
    ax.axis("equal")
    return element


def plot_tracking_2d_realcoord(T_ref, ax, draw_point, ref_ptrs, tgt_ptrs,
                               x_axis, y_axis):
    """Tracking arrows in REAL-resolution coordinates (track.py:435-451)."""
    element = []
    ax.invert_yaxis()
    if draw_point:
        element.append(ax.scatter(ref_ptrs[:, x_axis], ref_ptrs[:, y_axis],
                                  facecolors="none", edgecolors="r"))
        element.append(ax.plot(tgt_ptrs[:, x_axis], tgt_ptrs[:, y_axis],
                               "bx")[0])
    for src, dst in zip(np.asarray(ref_ptrs), np.asarray(T_ref)):
        element.append(ax.arrow(
            x=src[x_axis], y=src[y_axis],
            dx=dst[x_axis] - src[x_axis], dy=dst[y_axis] - src[y_axis],
            color="C0", length_includes_head=True, head_length=4,
            head_width=3))
    ax.axis("equal")
    return element


def tracking_plot_xy(ax, ref_ptrs, tgt_ptrs, T_ref, yx_sizes,
                     draw_point=True, layercoord=False):
    """x-y plane tracking plot (track.py:454-462)."""
    if layercoord:
        return plot_tracking_2d(T_ref, ax, draw_point, ref_ptrs, tgt_ptrs,
                                1, 0, yx_sizes)
    return plot_tracking_2d_realcoord(T_ref, ax, draw_point, ref_ptrs,
                                      tgt_ptrs, 1, 0)


def tracking_plot_zx(ax, ref_ptrs, tgt_ptrs, T_ref, yz_sizes,
                     draw_point=True, layercoord=True):
    """z-x plane tracking plot (track.py:465-471)."""
    if layercoord:
        return plot_tracking_2d(T_ref, ax, draw_point, ref_ptrs, tgt_ptrs,
                                1, 2, yz_sizes)
    return plot_tracking_2d_realcoord(T_ref, ax, draw_point, ref_ptrs,
                                      tgt_ptrs, 1, 2)


def FFN_matching_plot(ref_ptrs, tgt_ptrs, initial_match_score):
    """(Deprecated from reference v0.3, track.py:474-498) greedy-peel
    visualization of an FFN score matrix: targets shifted up by twice
    their y-extent, red links for every match peeled above 0.5."""
    ref_ptrs = np.asarray(ref_ptrs)
    tgt_shift = np.asarray(tgt_ptrs).copy()
    bias = (tgt_shift[:, 0].max() - tgt_shift[:, 0].min()) * 2
    tgt_shift[:, 0] += bias
    fig = plt.figure(figsize=(9, 9))
    plt.scatter(ref_ptrs[:, 1], -ref_ptrs[:, 0], facecolors="none",
                edgecolors="r")
    plt.plot(tgt_shift[:, 1], -tgt_shift[:, 0], "x")
    plt.axis("equal")
    scores = np.array(initial_match_score, copy=True)
    for _ in range(ref_ptrs.shape[0]):
        if scores.max() < 0.5:
            break
        tgt_i, ref_i = np.unravel_index(scores.argmax(), scores.shape)
        plt.plot([ref_ptrs[ref_i, 1], tgt_shift[tgt_i, 1]],
                 [-ref_ptrs[ref_i, 0], -tgt_shift[tgt_i, 0]], "r-")
        scores[tgt_i, :] = 0
        scores[:, ref_i] = 0
    return fig


def unify_xy_lims(ax1, ax2):
    """Give two axes identical x/y limits
    (coord_image_transformer.py:760-779)."""
    x_lim = [min(ax1.get_xlim()[0], ax2.get_xlim()[0]),
             max(ax1.get_xlim()[1], ax2.get_xlim()[1])]
    y_lim = [min(ax1.get_ylim()[0], ax2.get_ylim()[0]),
             max(ax1.get_ylim()[1], ax2.get_ylim()[1])]
    ax1.set_xlim(x_lim)
    ax1.set_ylim(y_lim)
    ax2.set_xlim(x_lim)
    ax2.set_ylim(y_lim)
