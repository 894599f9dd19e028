"""Smoke tests for the visualization module (Agg backend)."""

import numpy as np

import matplotlib
matplotlib.use("Agg")

from t3dct import viz


def _scene(n=12, seed=0):
    rng = np.random.RandomState(seed)
    ref = rng.rand(n, 3) * 50
    tgt = ref + rng.randn(n, 3)
    return ref, tgt


def test_plot_prgls_prediction():
    ref, tgt = _scene()
    fig = viz.plot_prgls_prediction(ref, tgt, tgt, 1, 2)
    assert fig is not None


def test_plot_initial_matching():
    ref, tgt = _scene(10)
    pairs = np.stack([np.arange(10), np.arange(10)], 1)
    fig = viz.plot_initial_matching(ref, tgt, pairs, 1, 2)
    assert fig is not None


def test_6panel_and_segresult(tmp_path):
    rng = np.random.RandomState(1)
    raw = rng.rand(30, 40, 4)
    # uint8: the tracking saver ships 8-bit label volumes when ids fit;
    # the 65536-entry colormap modulo must not overflow narrow dtypes
    # (NumPy 2 rejects the out-of-range python-int cast)
    lab = (rng.rand(30, 40, 4) * 5).astype(np.uint8)
    ref, tgt = _scene(8)
    fig = viz.draw_matching_6panel(raw, lab, tgt, tgt, ref, 2.0,
                                   path=str(tmp_path / "p.png"))
    assert (tmp_path / "p.png").exists()
    anim = viz.draw_segresult(raw, lab)
    assert anim is not None
    fig2 = viz.draw_manual_seg1(lab)
    assert fig2 is not None


def test_signals_grid():
    rng = np.random.RandomState(2)
    sig = rng.rand(50, 9)
    fig, axes = viz.draw_signals(sig)
    assert fig is not None
    assert viz.optimize_row_column(200, 100, (40, 20)) == (14, 8)


def test_ffn_prgls_animation():
    ref, tgt = _scene(6)
    anim = viz.ffn_prgls_animation([(ref, tgt), (tgt, ref)], tgt)
    assert anim is not None


def test_random_label_cmap():
    cmap = viz.random_label_cmap(256)
    assert cmap.colors.shape == (256, 3)
    assert (cmap.colors[0] == 0).all()


def test_draw_correction_and_overlapping(tmp_path):
    rng = np.random.RandomState(3)
    bg = rng.rand(30, 40, 4)
    pred = rng.rand(6, 3) * [30, 40, 4]
    seg = pred + rng.randn(6, 3)
    corr = pred + 0.5
    fig = viz.draw_correction(bg, pred, seg, corr, z_xy_ratio=9.2,
                              path=str(tmp_path / "corr.png"))
    assert (tmp_path / "corr.png").exists()
    lab0 = (rng.rand(30, 40, 4) * 5).astype(np.uint8)
    lab1 = (rng.rand(30, 40, 4) * 5).astype(np.uint8)
    fig2 = viz.draw_overlapping(bg, lab0, lab1, z_xy_ratio=9.2,
                                path=str(tmp_path / "ov.png"))
    assert (tmp_path / "ov.png").exists()


def test_ffn_prgls_grid(tmp_path):
    rng = np.random.RandomState(0)
    ref = rng.rand(10, 3) * 50
    tgt = ref + rng.randn(10, 3)
    frames = [(ref, tgt), (tgt, ref)]
    path = str(tmp_path / "grid.png")
    fig = viz.ffn_prgls_grid([frames, frames], tgt,
                             member_labels=["from vol 1", "from vol 2"],
                             path=path)
    assert (tmp_path / "grid.png").exists()
    import matplotlib.pyplot as plt
    plt.close("all")


def test_legacy_name_parity_plot_helpers():
    """The reference's plot-helper names (track.py:412-498,
    coord_image_transformer.py:760-779) exist with the same signatures."""
    import matplotlib.pyplot as plt

    rng = np.random.RandomState(3)
    ref = rng.rand(8, 3) * [40, 60, 10]
    tgt = ref + rng.randn(8, 3)
    T_ref = tgt + 0.5

    fig, (ax1, ax2) = plt.subplots(1, 2)
    el = viz.tracking_plot_xy(ax1, ref, tgt, T_ref, (60, 40),
                              layercoord=True)
    assert len(el) == 2 + len(ref)
    el2 = viz.tracking_plot_zx(ax2, ref, tgt, T_ref, (60, 10),
                               layercoord=False)
    assert len(el2) == 2 + len(ref)
    el3 = viz.plot_tracking_2d_realcoord(T_ref, ax1, False, ref, tgt, 1, 0)
    assert len(el3) == len(ref)
    ax1.set_xlim(0, 10), ax2.set_xlim(3, 20)
    viz.unify_xy_lims(ax1, ax2)
    assert ax1.get_xlim() == ax2.get_xlim()
    assert ax1.get_ylim() == ax2.get_ylim()

    scores = rng.rand(8, 8) * 0.4
    scores[2, 5] = 0.9
    scores[4, 1] = 0.8
    fig2 = viz.FFN_matching_plot(ref, tgt, scores)
    assert fig2 is not None
    # greedy peel must not mutate the caller's matrix
    assert scores[2, 5] == 0.9
    plt.close("all")
