"""Smoke test for the real-data validation runbook
(scripts/validate_worm1.py) on synthetic stand-in directories: the
moment the worm1 demo data + pretrained models are mounted, the same
entry point runs the full accuracy comparison."""

import numpy as np
import pytest


@pytest.mark.slow
def test_validate_worm1_smoke(tmp_path):
    import jax
    from t3dct.config import StarDistConfig
    from t3dct.engine.stardist import StarDist3D
    from t3dct.io.imageio import save_label_slices
    from t3dct.models.ffn import FFN

    from scripts.validate_worm1 import run_validation

    # ---- synthetic stand-ins: recording + model dirs ---------------------
    shape_zyx = (16, 48, 48)
    z_ratio = 2.0
    centers = np.array([[8, 12, 12], [8, 12, 36], [8, 36, 12],
                        [8, 36, 36]], np.float32)
    zz, yy, xx = np.mgrid[:shape_zyx[0], :shape_zyx[1], :shape_zyx[2]]
    raw_dir = tmp_path / "raw"
    lab1 = np.zeros(shape_zyx, np.int32)
    for t in range(1, 4):
        c = centers + 0.5 * (t - 1)
        img = np.random.RandomState(t).rand(*shape_zyx) * 0.1
        for i, (cz, cy, cx) in enumerate(c):
            d2 = ((zz - cz) * z_ratio) ** 2 + (yy - cy) ** 2 + \
                (xx - cx) ** 2
            img += np.exp(-d2 / 18.0)
            if t == 1:
                lab1[d2 < 16] = i + 1
        img16 = (img / img.max() * 40000).astype(np.uint16)
        save_label_slices(img16.transpose(1, 2, 0), raw_dir,
                          "raw_t%03i_z%04i.tif", t, use_8_bit=False,
                          compression=None)

    cfg = StarDistConfig(n_rays=8, grid=(1, 2, 2),
                         anisotropy=(z_ratio, 1.0, 1.0), unet_n_depth=1,
                         unet_n_filter_base=4, net_conv_after_unet=8,
                         train_patch_size=shape_zyx, prob_thresh=0.4,
                         nms_thresh=0.3)
    sd = StarDist3D(cfg, max_candidates=32, render_box=(5, 9, 9))
    sd.save(tmp_path / "sd_model")

    results = tmp_path / "results"
    save_label_slices(lab1.transpose(1, 2, 0), results / "manual_vol1",
                      "manual_vol1_t%04i_z%04i.tif", 0, use_8_bit=True,
                      compression=None)

    ffn_weights = FFN().init(jax.random.PRNGKey(0))

    report = run_validation(
        str(raw_dir / "raw_t%03i_z*.tif"), results,
        tmp_path / "sd_model", ffn_weights,
        voxel_size=(1.0, 1.0, z_ratio), interpolation_factor=2,
        beta=10.0, lambda_=3.0, with_reference=True,
        max_candidates=32, render_box=(5, 9, 9))

    assert report["stardist_format"] == "t3dct"
    assert report["vol1_labels"] == "manual"
    assert report["volumes"] == [1, 3]
    assert (results / "seg" / "coords000003.npy").exists()
    assert (results / "validate_worm1_report.json").exists()
    # the comparison metrics exist and are finite (untrained nets: the
    # VALUES are meaningless, the plumbing is what's under test)
    assert np.isfinite(report["median_deviation_real_units"])
    assert 0.0 <= report["assignment_agreement_final_t"] <= 1.0
