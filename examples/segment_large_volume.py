"""Segment a volume beyond whole-volume memory: tiled and mesh-sharded.

The reference raises ``NotImplementedError`` for tiled sparse prediction
(``stardist3dcustom.py:188``), capping it at volumes whose backbone pass
fits device memory.  This framework covers that scale two ways:

- ``predict_instances_tiled``   — sequential tile-and-stitch on one chip
  (receptive-field shrink; interior outputs bit-match the whole-volume
  pass).
- ``predict_instances_sharded`` — the SAME tile program fanned out over a
  ``jax.sharding.Mesh`` of all local devices; candidates merge globally.
  On an N-chip slice the wall-clock divides by ~N.

For a whole RECORDING at this scale, pass ``tile_shape=`` to
``engine.stardist.predict_and_save`` — it drives the tiled path per
volume with prefetched decoding and writes the standard ``seg/``
artifacts for ``track_timelapse``.

Run (defaults are zebrafish-class (64, 512, 512)):
  python examples/segment_large_volume.py
  python examples/segment_large_volume.py --sharded --cpu-mesh 8 \
      --shape 32 256 256          # 8 virtual CPU devices (no TPU slice)
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse
import time

import numpy as np

from t3dct.config import StarDistConfig
from t3dct.engine.stardist import StarDist3D
from t3dct.utils.cache import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(64, 512, 512),
                    help="(z, y, x) volume shape")
    ap.add_argument("--tile", type=int, nargs=2, default=(192, 192),
                    help="(y, x) tile size (z untiled)")
    ap.add_argument("--sharded", action="store_true",
                    help="fan tiles out over all local devices")
    ap.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="force an N-device virtual CPU mesh (must be set "
                         "before any device use; overrides the platform "
                         "even where env vars are ignored)")
    args = ap.parse_args()
    if args.cpu_mesh:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(args.cpu_mesh))
    enable_compilation_cache()

    cfg = StarDistConfig(n_rays=32, grid=(2, 4, 4),
                         anisotropy=(2.0, 1.0, 1.0),
                         unet_n_depth=1, unet_n_filter_base=8,
                         net_conv_after_unet=16,
                         train_patch_size=(16, 32, 32),
                         prob_thresh=0.8, nms_thresh=0.3)
    model = StarDist3D(cfg, max_candidates=512, render_box=(9, 17, 17))
    # swap in a trained model for real data:
    #   model = load_stardist_model("stardist", basedir="stardist_models")

    rng = np.random.default_rng(0)
    x = rng.random(tuple(args.shape), np.float32)
    tile_shape = (None, args.tile[0], args.tile[1])
    # explicit sub-RF shrink keeps the demo quick; drop `shrink` to get
    # interior bit-exactness with the whole-volume pass
    kwargs = dict(tile_shape=tile_shape, shrink=(0, 48, 48),
                  tile_candidates=128)

    fn = (model.predict_instances_sharded if args.sharded
          else model.predict_instances_tiled)
    t0 = time.perf_counter()
    (labels, details), prob_map = fn(x, **kwargs)
    dt = time.perf_counter() - t0
    import jax
    print(f"volume {x.shape} -> labels {labels.shape}, "
          f"{len(details['prob'])} instances, prob_map {prob_map.shape}")
    print(f"{'sharded over %d devices' % len(jax.devices()) if args.sharded else 'sequential tiles'}: "
          f"{dt:.1f}s (incl. compile on first run)")


if __name__ == "__main__":
    main()
