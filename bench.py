"""Benchmark harness: end-to-end segmentation throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): 3-D volumes/sec (seg+track) on the worm
demo scale — worm1-class volumes are ~(168, 401, 128) voxels
(SURVEY §6).  The reference publishes no absolute numbers; vs_baseline uses
the driver-set estimate of the RTX-3080Ti TF pipeline at ~0.4 vol/s for the
U-Net segmentation stage (tile loop dominates), so vs_baseline = value / 0.4.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

VOL_SHAPE = (168, 401, 128)   # worm1-class volume (SURVEY §6)
REFERENCE_VOLS_PER_SEC = 0.4  # estimated TF/3080Ti seg throughput


def main():
    from t3dct.models import unet3_a
    from t3dct.ops import normalize_image
    from t3dct.ops.tiling import plan_tiles, pad_for_tiles, extract_tiles, \
        stitch_tiles

    model = unet3_a()
    params, state = model.init(jax.random.PRNGKey(0))
    plan = plan_tiles(VOL_SHAPE, model.tile_shape, (24, 24, 2))

    @jax.jit
    def segment(params, state, vol):
        norm = normalize_image(vol, noise_level=5.0)
        padded = pad_for_tiles(norm, plan)
        tiles = extract_tiles(padded, plan)
        probs, _ = model.apply(params, state, tiles[..., None],
                               train=False, compute_dtype=jnp.bfloat16)
        return stitch_tiles(probs[..., 0], plan)

    vol = jax.random.uniform(jax.random.PRNGKey(1), VOL_SHAPE,
                             jnp.float32) * 1000.0

    # warmup/compile; device_get forces a real round trip (block_until_ready
    # can be a no-op through the remote-TPU tunnel)
    jax.device_get(jnp.mean(segment(params, state, vol)))

    n_iters = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(n_iters):
        out = segment(params, state, vol)
    # fetch one scalar: waits for the whole queued sequence on-device
    _ = float(jax.device_get(jnp.mean(out)))
    dt = (time.perf_counter() - t0) / n_iters

    vols_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "unet_seg_volumes_per_sec",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/sec (168x401x128, LCN+tiled UNet3D-a, bf16)",
        "vs_baseline": round(vols_per_sec / REFERENCE_VOLS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
