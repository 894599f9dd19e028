"""Measure the TRUE device-side cost of zebrafish-scale tiled StarDist
(VERDICT r2 #6): upload the (64, 512, 512) volume ONCE, dispatch every
tile program against device-resident slices, and fetch one checksum —
no per-tile host->device transfer in the timed region (the shipped wall
of 18.8 s is upload-bandwidth-bound through the dev link; this measures
what a co-located host would see).

Run on the TPU:  python scripts/measure_zebrafish_device.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

import t3dct                                   # noqa: F401,E402
from t3dct.utils import enable_compilation_cache   # noqa: E402
from t3dct.config import StarDistConfig        # noqa: E402
from t3dct.engine.stardist import StarDist3D   # noqa: E402

SHAPE = (64, 512, 512)
TILE = (None, 176, 176)        # div_by-rounded inside _plan_tiling


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    # the round-2 zebrafish benchmark's configuration
    # (examples/segment_large_volume.py): 96 rays, grid (2,4,4),
    # z untiled, sub-RF xy shrink
    cfg = StarDistConfig(n_rays=96, grid=(2, 4, 4),
                         anisotropy=(4.0, 1.0, 1.0), prob_thresh=0.5)
    model = StarDist3D(cfg, max_candidates=2048, render_box=(17, 33, 33))
    rng = np.random.RandomState(0)
    x = rng.rand(*SHAPE).astype(np.float32)

    vol, grid, tiles, shr, plan, padded, gshape, c_g = \
        model._plan_tiling(x, TILE, (0, 48, 48))
    print(f"tiles {tiles}, shrink {shr}, n_tiles {len(plan.origins)}",
          flush=True)

    padded_dev = jax.device_put(jnp.asarray(padded))
    jax.device_get(jnp.sum(padded_dev[:1, :1, :1]))   # settle upload
    mi, ma = np.float32(0.0), np.float32(1.0)

    # the SHIPPED dispatch shape (predict_instances_tiled): 8 tiles per
    # jitted dispatch, tiles dynamic_slice'd on device from the resident
    # padded volume.  The original per-tile loop here made 49 execute
    # RPCs + 49 op-by-op slice dispatches per pass, so its wall tracked
    # link weather more than device compute (round-4 morning vs evening
    # runs differed 265 -> 709 ms with NO code change; an interleaved
    # same-process A/B showed the candidate-prefilter delta was ~0)
    BATCH = 8
    origins = [tuple(int(v) for v in o) for o in plan.origins]
    prog = model._get_tile_batch_from_volume_program(
        tiles, shr, vol, 256, BATCH)

    # the checksum MUST be one jitted call over the batch outputs: an
    # eager per-tile unpack (`out[k][i]`) plus eager `jnp.sum`s issues
    # ~350 op-by-op dispatch RPCs per pass, and the measured "device"
    # time tracks link weather instead of compute (an earlier version of
    # this script recorded 887 ms that way; the jitted-checksum number
    # is ~270 ms at the same weather)
    @jax.jit
    def checksum(batch_outs):
        return sum(jnp.sum(o[1]) + jnp.sum(o[0][:, :2, :2, :2])
                   for o in batch_outs)

    def run_all():
        batch_outs = []
        n_reals = []
        for start in range(0, len(origins), BATCH):
            chunk = origins[start:start + BATCH]
            n_reals.append(len(chunk))
            chunk = chunk + [chunk[-1]] * (BATCH - len(chunk))
            ogs = [tuple(v // g for v, g in zip(o, grid)) for o in chunk]
            out = prog(model.params, padded_dev, mi, ma,
                       np.asarray(chunk, np.int32),
                       np.asarray(ogs, np.int32), np.float32(0.5))
            batch_outs.append(out)
        return jax.device_get(checksum(batch_outs)), batch_outs, n_reals

    # warm-up (compiles)
    _, batch_outs, n_reals = run_all()
    # per-tile views for the combine stage (OUTSIDE the timed region);
    # padded duplicate tiles in the final batch are dropped
    host = jax.device_get(batch_outs)
    outs = [tuple(o[i] for o in bo)
            for bo, n in zip(host, n_reals) for i in range(n)]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_all()
        times.append(time.perf_counter() - t0)
    tile_ms = float(np.median(times) * 1e3)
    print(f"device-resident tile sweep: {tile_ms:.1f} ms", flush=True)

    # global combine (overlap + NMS + render) on the concatenated
    # candidates — measured with device-resident candidate inputs.
    # The shipped _combine_tile_parts truncates to the top
    # max_candidates by prob BEFORE building the combine program (its
    # overlap matrix is O(k^2): 12544 concatenated candidates would be a
    # ~37x larger program than production ever runs); replicate that
    # truncation on-device so combine_render_ms measures the shipped k
    probs = jnp.concatenate([o[1] for o in outs])
    dists = jnp.concatenate([o[2] for o in outs])
    points = jnp.concatenate([o[3] for o in outs])
    valid = jnp.concatenate([o[4] for o in outs])
    order = jnp.argsort(
        -jnp.where(valid, probs, -jnp.inf))[:model.max_candidates]
    probs, dists, points, valid = (probs[order], dists[order],
                                   points[order], valid[order])
    combine = model._get_combine_program(int(probs.shape[0]), SHAPE, True)

    @jax.jit
    def combine_checksum(os_):
        return sum(jnp.sum(o[1][:2, :2, :2].astype(jnp.int32)) for o in os_)

    out = combine(probs, dists, points, valid, np.float32(0.3))
    jax.device_get(combine_checksum([out]))
    # queue N calls, sync once: a per-call fetch would put one ~30 ms RPC
    # round trip inside every timed pass
    reps = 4
    t0 = time.perf_counter()
    os_ = [combine(probs, dists, points, valid, np.float32(0.3))
           for _ in range(reps)]
    jax.device_get(combine_checksum(os_))
    combine_ms = float((time.perf_counter() - t0) / reps * 1e3)
    print(f"global NMS + full-volume render: {combine_ms:.1f} ms",
          flush=True)

    results = {"shape": SHAPE, "n_tiles": len(plan.origins),
               "tile_sweep_ms": tile_ms, "combine_render_ms": combine_ms,
               "total_device_ms": tile_ms + combine_ms}
    out_p = Path(__file__).parent / "zebrafish_device.json"
    out_p.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
