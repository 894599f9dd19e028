"""Per-layer timing of the StarDist backbone on the real TPU.

VERDICT r2 #2(b): the backbone costs ~15.5 ms of the 21.4 ms fused
device seg at worm scale and is memory/layout-bound (bf16 == f32);
jax.profiler is unusable through the axon tunnel, so this locates the
stall by timing standalone jitted layers with the queued-calls method
(CLAUDE.md: queue N calls, fetch one scalar once).

Run on the TPU:  python scripts/profile_backbone.py
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
from t3dct.models import layers as L           # noqa: E402
from t3dct.config import StarDistConfig        # noqa: E402
from t3dct.models.stardist3d import StarDist3DNet   # noqa: E402

N_QUEUE = 30


def timed(fn, *args, n=N_QUEUE):
    """Median-of-3 of (queue n calls, fetch sum once) / n."""
    out = fn(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        s = sum(jnp.sum(o[0] if isinstance(o, tuple) else o) for o in outs)
        jax.device_get(s)
        best.append((time.perf_counter() - t0) / n)
    return float(np.median(best) * 1e3)


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    cfg = StarDistConfig(n_rays=96, grid=(1, 2, 2),
                         anisotropy=(9.2, 1.0, 1.0))
    net = StarDist3DNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # worm1 padded volume in model frame (z, y, x), grid-pooled shapes
    x_full = jnp.asarray(rng.rand(1, 24, 408, 168, 1).astype(np.float32))

    results = {}

    # ---- whole backbone ---------------------------------------------------
    fwd = jax.jit(lambda p, x: net.apply(p, x))
    results["full_backbone_ms"] = timed(fwd, params, x_full)
    print("full_backbone_ms", results["full_backbone_ms"], flush=True)

    # ---- standalone layers at their true shapes ---------------------------
    # post-grid resolution (24, 204, 84)
    shapes = {
        "stem_1to32_g": ((1, 24, 204, 84, 1), 1, 32, (3, 3, 3)),
        "conv32_g": ((1, 24, 204, 84, 32), 32, 32, (3, 3, 3)),
        "conv96to32_up0": ((1, 24, 204, 84, 96), 96, 32, (3, 3, 3)),
        "feat_32to128": ((1, 24, 204, 84, 32), 32, 128, (3, 3, 3)),
        "head_128to96_1x1": ((1, 24, 204, 84, 128), 128, 96, (1, 1, 1)),
        "conv32to64_d1": ((1, 12, 102, 42, 32), 32, 64, (3, 3, 3)),
        "conv64_d1": ((1, 12, 102, 42, 64), 64, 64, (3, 3, 3)),
        "conv128_bottom": ((1, 6, 51, 21, 128), 128, 128, (3, 3, 3)),
        "conv192to64_up1": ((1, 12, 102, 42, 192), 192, 64, (3, 3, 3)),
    }
    key = jax.random.PRNGKey(1)
    for name, (shape, cin, cout, kern) in shapes.items():
        p = L.init_conv3d(key, kern, cin, cout)
        x = jnp.asarray(rng.rand(*shape).astype(np.float32))
        f = jax.jit(lambda p, x: jax.nn.relu(L.conv3d(p, x)))
        ms = timed(f, p, x)
        n_vox = int(np.prod(shape[1:4]))
        gflop = 2 * n_vox * int(np.prod(kern)) * cin * cout / 1e9
        results[name] = {"ms": ms, "gflop": round(gflop, 1),
                         "tflops": round(gflop / ms, 2)}
        print(name, results[name], flush=True)

    # ---- structural ops ---------------------------------------------------
    x32 = jnp.asarray(rng.rand(1, 12, 102, 42, 64).astype(np.float32))
    up = jax.jit(lambda x: L.upsample3d(x, (2, 2, 2)))
    results["upsample_64ch_ms"] = timed(up, x32)
    xa = jnp.asarray(rng.rand(1, 24, 204, 84, 64).astype(np.float32))
    xb = jnp.asarray(rng.rand(1, 24, 204, 84, 32).astype(np.float32))
    cat = jax.jit(lambda a, b: jnp.concatenate([a, b], -1))
    results["concat_ms"] = timed(cat, xa, xb)
    mp = jax.jit(lambda x: L.max_pool3d(x, (2, 2, 2)))
    x_mp = jnp.asarray(rng.rand(1, 24, 204, 84, 32).astype(np.float32))
    results["maxpool_ms"] = timed(mp, x_mp)
    gridpool = jax.jit(lambda x: L.max_pool3d(x, (1, 2, 2)))
    results["gridpool_ms"] = timed(gridpool, x_full)
    print("structural:", {k: results[k] for k in
                          ("upsample_64ch_ms", "concat_ms", "maxpool_ms",
                           "gridpool_ms")}, flush=True)

    # ---- alternative formulations of the hottest conv --------------------
    # (1) shifted-matmul: y = sum_taps shift(x) @ W[tap] — contraction on
    # MXU with (N, C) @ (C, C) per tap, no conv lowering involved
    p32 = L.init_conv3d(key, (3, 3, 3), 32, 32)
    x = jnp.asarray(rng.rand(1, 24, 204, 84, 32).astype(np.float32))

    def shifted_matmul(p, x):
        w = p["w"]                          # (3,3,3,32,32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        z, y_, x_ = x.shape[1:4]
        acc = None
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    sl = xp[:, dz:dz + z, dy:dy + y_, dx:dx + x_, :]
                    t = jnp.einsum("bzyxc,cd->bzyxd", sl, w[dz, dy, dx],
                                   preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
        return jax.nn.relu(acc + p["b"])

    f = jax.jit(shifted_matmul)
    ms = timed(f, p32, x)
    results["conv32_shifted_matmul"] = {
        "ms": ms, "tflops": round(22.7 / ms, 2)}
    print("conv32_shifted_matmul", results["conv32_shifted_matmul"],
          flush=True)

    # (2) bf16 variant of the same
    f16 = jax.jit(lambda p, x: jax.nn.relu(L.conv3d(p, x, jnp.bfloat16)))
    ms = timed(f16, p32, x)
    results["conv32_bf16"] = {"ms": ms, "tflops": round(22.7 / ms, 2)}
    print("conv32_bf16", results["conv32_bf16"], flush=True)

    # (3) z-in-batch 2D conv (batched 2D with explicit z-taps)
    def z2d(p, x):
        w = p["w"]                          # (3,3,3,32,32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        z = x.shape[1]
        acc = None
        for dz in range(3):
            sl = xp[:, dz:dz + z].reshape(-1, *x.shape[2:])  # (b*z, y, x, c)
            t = jax.lax.conv_general_dilated(
                sl, w[dz], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        return jax.nn.relu(acc.reshape(x.shape[:4] + (32,)) + p["b"])

    ms = timed(jax.jit(z2d), p32, x)
    results["conv32_z2d"] = {"ms": ms, "tflops": round(22.7 / ms, 2)}
    print("conv32_z2d", results["conv32_z2d"], flush=True)

    # (4) channel-padded to 128 native conv
    p128 = L.init_conv3d(key, (3, 3, 3), 128, 128)
    x128 = jnp.asarray(rng.rand(1, 24, 204, 84, 128).astype(np.float32))
    fpad = jax.jit(lambda p, x: jax.nn.relu(L.conv3d(p, x)))
    ms = timed(fpad, p128, x128)
    results["conv128_at_fullres"] = {"ms": ms,
                                     "tflops": round(363.0 / ms, 2)}
    print("conv128_at_fullres", results["conv128_at_fullres"], flush=True)

    out = Path(__file__).parent / "backbone_profile.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
