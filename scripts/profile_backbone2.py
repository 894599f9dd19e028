"""Backbone profiling pass 2: true in-program layer costs + conv variants.

Pass 1 (scripts/backbone_profile.json) showed a ~1.8 ms per-call dispatch
floor through the tunnel, making standalone layer timings unreliable.
Here each truncated prefix of the backbone runs as ONE jitted program;
successive differences give the fused per-stage cost with the floor
amortized out.  Also tests XLA-level conv reformulations (z-stacked
conv2d: fold the 3 z-taps into input channels so the whole 3D conv is a
single native 2D conv with K=9*3C) before committing to a Pallas kernel.

Run on the TPU:  python scripts/profile_backbone2.py
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
    x_full = jnp.asarray(rng.rand(1, 24, 408, 168, 1).astype(np.float32))
    results = {}

    # ---- cumulative truncations of the real forward -----------------------
    # mirror StarDist3DNet.apply stage by stage
    def prefix(upto):
        def fwd(p, x):
            act = jax.nn.relu

            def conv(name, h):
                return act(L.conv3d(p[name], h))

            h = L.max_pool3d(x, cfg.grid)
            stages = []
            stages.append(("grid_pool", lambda h: h))
            h0 = conv("stem", h)
            stages.append(("stem", None))
            if upto == "grid_pool":
                return h
            h = h0
            if upto == "stem":
                return h
            skips = []
            for lvl in range(cfg.unet_n_depth):
                for i in range(2):
                    h = conv(f"down{lvl}_{i}", h)
                    if upto == f"down{lvl}_{i}":
                        return h
                skips.append(h)
                h = L.max_pool3d(h, cfg.unet_pool)
                if upto == f"pool{lvl}":
                    return h
            for i in range(2):
                h = conv(f"bottom_{i}", h)
            if upto == "bottom":
                return h
            for lvl in reversed(range(cfg.unet_n_depth)):
                h = L.upsample3d(h, cfg.unet_pool)
                h = jnp.concatenate([h, skips[lvl].astype(h.dtype)], -1)
                for i in range(2):
                    h = conv(f"up{lvl}_{i}", h)
                if upto == f"up{lvl}":
                    return h
            feat = conv("features", h)
            if upto == "features":
                return feat
            prob = jax.nn.sigmoid(L.conv3d(p["prob_head"], feat))
            dist = L.conv3d(p["dist_head"], feat)
            return prob, dist

        return jax.jit(fwd)

    stages = ["grid_pool", "stem", "down0_0", "down0_1", "pool0",
              "down1_0", "down1_1", "pool1", "bottom", "up1", "up0",
              "features", "heads"]
    cum = {}
    for s in stages:
        ms = timed(prefix(s), params, x_full)
        cum[s] = ms
        print(f"cum[{s}] = {ms:.2f} ms", flush=True)
    results["cumulative_ms"] = cum
    deltas = {}
    prev = 0.0
    for s in stages:
        deltas[s] = round(cum[s] - prev, 3)
        prev = cum[s]
    results["stage_delta_ms"] = deltas
    print("stage deltas:", deltas, flush=True)

    # ---- variant: z-stacked conv2d for the full-res 32->32 conv -----------
    p32 = L.init_conv3d(jax.random.PRNGKey(1), (3, 3, 3), 32, 32)
    x32 = jnp.asarray(rng.rand(1, 24, 204, 84, 32).astype(np.float32))

    def zstack_conv2d(p, x):
        w = p["w"]                              # (3,3,3,ci,co)
        b, z, yy, xx, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        stk = jnp.concatenate([xp[:, 0:z], xp[:, 1:z + 1], xp[:, 2:z + 2]],
                              axis=-1)          # (b, z, y, x, 3c)
        w2 = jnp.concatenate([w[0], w[1], w[2]], axis=2)  # (3,3,3c,co)
        out = jax.lax.conv_general_dilated(
            stk.reshape(b * z, yy, xx, 3 * c), w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(out.reshape(b, z, yy, xx, -1) + p["b"])

    ms = timed(jax.jit(zstack_conv2d), p32, x32)
    results["conv32_zstack2d"] = {"ms": ms, "tflops": round(22.7 / ms, 2)}
    print("conv32_zstack2d", results["conv32_zstack2d"], flush=True)

    # parity check vs conv3d
    ref = jax.jit(lambda p, x: jax.nn.relu(L.conv3d(p, x)))(p32, x32)
    got = jax.jit(zstack_conv2d)(p32, x32)
    err = float(jnp.max(jnp.abs(ref - got)))
    results["conv32_zstack2d_maxerr"] = err
    print("zstack parity maxerr", err, flush=True)

    # ---- variant: 1x1x1 head as plain matmul ------------------------------
    ph = L.init_conv3d(jax.random.PRNGKey(2), (1, 1, 1), 128, 96)
    x128 = jnp.asarray(rng.rand(1, 24, 204, 84, 128).astype(np.float32))

    def head_dot(p, x):
        w = p["w"][0, 0, 0]                     # (128, 96)
        return x.reshape(-1, 128) @ w + p["b"]

    ms = timed(jax.jit(head_dot), ph, x128)
    results["head_as_dot"] = {"ms": ms}
    print("head_as_dot", results["head_as_dot"], flush=True)

    # ---- variant: whole backbone with z-stacked conv2d everywhere ---------
    def fwd_zstack(p, x):
        act = jax.nn.relu

        def conv(name, h):
            w = p[name]["w"]
            if w.shape[0] == 1:                 # 1x1x1 heads
                return L.conv3d(p[name], h)
            return zstack_conv2d(p[name], h)[..., :w.shape[-1]]

        h = L.max_pool3d(x, cfg.grid)
        h = conv("stem", h)
        skips = []
        for lvl in range(cfg.unet_n_depth):
            for i in range(2):
                h = conv(f"down{lvl}_{i}", h)
            skips.append(h)
            h = L.max_pool3d(h, cfg.unet_pool)
        for i in range(2):
            h = conv(f"bottom_{i}", h)
        for lvl in reversed(range(cfg.unet_n_depth)):
            h = L.upsample3d(h, cfg.unet_pool)
            h = jnp.concatenate([h, skips[lvl].astype(h.dtype)], -1)
            for i in range(2):
                h = conv(f"up{lvl}_{i}", h)
        feat = conv("features", h)
        prob = jax.nn.sigmoid(L.conv3d(p["prob_head"], feat))
        dist = L.conv3d(p["dist_head"], feat)
        return prob, dist

    def fwd_ref(p, x):
        return net.apply(p, x)

    ms_ref = timed(jax.jit(fwd_ref), params, x_full)
    ms_z = timed(jax.jit(fwd_zstack), params, x_full)
    results["full_backbone_ms"] = ms_ref
    results["full_backbone_zstack_ms"] = ms_z
    pr, dr = jax.jit(fwd_ref)(params, x_full)
    pz, dz = jax.jit(fwd_zstack)(params, x_full)
    results["zstack_full_maxerr"] = float(
        max(jnp.max(jnp.abs(pr - pz)), jnp.max(jnp.abs(dr - dz))))
    print("full ref", ms_ref, "full zstack", ms_z,
          "maxerr", results["zstack_full_maxerr"], flush=True)

    out = Path(__file__).parent / "backbone_profile2.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
