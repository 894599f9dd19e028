"""Micro-profile of the up-block formulations (run on TPU)."""

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


def timed(fn, *args, n=30):
    out = fn(*args)
    jax.device_get(jnp.sum(out))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        jax.device_get(sum(jnp.sum(o) for o in outs))
        best.append((time.perf_counter() - t0) / n)
    return float(np.median(best) * 1e3)


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.rand(1, 12, 102, 42, 64).astype(np.float32))
    skip = jnp.asarray(rng.rand(1, 24, 204, 84, 32).astype(np.float32))
    wph = jnp.asarray(rng.rand(3, 3, 3, 64, 256).astype(np.float32) * .1)
    w8 = jnp.asarray(rng.rand(8, 64, 256).astype(np.float32) * .1)
    wb = jnp.asarray(rng.rand(3, 3, 3, 32, 32).astype(np.float32) * .1)

    # (a) phase conv 3x3x3 dense 64->256 at coarse grid
    f = jax.jit(lambda h: L.conv3d({"w": wph}, h))
    print("phase_conv3_dense_ms", timed(f, h), flush=True)

    # (b) 8 shifted matmuls (2-tap-per-axis exact footprint)
    def shifted(h):
        hp = jnp.pad(h, ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))
        z, y, x = h.shape[1:4]
        acc = None
        k = 0
        for dz in range(2):
            for dy in range(2):
                for dx in range(2):
                    sl = hp[:, dz:dz + z, dy:dy + y, dx:dx + x, :]
                    t = jnp.einsum("bzyxc,cd->bzyxd", sl, w8[k],
                                   preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
                    k += 1
        return acc

    print("phase_8matmul_ms", timed(jax.jit(shifted), h), flush=True)

    # (c) interleave transpose alone
    yc = jnp.asarray(rng.rand(1, 12, 102, 42, 256).astype(np.float32))

    def interleave(yc):
        b, zc, ycc, xc, _ = yc.shape
        t = yc.reshape(b, zc, ycc, xc, 2, 2, 2, 32)
        return jnp.transpose(t, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
            b, zc * 2, ycc * 2, xc * 2, 32)

    print("interleave_ms", timed(jax.jit(interleave), yc), flush=True)

    # (d) skip conv 32->32 at fine grid
    f = jax.jit(lambda s: L.conv3d({"w": wb}, s))
    print("skip_conv_ms", timed(f, skip), flush=True)

    # (e) direct reference: upsample + concat + conv96->32
    w96 = jnp.asarray(rng.rand(3, 3, 3, 96, 32).astype(np.float32) * .1)

    def direct(h, skip):
        up = L.upsample3d(h, (2, 2, 2))
        cat = jnp.concatenate([up, skip], -1)
        return L.conv3d({"w": w96}, cat)

    print("direct_up_concat_conv_ms", timed(jax.jit(direct), h, skip),
          flush=True)

    # (f) fused b+interleaved-a in one jit (what the net actually runs)
    def fused(h, skip):
        return interleave(shifted(h)) + L.conv3d({"w": wb}, skip)

    print("fused_shifted_ms", timed(jax.jit(fused), h, skip), flush=True)


if __name__ == "__main__":
    main()
