"""Benchmark the fused Pallas conv vs the XLA conv at the backbone's hot
shapes (VERDICT r2 #2(c)).  Run on the TPU."""

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
from t3dct.ops.pallas_conv import conv3x3x3_fused   # noqa: E402

N_QUEUE = 30


def timed(fn, *args, n=N_QUEUE):
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
    results = {}
    shapes = [
        ("conv32", (24, 204, 84), 32, 32),
        ("conv96to32_up0", (24, 204, 84), 96, 32),
        ("feat_32to128", (24, 204, 84), 32, 128),
        ("conv192to64_up1", (12, 102, 42), 192, 64),
    ]
    for name, (z, y, x), ci, co in shapes:
        p = L.init_conv3d(jax.random.PRNGKey(0), (3, 3, 3), ci, co)
        xin = jnp.asarray(rng.rand(z, y, x, ci).astype(np.float32))
        gflop = 2 * z * y * x * 27 * ci * co / 1e9

        xla = jax.jit(lambda p, v: jax.nn.relu(L.conv3d(p, v[None])))
        ms_xla = timed(xla, p, xin)

        err = None
        rec = {"gflop": round(gflop, 1), "xla_ms": ms_xla,
               "xla_tflops": round(gflop / ms_xla, 1)}
        for ty in (None, 12, 34, 51, 102):
            if ty is not None and y % ty:
                continue
            try:
                pallas = jax.jit(lambda v, w, b: conv3x3x3_fused(
                    v, w, b, ty=ty))
                ms = timed(pallas, xin, p["w"], p["b"])
                if err is None:
                    want = xla(p, xin)[0]
                    got = pallas(xin, p["w"], p["b"])
                    err = float(jnp.max(jnp.abs(want - got)))
                rec[f"pallas_ty{ty}_ms"] = round(ms, 3)
            except Exception as e:
                rec[f"pallas_ty{ty}_err"] = str(e)[:200]
        rec["maxerr"] = err
        results[name] = rec
        print(name, rec, flush=True)

    out = Path(__file__).parent / "pallas_conv_profile.json"
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
