"""Attack the backbone's MXU-column-bound convs (VERDICT r4 #3 residual).

Context: the seg program runs at 8.2% of v5e bf16 peak because the
backbone's 32-output-channel 3x3x3 convs measure only ~8 TF/s under
XLA's conv lowering (scripts/pallas_conv_profile.json), while the same
conv at 128 channels reaches ~74 TF/s.  Round-4's Pallas fused conv
never compiled — every attempt died on a tunnel HTTP 500 that masked
the real Mosaic diagnostic.  This round a TRIVIAL pallas kernel
compiles and runs through the same tunnel, so the blocker is
construct-specific, not environmental.  This script:

1. probes a ladder of Pallas constructs (pipelined block passthrough,
   in-kernel dot_general, 9-shifted-view tap dots, the manual-DMA
   kernel) to pin down exactly which constructs Mosaic accepts;
2. times two PURE-XLA reformulations that sidestep Mosaic entirely:
   a. ``conv9gemm``  — z-taps packed into channels (K = 3*C_in), then
      9 (dy, dx) shifted views each hit the MXU as one big implicit
      GEMM (M = z*y*x);
   b. ``copad``      — zero-pad C_out 32 -> 64/128 so XLA's conv tiles
      full MXU columns, then slice (trades 2-4x FLOPs for the measured
      ~9x per-FLOP efficiency gap).

Each candidate is correctness-checked against lax.conv_general_dilated.
Run on the TPU:  python scripts/probe_conv_fast.py
Writes scripts/conv_fast_probe.json.
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax                                      # noqa: E402
import jax.numpy as jnp                         # noqa: E402
from jax import lax                             # noqa: E402

import t3dct                                    # noqa: F401,E402
from t3dct.utils import enable_compilation_cache    # noqa: E402
from t3dct.models import layers as L            # noqa: E402

enable_compilation_cache()

N_QUEUE = 30
SHAPE = (24, 204, 84)       # the hot full-resolution backbone shape


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


def baseline(p, x):
    return jax.nn.relu(L.conv3d(p, x[None]))[0]


# ---- pure-XLA candidate 1: 9-view implicit GEMM ---------------------------

@functools.partial(jax.jit, static_argnames=("relu",))
def conv9gemm(x, w, b, relu=True):
    """SAME 3x3x3 conv on one (z, y, x, c) volume as 9 shifted-view GEMMs
    with the 3 z-taps packed into K (K = 3*C_in, M = z*y*x)."""
    z, y, xl, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
    vz = jnp.concatenate([xp[0:z], xp[1:z + 1], xp[2:z + 2]], axis=-1)
    w9 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * ci, co)
    acc = jnp.zeros((z * y * xl, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            v = lax.slice(vz, (0, dy, dx, 0), (z, dy + y, dx + xl, 3 * ci))
            acc = acc + jnp.dot(v.reshape(z * y * xl, 3 * ci), w9[dy, dx],
                                preferred_element_type=jnp.float32)
    out = acc.reshape(z, y, xl, co) + b
    return jnp.maximum(out, 0.0) if relu else out


# ---- pure-XLA candidate 2: output-channel padding --------------------------

def make_copad(p, co_pad):
    w = p["w"]
    co = w.shape[-1]
    wp = jnp.pad(w, ((0, 0),) * 4 + ((0, co_pad - co),))
    bp = jnp.pad(p["b"], (0, co_pad - co))
    pp = {"w": wp, "b": bp}

    @jax.jit
    def run(x):
        return jax.nn.relu(L.conv3d(pp, x[None]))[0, ..., :co]
    return run


# ---- pallas construct ladder ----------------------------------------------

def probe(name, build, results):
    try:
        ms, err = build()
        results[name] = {"ok": True, "ms": round(ms, 3),
                         "maxerr": None if err is None else float(err)}
        print(f"{name}: OK {ms:.3f} ms maxerr={err}", flush=True)
    except Exception as e:  # noqa: BLE001
        results[name] = {"ok": False, "err": str(e)[:400]}
        print(f"{name}: FAIL {str(e)[:200]}", flush=True)


def pallas_ladder(x, w, b, ref, results):
    from jax.experimental import pallas as pl

    z, y, xl, ci = x.shape
    co = w.shape[-1]
    ty = 12
    gy = y // ty

    # A: pipelined block passthrough (non-128 minor dim C=32)
    def a():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0
        f = jax.jit(lambda v: pl.pallas_call(
            k, grid=(z, gy),
            in_specs=[pl.BlockSpec((1, ty, xl, ci),
                                   lambda iz, iy: (iz, iy, 0, 0))],
            out_specs=pl.BlockSpec((1, ty, xl, ci),
                                   lambda iz, iy: (iz, iy, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((z, y, xl, ci), jnp.float32),
        )(v))
        ms = timed(f, x)
        err = jnp.abs(f(x) - (x + 1.0)).max()
        return ms, jax.device_get(err)
    probe("pallas_A_passthrough", a, results)

    # B: in-kernel dot_general on the 4D block (1x1 conv essentially)
    w1 = jnp.asarray(np.random.RandomState(1).rand(ci, co), jnp.float32)

    def bld_b():
        def k(x_ref, w_ref, o_ref):
            o_ref[...] = lax.dot_general(
                x_ref[...], w_ref[...],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        f = jax.jit(lambda v, wv: pl.pallas_call(
            k, grid=(z, gy),
            in_specs=[pl.BlockSpec((1, ty, xl, ci),
                                   lambda iz, iy: (iz, iy, 0, 0)),
                      pl.BlockSpec((ci, co), lambda iz, iy: (0, 0))],
            out_specs=pl.BlockSpec((1, ty, xl, co),
                                   lambda iz, iy: (iz, iy, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((z, y, xl, co), jnp.float32),
        )(v, wv))
        ms = timed(f, x, w1)
        err = jnp.abs(f(x, w1) - jnp.einsum("zyxc,co->zyxo", x, w1)).max()
        return ms, jax.device_get(err)
    probe("pallas_B_dotgeneral", bld_b, results)

    # B2: in-kernel reshape fold to 2D then plain dot (the shape-cast risk)
    def bld_b2():
        def k(x_ref, w_ref, o_ref):
            v = x_ref[...].reshape(ty * xl, ci)
            o_ref[...] = jnp.dot(v, w_ref[...],
                                 preferred_element_type=jnp.float32
                                 ).reshape(1, ty, xl, co)
        f = jax.jit(lambda v, wv: pl.pallas_call(
            k, grid=(z, gy),
            in_specs=[pl.BlockSpec((1, ty, xl, ci),
                                   lambda iz, iy: (iz, iy, 0, 0)),
                      pl.BlockSpec((ci, co), lambda iz, iy: (0, 0))],
            out_specs=pl.BlockSpec((1, ty, xl, co),
                                   lambda iz, iy: (iz, iy, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((z, y, xl, co), jnp.float32),
        )(v, wv))
        ms = timed(f, x, w1)
        err = jnp.abs(f(x, w1) - jnp.einsum("zyxc,co->zyxo", x, w1)).max()
        return ms, jax.device_get(err)
    probe("pallas_B2_reshape_dot", bld_b2, results)

    # C: full conv — 9 shifted-view inputs, 9 in-kernel dot_generals
    def bld_c():
        w9 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * ci, co)

        def k(*refs):
            o_ref = refs[-1]
            w_ref = refs[9]
            acc = None
            for i in range(9):
                d = lax.dot_general(
                    refs[i][...], w_ref[i // 3, i % 3],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_ref[...] = jnp.maximum(acc + refs[10][...], 0.0)

        @jax.jit
        def f(v, wv, bv):
            xp = jnp.pad(v, ((1, 1), (1, 1), (1, 1), (0, 0)))
            vz = jnp.concatenate([xp[0:z], xp[1:z + 1], xp[2:z + 2]],
                                 axis=-1)
            views = [lax.slice(vz, (0, dy, dx, 0),
                               (z, dy + y, dx + xl, 3 * ci))
                     for dy in range(3) for dx in range(3)]
            return pl.pallas_call(
                k, grid=(z, gy),
                in_specs=[pl.BlockSpec((1, ty, xl, 3 * ci),
                                       lambda iz, iy: (iz, iy, 0, 0))
                          for _ in range(9)]
                + [pl.BlockSpec((3, 3, 3 * ci, co),
                                lambda iz, iy: (0, 0, 0, 0)),
                   pl.BlockSpec((co,), lambda iz, iy: (0,))],
                out_specs=pl.BlockSpec((1, ty, xl, co),
                                       lambda iz, iy: (iz, iy, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((z, y, xl, co),
                                               jnp.float32),
            )(*views, wv, bv)
        ms = timed(f, x, w9, b)
        err = jnp.abs(f(x, w9, b) - ref).max()
        return ms, jax.device_get(err)
    probe("pallas_C_9view_conv", bld_c, results)

    # E: the round-4 manual-DMA kernel, re-recorded now the tunnel works
    def bld_e():
        from t3dct.ops.pallas_conv import conv3x3x3_fused
        f = jax.jit(lambda v, wv, bv: conv3x3x3_fused(v, wv, bv, ty=ty))
        ms = timed(f, x, w, b)
        err = jnp.abs(f(x, w, b) - ref).max()
        return ms, jax.device_get(err)
    probe("pallas_E_manual_dma", bld_e, results)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    z, y, xl = SHAPE
    results = {"shape": list(SHAPE)}

    for name, ci, co in (("c32_to_c32", 32, 32), ("c32_to_c128", 32, 128)):
        p = L.init_conv3d(jax.random.PRNGKey(0), (3, 3, 3), ci, co)
        x = jnp.asarray(rng.rand(z, y, xl, ci).astype(np.float32))
        gflop = 2 * z * y * xl * 27 * ci * co / 1e9
        base = jax.jit(lambda xv, pv=p: baseline(pv, xv))
        ms_base = timed(base, x)
        ref = base(x)
        rec = {"gflop": round(gflop, 1), "xla_ms": round(ms_base, 3),
               "xla_tflops": round(gflop / ms_base, 1)}

        ms_g = timed(lambda v: conv9gemm(v, p["w"], p["b"]), x)
        err_g = float(jax.device_get(
            jnp.abs(conv9gemm(x, p["w"], p["b"]) - ref).max()))
        rec["gemm9_ms"] = round(ms_g, 3)
        rec["gemm9_tflops"] = round(gflop / ms_g, 1)
        rec["gemm9_maxerr"] = err_g

        if co == 32:
            for cop in (64, 128):
                f = make_copad(p, cop)
                ms_c = timed(f, x)
                err_c = float(jax.device_get(jnp.abs(f(x) - ref).max()))
                rec[f"copad{cop}_ms"] = round(ms_c, 3)
                rec[f"copad{cop}_eff_tflops"] = round(gflop / ms_c, 1)
                rec[f"copad{cop}_maxerr"] = err_c
        results[name] = rec
        print(name, json.dumps(rec), flush=True)

    # pallas ladder at the c32 shape
    p = L.init_conv3d(jax.random.PRNGKey(0), (3, 3, 3), 32, 32)
    x = jnp.asarray(rng.rand(z, y, xl, 32).astype(np.float32))
    ref = jax.jit(lambda xv: baseline(p, xv))(x)
    pallas_ladder(x, p["w"], p["b"], ref, results)

    (Path(__file__).parent / "conv_fast_probe.json").write_text(
        json.dumps(results, indent=2))
    print("wrote scripts/conv_fast_probe.json", flush=True)


if __name__ == "__main__":
    main()
