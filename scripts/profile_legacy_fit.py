"""Profile the fused legacy fit programs at bench shapes (round 3).

Times ``legacy_fit_and_predict`` (single) vs ``legacy_fit_members``
(vmapped E=3) device-side through the tunnel using the queued-calls
method (CLAUDE.md: block_until_ready does not block through axon; queue N
calls then fetch one reduction), to locate the ensemble3 fused path's
~1 s/vol excess over single (scripts/legacy_track_bench.json).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import t3dct  # noqa: F401
from t3dct.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from t3dct.engine.legacy import (legacy_fit_and_predict,
                                 legacy_fit_members,
                                 legacy_correction_and_render)  # noqa: F401
from t3dct.models.ffn import FFN, init_ffn

M = 128          # max_cells in the bench
N_REAL = 100
REPS = 5
MAXITER = 20

rng = np.random.default_rng(0)
ffn = FFN()
params, state = init_ffn(jax.random.PRNGKey(0))

pts = rng.uniform(0, 100, (N_REAL, 3)).astype(np.float32)
pad = np.full((M, 3), 1e6, np.float32)
pad[:N_REAL] = pts
mask = np.zeros((M,), bool)
mask[:N_REAL] = True
tgt = pad + rng.normal(0, 1, pad.shape).astype(np.float32)


def timeit(label, fn, n=10):
    # warm up AND drain: dispatch is async through the tunnel, so the
    # compile + first-execute program load must be awaited or it lands
    # inside the timed region (~1-9 s/program)
    out = fn()
    jax.device_get(jnp.sum(out[0]) if isinstance(out, tuple)
                   else jnp.sum(out))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    s = jnp.sum(jnp.stack([jnp.sum(o[0]) if isinstance(o, tuple) else
                           jnp.sum(o) for o in outs]))
    jax.device_get(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt * 1e3:.1f} ms")
    return dt


def single():
    return legacy_fit_and_predict(params, state, pad, mask, tgt, mask,
                                  pad, 3.0, 3.0, rep=REPS,
                                  max_iteration=MAXITER)


i3 = np.stack([pad] * 3)
m3 = np.stack([mask] * 3)
t3 = np.stack([pad] * 3)


def members3():
    return legacy_fit_members(params, state, i3, m3, tgt, mask, t3,
                              3.0, 3.0, rep=REPS, max_iteration=MAXITER)


t_single = timeit("single fit (rep5 x EM20)", single)
t_mem = timeit("members3 fit (vmapped E=3)", members3)
print(f"vmap overhead factor: {t_mem / t_single:.2f}x for 3x work")
