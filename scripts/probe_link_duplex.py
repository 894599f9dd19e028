"""Measure the tunnel's ACTUAL duplexity and multi-stream scaling.

BASELINE.md's {serial, duplex} link-floor bracket brackets the truth but
does not resolve it: ``duplex`` assumes h2d and d2h overlap perfectly,
``serial`` assumes none.  The shipped pipeline already issues uploads
(loader threads), downloads (saver threads) and dispatches concurrently,
and its measured wall sits at ~116% of the SERIAL floor — so either the
tunnel serializes RPCs (serial floor is the real floor; nothing left to
win) or the pipeline stalls somewhere (up to 2.3x headroom).

This probe times, with distinct incompressible buffers per transfer
(methodology of scripts/measure_link_floor.py):
  1. solo h2d and solo d2h rates (baseline);
  2. h2d + d2h CONCURRENTLY (one thread each) — true duplex test;
  3. 2 concurrent h2d streams / 2 concurrent d2h streams — per-stream
     vs link-wide bandwidth caps.

Run on the TPU:  python scripts/probe_link_duplex.py
Writes scripts/link_duplex_probe.json.
"""

import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax                                      # noqa: E402
import jax.numpy as jnp                         # noqa: E402

import t3dct                                    # noqa: F401,E402
from t3dct.utils import enable_compilation_cache    # noqa: E402

enable_compilation_cache()

MB = 1 << 20
NBYTES = 3 * MB       # ~ one bench volume of traffic per transfer
N = 6                 # transfers per timed leg


def make_uploader():
    fu = jax.jit(lambda a: jnp.sum(a[::4096].astype(jnp.float32)))
    rng = np.random.default_rng(0)
    hosts = [rng.integers(0, 256, NBYTES, np.uint8) for _ in range(2 * N)]
    jax.device_get(fu(hosts[0]))

    def upload(leg):
        t0 = time.perf_counter()
        for h in hosts[leg * N:(leg + 1) * N]:
            jax.device_get(fu(h))
        return time.perf_counter() - t0
    return upload


def make_downloader():
    # 4 legs of N DISTINCT device arrays: jax.Array caches the fetched
    # host copy, so every timed leg must fetch arrays never fetched
    # before (the round-3 link-floor bug, measure_link_floor.py)
    fd = jax.jit(lambda i: jax.random.bits(jax.random.PRNGKey(i),
                                           (NBYTES,), jnp.uint8))
    devs = [fd(jnp.uint32(i)) for i in range(4 * N)]
    for d in devs:
        jax.device_get(jnp.sum(d))

    def download(leg):
        t0 = time.perf_counter()
        for d in devs[leg * N:(leg + 1) * N]:
            np.asarray(jax.device_get(d))
        return time.perf_counter() - t0
    return download


def lat_probe():
    f0 = jax.jit(lambda a: a + 1.0)
    x0 = jnp.float32(0.0)
    jax.device_get(f0(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(f0(x0))
    return (time.perf_counter() - t0) / 10


def concurrent(*fns):
    outs = [None] * len(fns)
    def run(i, fn):
        outs[i] = fn()
    ths = [threading.Thread(target=run, args=(i, f))
           for i, f in enumerate(fns)]
    t0 = time.perf_counter()
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    return time.perf_counter() - t0, outs


def main():
    print("devices:", jax.devices(), flush=True)
    lat = lat_probe()
    up = make_uploader()
    dn = make_downloader()

    solo_up = up(0)
    solo_dn = dn(0)
    bw_up = N * NBYTES / max(solo_up - N * lat, 1e-9) / MB
    bw_dn = N * NBYTES / max(solo_dn - N * lat, 1e-9) / MB
    print(f"lat {lat*1e3:.1f} ms; solo h2d {bw_up:.1f} MB/s "
          f"({solo_up:.2f}s), solo d2h {bw_dn:.1f} MB/s ({solo_dn:.2f}s)",
          flush=True)

    # duplex: one upload leg + one download leg concurrently
    wall_dx, (t_up, t_dn) = concurrent(lambda: up(1), lambda: dn(1))
    # perfect duplex => wall ≈ max(solo legs); serialized => ≈ sum
    print(f"duplex wall {wall_dx:.2f}s (legs up {t_up:.2f} dn {t_dn:.2f}; "
          f"serial sum would be {solo_up + solo_dn:.2f}s, "
          f"perfect overlap {max(solo_up, solo_dn):.2f}s)", flush=True)

    # 2 concurrent upload streams over distinct buffers (uploads are
    # not cached — re-sending leg 0's hosts is a fresh transfer)
    wall_up2, _ = concurrent(lambda: up(0), lambda: up(1))
    wall_dn2, _ = concurrent(lambda: dn(2), lambda: dn(3))
    print(f"2x h2d wall {wall_up2:.2f}s (1x was {solo_up:.2f}s); "
          f"2x d2h wall {wall_dn2:.2f}s (1x was {solo_dn:.2f}s)", flush=True)

    dup_ratio = (solo_up + solo_dn) / wall_dx
    out = {
        "nbytes": NBYTES, "n_per_leg": N, "lat_ms": round(lat * 1e3, 1),
        "solo_h2d_MBps": round(bw_up, 1), "solo_d2h_MBps": round(bw_dn, 1),
        "duplex_wall_s": round(wall_dx, 3),
        "duplex_serial_sum_s": round(solo_up + solo_dn, 3),
        "duplex_perfect_s": round(max(solo_up, solo_dn), 3),
        "duplex_speedup_vs_serial": round(dup_ratio, 2),
        "h2d_2streams_wall_s": round(wall_up2, 3),
        "h2d_1stream_wall_s": round(solo_up, 3),
        "d2h_2streams_wall_s": round(wall_dn2, 3),
        "d2h_1stream_wall_s": round(solo_dn, 3),
        "verdict": ("duplex" if dup_ratio > 1.6 else
                    "partial" if dup_ratio > 1.2 else "serialized"),
    }
    (Path(__file__).parent / "link_duplex_probe.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
