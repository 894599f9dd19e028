"""Measure the dev-link transfer floor for the bench composition
(VERDICT r2 #3 "≥5 vol/s OR a measured demonstration that the link
floor is reached").

The shipped pipeline at worm1 scale moves, per volume:

  h2d: raw uint16 volume (Z,Y,X)            -> segmentation input
       f16 grid-res prob map                -> correction-stage input
       (coords / scalars ride the same RPCs, ~KB)
  d2h: f16 grid-res prob map                -> seg artifact
       uint8 full-res tracked labels        -> track artifact
       f32 padded coords (x2)               -> seg + track artifacts

plus ~2 RPC round-trips per volume after batching (seg: 4 volumes per
dispatch+fetch; track: 1 dispatch + 1/3 fetch).  This script measures
the link's actual h2d / d2h bandwidth and RPC latency with the SAME
transfer mechanics the pipeline uses (host numpy args riding a jitted
execute RPC; `jax.device_get` fetches — `block_until_ready` does not
block through the axon tunnel, see CLAUDE.md), then prints the floor
volumes/sec those measurements imply for the bench byte tally.  If the
recorded BENCH wall sits near this floor, the remaining gap to the
driver's 5 vol/s aspiration is the link, not the framework.

Run on the TPU:  python scripts/measure_link_floor.py
Writes scripts/link_floor.json; summary recorded in BASELINE.md.
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
from t3dct.utils import enable_compilation_cache  # noqa: E402

Z, Y, X = 24, 401, 168          # bench.py worm1-class volume
GRID = (1, 2, 2)
MB = 1024 * 1024


def _sync(x):
    # the only reliable barrier through the tunnel
    return jax.device_get(jnp.sum(x))


def measure_rpc_latency(n=20):
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.float32(0.0)
    _sync(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.device_get(f(x))
    return (time.perf_counter() - t0) / n


def measure_h2d(nbytes, n=6, lat=0.0):
    """Host numpy arg riding a jitted execute RPC (the pipeline's upload
    path), tiny result fetched — isolates the upload direction.

    The payload is incompressible (PRNG bytes): a compressing transport
    would otherwise overstate the bandwidth the pipeline's real
    image/label data sees.  Each iteration includes one RPC round trip;
    the measured ``lat`` is subtracted so the bandwidth is not
    latency-contaminated (the floor formula adds RPC latency
    separately)."""
    f = jax.jit(lambda a: jnp.sum(a[::4096].astype(jnp.float32)))
    host = np.random.default_rng(0).integers(0, 256, nbytes, np.uint8)
    jax.device_get(f(host))             # compile + first execute
    t0 = time.perf_counter()
    for _ in range(n):
        jax.device_get(f(host))
    dt = (time.perf_counter() - t0) / n
    return nbytes / max(dt - lat, 1e-9)


def measure_d2h(nbytes, n=6, lat=0.0):
    """Fetch device-resident arrays (the pipeline's artifact path).

    n DISTINCT device arrays, one fetch each: ``jax.Array`` caches the
    fetched host copy (``_npy_value``), so repeated ``device_get`` of
    ONE array only transfers the first time — timing that inflated the
    round-3 d2h number (ADVICE r3).  Content is PRNG bits
    (incompressible), generated on device so the setup itself does not
    ride the link."""
    f = jax.jit(lambda i: jax.random.bits(
        jax.random.PRNGKey(i), (nbytes,), jnp.uint8))
    devs = [f(jnp.uint32(i)) for i in range(n)]
    for d in devs:
        _sync(d)                        # materialized before timing
    t0 = time.perf_counter()
    for d in devs:
        np.asarray(jax.device_get(d))
    dt = (time.perf_counter() - t0) / n
    return nbytes / max(dt - lat, 1e-9)


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    lat = measure_rpc_latency()
    print(f"RPC round-trip: {lat * 1e3:.1f} ms", flush=True)
    bw_up = measure_h2d(8 * MB, lat=lat)
    bw_dn = measure_d2h(8 * MB, lat=lat)
    print(f"h2d {bw_up / MB:.1f} MB/s   d2h {bw_dn / MB:.1f} MB/s",
          flush=True)

    gz, gy, gx = -(-Z // GRID[0]), -(-Y // GRID[1]), -(-X // GRID[2])
    vol_u16 = Z * Y * X * 2
    prob_f16 = gz * gy * gx * 2
    labels_u8 = Z * Y * X
    coords = 192 * 3 * 4
    h2d = vol_u16 + prob_f16 + coords          # seg upload + track prob
    d2h = prob_f16 + labels_u8 + 2 * coords    # seg prob + track labels
    rpcs = 2.0                                  # after batching (see doc)

    floor_s = h2d / bw_up + d2h / bw_dn + rpcs * lat
    floor_vps = 1.0 / floor_s
    out = {
        "rpc_latency_ms": round(lat * 1e3, 2),
        "h2d_MBps": round(bw_up / MB, 1),
        "d2h_MBps": round(bw_dn / MB, 1),
        "h2d_bytes_per_vol": h2d,
        "d2h_bytes_per_vol": d2h,
        "rpcs_per_vol": rpcs,
        "floor_ms_per_vol": round(floor_s * 1e3, 1),
        "floor_vols_per_sec": round(floor_vps, 2),
    }
    print(json.dumps(out, indent=2))
    (Path(__file__).parent / "link_floor.json").write_text(
        json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
