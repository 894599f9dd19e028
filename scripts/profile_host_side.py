"""Attribute the HOST side of the device-handoff composition wall.

Round-5 finding: `segment_and_track(handoff="device")` is host-core-bound
in this container (361 ms/vol wall vs 157 ms serial link floor and 34 ms
device compute).  The host work is spread over loader/saver threads, so
cProfile (main-thread-only) misses it — instead this script runs a
stack SAMPLER over ``sys._current_frames()`` (~200 Hz) during one timed
composition pass.  On a 1-core host the sampled GIL holder approximates
where the core's time goes, across every thread.

Run on the TPU:  python scripts/profile_host_side.py
Writes scripts/host_profile.json (top self/inclusive frames + thread mix).
"""

import json
import sys
import tempfile
import threading
import time
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import t3dct  # noqa: F401,E402
from t3dct.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import bench  # noqa: E402  (the bench scene/recipe — same workload)


class Sampler:
    """~200 Hz all-thread stack sampler (self + inclusive frame counts)."""

    def __init__(self, period=0.005):
        self.period = period
        self.self_counts = Counter()
        self.incl_counts = Counter()
        self.thread_counts = Counter()
        self.n = 0
        self._stop = threading.Event()
        self._th = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        me = threading.get_ident()
        names = {}
        while not self._stop.is_set():
            for t in threading.enumerate():
                names[t.ident] = t.name
            for tid, frame in sys._current_frames().items():
                if tid == me:
                    continue
                self.n += 1
                self.thread_counts[names.get(tid, str(tid))] += 1
                seen = set()
                top = True
                while frame is not None:
                    co = frame.f_code
                    key = (f"{Path(co.co_filename).name}:"
                           f"{frame.f_lineno}:{co.co_name}")
                    fkey = f"{Path(co.co_filename).name}:{co.co_name}"
                    if top:
                        self.self_counts[key] += 1
                        top = False
                    if fkey not in seen:
                        seen.add(fkey)
                        self.incl_counts[fkey] += 1
                    frame = frame.f_back
            time.sleep(self.period)

    def __enter__(self):
        self._th.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._th.join()


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    work = Path(tempfile.mkdtemp(prefix="t3dct_prof_"))
    try:
        raw_dir = work / "raw"
        raw_dir.mkdir(parents=True)
        images_path, centers_by_t, lab1 = bench.make_recording(raw_dir)
        model, _ = bench.get_trained_model(raw_dir, lab1)
        results = work / "results"
        t_seg = bench.bench_seg(images_path, results, model)
        ffn_w = bench.train_ffn(results, work)
        t_warm, _ = bench.bench_composition(
            images_path, work / "results_w", lab1, model, ffn_w,
            handoff="device")
        print(f"warm composition {t_warm * 1e3:.0f} ms/vol", flush=True)

        t0 = time.perf_counter()
        with Sampler() as s:
            per_vol, _ = bench.bench_composition(
                images_path, work / "results_p", lab1, model, ffn_w,
                handoff="device")
        wall = time.perf_counter() - t0
        print(f"profiled composition {per_vol * 1e3:.0f} ms/vol "
              f"({s.n} samples over {wall:.1f}s)", flush=True)

        ms_per_sample = wall * 1e3 / max(s.n, 1)

        def top(counter, k=30):
            return [{"frame": f, "samples": c,
                     "ms_per_vol": round(c * ms_per_sample / bench.N_VOLS, 1)}
                    for f, c in counter.most_common(k)]

        out = {"wall_ms_per_vol": round(per_vol * 1e3, 1),
               "warm_ms_per_vol": round(t_warm * 1e3, 1),
               "seg_pass_ms_per_vol": round(t_seg * 1e3, 1),
               "n_vols": bench.N_VOLS, "n_samples": s.n,
               "note": ("sampled GIL-holder time; ms_per_vol spreads total "
                        "sampled wall over the recording.  Threads blocked "
                        "in C (RPC wait, file read) show at their blocking "
                        "frame — frames in jax dispatch/device_get are LINK "
                        "wait, not host compute"),
               "threads": dict(s.thread_counts.most_common()),
               "top_self": top(s.self_counts),
               "top_inclusive": top(s.incl_counts, 40)}
        (Path(__file__).parent / "host_profile.json").write_text(
            json.dumps(out, indent=2))
        print(json.dumps({"top_self": out["top_self"][:12]}, indent=2))
        print("wrote scripts/host_profile.json", flush=True)
    finally:
        import shutil
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
