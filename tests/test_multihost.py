"""Multi-process multi-host runtime test (parallel/multihost.py).

Spawns TWO real OS processes, each a separate JAX "host" with 2 local CPU
devices, joined through ``jax.distributed`` on a localhost coordinator —
the same code path a TPU pod slice uses over DCN.  Each process shards its
local slice of the data, assembles the global array with
``global_batch_from_local``, and runs one jitted computation over the
4-device global mesh; both processes must agree with the single-process
NumPy value.

The reference is single-GPU (SURVEY §2.3) — no counterpart exists there.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    pid, n, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)   # 2 local devices/host
    sys.path.insert(0, %r)
    import importlib
    importlib.import_module("3deecelltracker_tpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from t3dct.parallel import multihost

    multihost.initialize("localhost:" + port, num_processes=n,
                         process_id=pid)
    assert multihost.process_count() == n, jax.process_count()
    assert multihost.process_index() == pid
    devices = jax.devices()
    assert len(devices) == 2 * n, devices
    mesh = Mesh(np.array(devices), ("data",))

    full = np.arange(24, dtype=np.float32).reshape(8, 3)
    my_items = multihost.local_shard(list(range(8)))
    assert len(my_items) == 4
    garr = multihost.global_batch_from_local(mesh, full[my_items],
                                             P("data"))
    assert garr.shape == (8, 3)

    w = jnp.arange(3, dtype=jnp.float32) + 0.5
    fn = jax.jit(lambda x: jnp.mean((x @ w) ** 2),
                 in_shardings=NamedSharding(mesh, P("data")))
    loss = float(fn(garr))
    with open(out_path, "w") as fh:
        fh.write(f"{pid} {len(my_items)} {loss:.6f}")
""" % (REPO,))


def test_package_import_leaves_backend_uninitialized():
    """jax.distributed.initialize() must run before ANY backend use, so
    importing this package must not create device arrays (regression: a
    module-level jnp scalar in ops/watershed.py used to initialize the
    backend, breaking multi-host startup)."""
    code = (
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import importlib\n"
        "importlib.import_module('3deecelltracker_tpu')\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, dict(xla_bridge._backends)\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_runtime(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # conftest's 8-device flag
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}.txt"
        procs.append((subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True), out))
    results = []
    for p, out in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q, _ in procs:
                q.kill()
            pytest.fail("multihost worker hung")
        if p.returncode != 0 and "UNIMPLEMENTED" in stderr:
            pytest.skip(f"jax.distributed unsupported here: {stderr[-200:]}")
        assert p.returncode == 0, f"worker failed:\n{stderr[-2000:]}"
        results.append(out.read_text())

    full = np.arange(24, dtype=np.float32).reshape(8, 3)
    w = np.arange(3, dtype=np.float32) + 0.5
    expected = float(np.mean((full @ w) ** 2))
    for pid, text in enumerate(results):
        got_pid, n_items, loss = text.split()
        assert int(got_pid) == pid
        assert int(n_items) == 4
        assert abs(float(loss) - expected) < 1e-3 * expected


SEG_WORKER = textwrap.dedent("""
    import sys
    pid, n, port, base = (int(sys.argv[1]), int(sys.argv[2]),
                          sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    sys.path.insert(0, %r)
    import importlib
    importlib.import_module("3deecelltracker_tpu")
    import numpy as np
    from t3dct.parallel import multihost
    from t3dct.config import StarDistConfig
    from t3dct.engine.stardist import StarDist3D, predict_and_save
    from t3dct.io.imageio import get_t_range

    multihost.initialize("localhost:" + port, num_processes=n,
                         process_id=pid)
    assert multihost.process_count() == n

    images_path = base + "/raw/raw_t%%03i_z*.tif"
    t_max, t_min = get_t_range(images_path)
    assert (t_min, t_max) == (1, 4)
    my_vols = multihost.local_shard(list(range(t_min, t_max + 1)))
    assert len(my_vols) == 2

    # identical model on every host (same seed)
    cfg = StarDistConfig(n_rays=8, grid=(1, 2, 2),
                         anisotropy=(2.0, 1.0, 1.0), unet_n_depth=1,
                         unet_n_filter_base=4, net_conv_after_unet=8,
                         train_patch_size=(8, 32, 32), prob_thresh=0.7)
    import jax as _jax
    model = StarDist3D(cfg, max_candidates=16, render_box=(5, 9, 9),
                       rng=_jax.random.PRNGKey(0))
    predict_and_save(images_path, model, base + "/results",
                     volumes=my_vols)
    with open(base + "/done%%d.txt" %% pid, "w") as fh:
        fh.write(" ".join(map(str, my_vols)))
""" % (REPO,))


@pytest.mark.slow
def test_two_process_predict_and_save_shared_tree(tmp_path):
    """VERDICT r2 #4: two processes (hosts) run the SHIPPED segmentation
    driver over disjoint work-list shards (multihost.local_shard) into
    one results tree; the union must cover every volume exactly once,
    with auto_vol1 rendered only by the shard holding t_min."""
    from t3dct.io.imageio import save_label_slices

    raw_dir = tmp_path / "raw"
    rng = np.random.RandomState(0)
    for t in range(1, 5):
        vol = (rng.rand(32, 32, 8) * 40000).astype(np.uint16)
        save_label_slices(vol, raw_dir, "raw_t%03i_z%04i.tif", t,
                          use_8_bit=False, compression=None)

    script = tmp_path / "seg_worker.py"
    script.write_text(SEG_WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost seg worker hung")
        if p.returncode != 0 and "UNIMPLEMENTED" in stderr:
            pytest.skip(f"jax.distributed unsupported here: {stderr[-200:]}")
        assert p.returncode == 0, f"worker failed:\n{stderr[-2000:]}"

    shards = [set((tmp_path / f"done{pid}.txt").read_text().split())
              for pid in range(2)]
    assert shards[0] == {"1", "2"} and shards[1] == {"3", "4"}
    results = tmp_path / "results"
    for t in range(1, 5):
        assert (results / "seg" / f"coords{t:06d}.npy").exists(), t
        assert (results / "seg" / f"prob{t:06d}.npy").exists(), t
    # only the t_min shard rendered auto_vol1
    assert (results / "auto_vol1" / "auto_vol1_z0001.tif").exists()
