"""Multi-device (virtual 8-CPU mesh) tests: sharded training step, ensemble
fan-out parity with the serial loop, tile-parallel and spatially-sharded
inference equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from t3dct.models.ffn import FFN
from t3dct.models.unet3d import UNet3D
from t3dct.parallel.mesh import make_mesh, auto_mesh_shape
from t3dct.parallel.training import make_sharded_unet_train_step, \
    make_unet_train_step
from t3dct.parallel.ensemble import (ensemble_track_step,
                                     make_sharded_ensemble_step,
                                     pad_members)
from t3dct.parallel.spatial import (make_tile_parallel_predict,
                                    make_spatially_sharded_apply)
from t3dct.engine.tracker import track_step
from t3dct.ops.tiling import plan_tiles
from t3dct.ops.trim import trim_mean


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNet3D(variant="a", tile_shape=(16, 16, 4), pool=(2, 2, 1),
                   down_filters=((4, 4),), up_filters=((4, 4),),
                   head_filters=(4,))
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state


def test_auto_mesh_shape():
    assert auto_mesh_shape(8) == (2, 4)
    assert auto_mesh_shape(4) == (1, 4)
    assert auto_mesh_shape(6) == (3, 2)
    assert auto_mesh_shape(1) == (1, 1)


def test_sharded_train_step_matches_single_device(tiny_unet):
    model, params, state = tiny_unet
    opt = optax.sgd(0.1)
    mesh = make_mesh(2, 4)
    sharded_step, batch_sharding = make_sharded_unet_train_step(model, opt,
                                                               mesh)
    plain_step = jax.jit(make_unet_train_step(model, opt))

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 4, 1))
    y = (jax.random.uniform(jax.random.PRNGKey(2), (4, 16, 16, 4, 1))
         > 0.5).astype(jnp.float32)
    opt_state = opt.init(params)

    p1, s1, o1, l1 = plain_step(params, state, opt_state, x, y)
    xs = jax.device_put(x, batch_sharding)
    ys = jax.device_put(y, batch_sharding)
    # the sharded step donates params/state buffers: pass copies so the
    # module-scoped fixture stays alive
    params_c = jax.tree_util.tree_map(jnp.copy, params)
    state_c = jax.tree_util.tree_map(jnp.copy, state)
    p2, s2, o2, l2 = sharded_step(params_c, state_c, opt.init(params_c),
                                  xs, ys)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def _ensemble_inputs(e=4, l=24, m=32, seed=0):
    rng = np.random.RandomState(seed)
    confirmed = rng.rand(e, l, 3).astype(np.float32) * 10
    seg1 = rng.rand(e, m, 3).astype(np.float32) * 10
    mask1 = np.ones((e, m), bool)
    seg2 = rng.rand(m, 3).astype(np.float32) * 10
    mask2 = np.ones(m, bool)
    return confirmed, seg1, mask1, seg2, mask2


def test_ensemble_step_matches_serial(tiny_unet):
    ffn_params, ffn_state = FFN().init(jax.random.PRNGKey(3))
    confirmed, seg1, mask1, seg2, mask2 = _ensemble_inputs()
    combined = ensemble_track_step(ffn_params, ffn_state,
                                   confirmed, seg1, mask1, seg2, mask2,
                                   max_iteration=50)
    serial = []
    for e in range(4):
        serial.append(np.asarray(track_step(
            ffn_params, ffn_state, confirmed[e], seg1[e], mask1[e],
            seg2, mask2, max_iteration=50)))
    want = np.asarray(trim_mean(jnp.asarray(np.stack(serial)), 0.1, axis=0))
    np.testing.assert_allclose(np.asarray(combined), want, rtol=2e-3,
                               atol=2e-3)


def test_ensemble_step_sharded(tiny_unet):
    ffn_params, ffn_state = FFN().init(jax.random.PRNGKey(3))
    confirmed, seg1, mask1, seg2, mask2 = _ensemble_inputs(e=8)
    mesh = make_mesh(8, 1)
    step = make_sharded_ensemble_step(mesh, max_iteration=50)
    got = step(ffn_params, ffn_state, jnp.asarray(confirmed),
               jnp.asarray(seg1), jnp.asarray(mask1),
               jnp.asarray(seg2), jnp.asarray(mask2))
    want = ensemble_track_step(ffn_params, ffn_state, confirmed, seg1,
                               mask1, seg2, mask2, max_iteration=50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pad_members():
    arrays = [np.full((3, 3), i, np.float32) for i in range(5)]
    stack, n = pad_members(arrays, 4)
    assert stack.shape == (8, 3, 3) and n == 5
    np.testing.assert_array_equal(stack[5], stack[4])


def test_tile_parallel_predict_matches_serial(tiny_unet):
    model, params, state = tiny_unet
    mesh = make_mesh(8, 1)
    vol = np.random.RandomState(4).rand(40, 40, 8).astype(np.float32)
    plan = plan_tiles(vol.shape, model.tile_shape, (2, 2, 1))

    def apply_fn(p, s, tiles):
        probs, _ = model.apply(p, s, tiles, train=False)
        return probs

    fn = make_tile_parallel_predict(apply_fn, mesh, plan)
    got = np.asarray(fn(params, state, jnp.asarray(vol)))

    from t3dct.ops.tiling import pad_for_tiles, extract_tiles, stitch_tiles
    tiles = extract_tiles(pad_for_tiles(jnp.asarray(vol), plan), plan)
    probs = apply_fn(params, state, tiles[..., None])[..., 0]
    want = np.asarray(stitch_tiles(probs, plan))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spatially_sharded_apply_conv_equivalence():
    """A pure conv stack sharded over x with halo exchange must equal the
    single-device result."""
    from t3dct.models import layers as L
    key = jax.random.PRNGKey(5)
    conv_p = L.init_conv3d(key, (3, 3, 3), 1, 4)
    conv_p2 = L.init_conv3d(jax.random.split(key)[0], (3, 3, 3), 4, 1)

    def apply_fn(params, _, x):
        h = jax.nn.relu(L.conv3d(params[0], x))
        return L.conv3d(params[1], h)

    mesh = make_mesh(1, 4, axis_names=("data", "spatial"))
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 16, 8, 1))
    want = np.asarray(apply_fn((conv_p, conv_p2), None, x))
    # two 3^3 convs -> receptive radius 2
    fn = make_spatially_sharded_apply(apply_fn, mesh, halo=2)
    got = np.asarray(fn((conv_p, conv_p2), None, x))
    # interior (incl. all shard seams) must be exact; the global x edges
    # differ by design (see make_spatially_sharded_apply docstring)
    np.testing.assert_allclose(got[:, 2:-2], want[:, 2:-2], rtol=1e-4,
                               atol=1e-5)
    seam = 8  # shard boundary for 32/4
    np.testing.assert_allclose(got[:, seam - 1:seam + 1],
                               want[:, seam - 1:seam + 1], rtol=1e-4,
                               atol=1e-5)


def test_unet_segmenter_mesh_tiles_matches_single_device(tiny_unet):
    """UNetSegmenter(mesh=, mesh_mode='tiles') — the production caller of
    make_tile_parallel_predict (VERDICT r4 #6): the sharded tile sweep
    must match the single-device segmenter's probabilities."""
    from t3dct.config import SegmentationConfig
    from t3dct.engine.segmentation import UNetSegmenter

    model, params, state = tiny_unet
    rng = np.random.RandomState(11)
    shape = (64, 32, 8)
    img = (rng.rand(*shape) * 200).astype(np.float32)
    cfg = SegmentationConfig(noise_level=20.0, min_size=10, z_xy_ratio=3.0,
                             shrink=(4, 4, 1))
    base = UNetSegmenter(model, params, state, cfg, shape, max_cells=64,
                         compute_dtype=jnp.float32)
    want = np.asarray(base.predict_cellregions(img))

    sharded = UNetSegmenter(model, params, state, cfg, shape, max_cells=64,
                            compute_dtype=jnp.float32,
                            mesh=make_mesh(8, 1), mesh_mode="tiles")
    got = np.asarray(sharded.predict_cellregions(img))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unet_segmenter_mesh_halo_matches_whole_volume(tiny_unet):
    """UNetSegmenter(mesh=, mesh_mode='halo') — the production caller of
    make_spatially_sharded_apply: whole-volume inference sharded along x
    with the model's pool-aligned receptive radius as halo must be EXACT
    on the interior (tile-stitch seams disappear entirely); only the
    global x-edge band (zero input halo vs per-layer SAME padding) may
    differ."""
    from t3dct.config import SegmentationConfig
    from t3dct.engine.segmentation import UNetSegmenter
    from t3dct.ops.lcn import normalize_image

    model, params, state = tiny_unet
    rng = np.random.RandomState(12)
    shape = (64, 32, 8)
    img = (rng.rand(*shape) * 200).astype(np.float32)
    cfg = SegmentationConfig(noise_level=20.0, min_size=10, z_xy_ratio=3.0,
                             shrink=(4, 4, 1))
    mesh = make_mesh(1, 4)
    seg = UNetSegmenter(model, params, state, cfg, shape, max_cells=64,
                        compute_dtype=jnp.float32,
                        mesh=mesh, mesh_mode="halo")
    # tiny_unet: 1 level, pool (2,2,1) -> receptive radius x = 2 convs
    # (+2) + pool (+1) + 2 up convs at stride 2 (+4) + 1 head conv (+1)
    # = 8, already pool-aligned
    assert seg.halo == 8
    got = np.asarray(seg.predict_cellregions(img))
    assert got.shape == shape

    norm = normalize_image(jnp.asarray(img), cfg.noise_level,
                           median_stride=61)
    whole, _ = model.apply(params, state, norm[None, ..., None],
                           train=False, compute_dtype=jnp.float32)
    want = np.asarray(whole[0, ..., 0])
    h = seg.halo
    np.testing.assert_allclose(got[h:-h], want[h:-h], rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="multiple of the total"):
        UNetSegmenter(model, params, state, cfg, shape, mesh=mesh,
                      mesh_mode="halo", halo=3)
    with pytest.raises(ValueError, match="mesh_mode"):
        UNetSegmenter(model, params, state, cfg, shape, mesh=mesh,
                      mesh_mode="bogus")
    # a halo wider than the per-device x shard must fail with a CLEAR
    # error at construction, not an opaque XLA shape error at apply
    # (review round 5): 8-way mesh on 64-x -> 8-wide shards < halo 8+
    with pytest.raises(ValueError, match="exceeds the per-device"):
        UNetSegmenter(model, params, state, cfg, (16, 32, 8),
                      mesh=make_mesh(1, 8), mesh_mode="halo")


def test_multihost_scaffolding_single_process():
    from t3dct.parallel import multihost as mh
    from jax.sharding import PartitionSpec as P

    mh.initialize()                      # no-op single process
    assert mh.process_count() == 1
    assert mh.process_index() == 0
    assert mh.local_shard(range(10)) == list(range(10))
    # explicit 3-way split
    assert mh.local_shard(range(10), pid=0, n=3) == [0, 1, 2, 3]
    assert mh.local_shard(range(10), pid=2, n=3) == [8, 9]
    mesh = make_mesh(8, 1)
    arr = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    g = mh.global_batch_from_local(mesh, arr, P("data"))
    np.testing.assert_array_equal(np.asarray(g), arr)


@pytest.mark.slow
def test_predict_and_save_mesh_matches_sequential(tmp_path):
    """predict_and_save(mesh=...): in-process DP over volumes (SURVEY
    §2.3 mapping (i)) must write IDENTICAL seg/ artifacts to the
    sequential sweep."""
    from t3dct.config import StarDistConfig
    from t3dct.engine.stardist import StarDist3D, predict_and_save
    from t3dct.io.imageio import save_label_slices

    shape = (8, 32, 32)
    rng = np.random.RandomState(0)
    raw_dir = tmp_path / "raw"
    for t in range(1, 7):           # 6 volumes: one full + one tail group
        img = (rng.rand(*shape) * 40000).astype(np.uint16)
        save_label_slices(img.transpose(1, 2, 0), raw_dir,
                          "raw_t%03i_z%04i.tif", t, use_8_bit=False,
                          compression=None)

    cfg = StarDistConfig(n_rays=8, grid=(1, 2, 2), unet_n_depth=1,
                         unet_n_filter_base=4, net_conv_after_unet=8,
                         train_patch_size=shape, prob_thresh=0.4)
    model = StarDist3D(cfg, max_candidates=16, render_box=(5, 9, 9),
                       rng=jax.random.PRNGKey(0))

    images_path = str(raw_dir / "raw_t%03i_z*.tif")
    predict_and_save(images_path, model, tmp_path / "seq")
    mesh = make_mesh(4, 1)
    predict_and_save(images_path, model, tmp_path / "mesh", mesh=mesh)

    for t in range(1, 7):
        ca = np.load(tmp_path / "seq" / "seg" / f"coords{t:06d}.npy")
        cb = np.load(tmp_path / "mesh" / "seg" / f"coords{t:06d}.npy")
        np.testing.assert_array_equal(ca, cb, err_msg=f"coords t={t}")
        pa = np.load(tmp_path / "seq" / "seg" / f"prob{t:06d}.npy")
        pb = np.load(tmp_path / "mesh" / "seg" / f"prob{t:06d}.npy")
        np.testing.assert_array_equal(pa, pb, err_msg=f"prob t={t}")
    assert (tmp_path / "mesh" / "auto_vol1" / "auto_vol1_z0001.tif").exists()

    with pytest.raises(ValueError, match="mutually exclusive"):
        predict_and_save(images_path, model, tmp_path / "bad",
                         mesh=mesh, tile_shape=(None, 16, 16))
