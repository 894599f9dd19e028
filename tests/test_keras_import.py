"""Keras .h5 checkpoint import (utils/keras_import.py).

Fast tests synthesize Keras-2-format h5 files with plain h5py — the exact
layout TF 2.5/2.11 (the reference's pins) write — and check the mapping into
our pytrees.  Slow tests build the real reference architectures with the
in-container TensorFlow/Keras, save legacy .h5 files, import them, and
require forward-pass agreement ≤1e-5 (the accuracy-parity prerequisite:
reference-trained nets must run unmodified here).
"""

import json

import numpy as np
import pytest

import t3dct
from t3dct.config import StarDistConfig
from t3dct.models.ffn import FFN, ffn_apply, ffn_pair_scores
from t3dct.models.stardist3d import StarDist3DNet
from t3dct.models.unet3d import get_unet
from t3dct.utils.keras_import import (KerasGraph, import_ffn,
                                      import_stardist3d, import_unet3,
                                      read_keras_h5)

rng = np.random.default_rng(7)


def _randn(*shape):
    return rng.standard_normal(shape).astype(np.float32)


def write_keras2_h5(path, layers, model_config=None):
    """Write layer weights in the Keras-2 h5 layout (layer_names /
    weight_names attrs; 'model_weights' group + model_config attr for
    full-model files)."""
    import h5py

    with h5py.File(path, "w") as f:
        group = f
        if model_config is not None:
            f.attrs["model_config"] = json.dumps(model_config).encode()
            group = f.create_group("model_weights")
        group.attrs["layer_names"] = [name.encode() for name, _ in layers]
        for name, weights in layers:
            grp = group.create_group(name)
            grp.attrs["weight_names"] = [w.encode() for w, _ in weights]
            for wname, arr in weights:
                # weight names may contain '/' -> nested groups, like Keras
                grp.create_dataset(wname, data=arr)


# ---------------------------------------------------------------------------
# fast: layout parsing + mapping
# ---------------------------------------------------------------------------

def _keras_unet_layers(spec):
    """Random unet3 weights in the reference's creation order
    (unet3d.py:84-98), with Keras-2 names."""
    from t3dct.utils.keras_import import _unet_block_specs

    layers, expected_params, expected_state = [], {}, {}
    for i, (name, cin, cout) in enumerate(_unet_block_specs(spec)):
        k = 1 if name == "out" else 3
        w, b = _randn(k, k, k, cin, cout), _randn(cout)
        suffix = "" if i == 0 else f"_{i}"
        layers.append((f"conv3d{suffix}",
                       [(f"conv3d{suffix}/kernel:0", w),
                        (f"conv3d{suffix}/bias:0", b)]))
        expected_params[name] = {"conv": {"w": w, "b": b}}
        if name != "out":
            g, be = _randn(cout), _randn(cout)
            mm, mv = _randn(cout), np.abs(_randn(cout)) + 0.5
            layers.append((f"batch_normalization{suffix}",
                           [(f"bn{suffix}/gamma:0", g),
                            (f"bn{suffix}/beta:0", be),
                            (f"bn{suffix}/moving_mean:0", mm),
                            (f"bn{suffix}/moving_variance:0", mv)]))
            expected_params[name]["bn"] = {"scale": g, "bias": be}
            expected_state[name] = {"mean": mm, "var": mv}
    return layers, expected_params, expected_state


def test_import_unet3_weights_only(tmp_path):
    spec = get_unet("a")
    layers, exp_p, exp_s = _keras_unet_layers(spec)
    path = tmp_path / "weights_initial.h5"
    write_keras2_h5(path, layers)
    got_spec, params, state = import_unet3(path)      # variant inferred
    assert got_spec.variant == "a"
    for name, sub in exp_p.items():
        np.testing.assert_array_equal(params[name]["conv"]["w"],
                                      sub["conv"]["w"])
        np.testing.assert_array_equal(params[name]["conv"]["b"],
                                      sub["conv"]["b"])
        if "bn" in sub:
            np.testing.assert_array_equal(params[name]["bn"]["scale"],
                                          sub["bn"]["scale"])
            np.testing.assert_array_equal(state[name]["mean"],
                                          exp_s[name]["mean"])
    # forward runs at an arbitrary fully-convolutional size
    x = _randn(1, 16, 16, 4, 1)
    probs, _ = got_spec.apply(params, state, x)
    assert probs.shape == (1, 16, 16, 4, 1)
    assert np.all(np.isfinite(probs))


def test_import_unet3_full_model_layout(tmp_path):
    """Same weights inside a full-model file ('model_weights' group)."""
    spec = get_unet("c")
    layers, exp_p, _ = _keras_unet_layers(spec)
    path = tmp_path / "unet3_pretrained.h5"
    write_keras2_h5(path, layers, model_config={"class_name": "Functional",
                                                "config": {"layers": []}})
    # variants a and c share channel counts (they differ only in pooling,
    # which leaves no trace in the weights) -> 'c' must be requested
    got_spec, params, _ = import_unet3(path, variant="c")
    assert got_spec.variant == "c"
    np.testing.assert_array_equal(params["down0_0"]["conv"]["w"],
                                  exp_p["down0_0"]["conv"]["w"])


def test_import_unet3_rejects_wrong_variant(tmp_path):
    spec = get_unet("a")
    layers, _, _ = _keras_unet_layers(spec)
    path = tmp_path / "w.h5"
    write_keras2_h5(path, layers)
    with pytest.raises(ValueError):
        import_unet3(path, variant="b")


def _ffn_weights():
    w_feat = _randn(61, 512)
    bn1 = [_randn(512), _randn(512), _randn(512),
           np.abs(_randn(512)) + 0.5]
    w_comb = _randn(1024, 512)
    bn2 = [_randn(512), _randn(512), _randn(512),
           np.abs(_randn(512)) + 0.5]
    w_pred, b_pred = _randn(512, 1), _randn(1)
    return w_feat, bn1, w_comb, bn2, w_pred, b_pred


def _ffn_keras2_layers(w_feat, bn1, w_comb, bn2, w_pred, b_pred):
    """The subclassed-FFN save_weights layout: top-level Sequential groups
    with nested weight paths (ffn.py:225-258)."""
    bn_names = ["gamma:0", "beta:0", "moving_mean:0", "moving_variance:0"]
    return [
        ("sequential",
         [("sequential/dense/kernel:0", w_feat)]
         + [(f"sequential/batch_normalization/{n}", a)
            for n, a in zip(bn_names, bn1)]),
        ("concatenate", []),
        ("sequential_1",
         [("sequential_1/dense_1/kernel:0", w_comb)]
         + [(f"sequential_1/batch_normalization_1/{n}", a)
            for n, a in zip(bn_names, bn2)]),
        ("sequential_2",
         [("sequential_2/dense_2/kernel:0", w_pred),
          ("sequential_2/dense_2/bias:0", b_pred)]),
    ]


def test_import_ffn_weights_only(tmp_path):
    w_feat, bn1, w_comb, bn2, w_pred, b_pred = _ffn_weights()
    path = tmp_path / "weights_training_epoch30.h5"
    write_keras2_h5(path,
                    _ffn_keras2_layers(w_feat, bn1, w_comb, bn2,
                                       w_pred, b_pred))
    params, state = import_ffn(path)
    np.testing.assert_array_equal(params["feat"]["w"], w_feat)
    np.testing.assert_array_equal(params["comb"]["w"], w_comb)
    np.testing.assert_array_equal(params["pred"]["b"], b_pred)
    np.testing.assert_array_equal(state["feat_bn"]["var"], bn1[3])
    assert "b" not in params["feat"]  # use_bias=False preserved

    x = _randn(5, 122)
    out, _ = ffn_apply(params, state, x)
    assert out.shape == (5, 1)
    assert np.all((out >= 0) & (out <= 1))


def test_keras_graph_executor_shared_branch(tmp_path):
    """Hand-authored Keras-2 full-model file with a SHARED feature branch
    applied to two inputs (the legacy FFN shape, tracker.py:1121 +
    track.py:117-180); executor output must match our ffn_apply on the
    same weights."""
    w_feat, bn1, w_comb, bn2, w_pred, b_pred = _ffn_weights()

    def node(*parents):
        return [[p, idx, 0, {}] for p, idx in parents]

    model_config = {
        "class_name": "Functional",
        "config": {
            "name": "legacy_ffn",
            "layers": [
                {"class_name": "InputLayer", "name": "in_ref",
                 "config": {"name": "in_ref"}, "inbound_nodes": []},
                {"class_name": "InputLayer", "name": "in_tgt",
                 "config": {"name": "in_tgt"}, "inbound_nodes": []},
                {"class_name": "Dense", "name": "feat",
                 "config": {"name": "feat", "use_bias": False},
                 "inbound_nodes": [node(("in_ref", 0)),
                                   node(("in_tgt", 0))]},
                {"class_name": "BatchNormalization", "name": "feat_bn",
                 "config": {"name": "feat_bn", "epsilon": 1e-3},
                 "inbound_nodes": [node(("feat", 0)), node(("feat", 1))]},
                {"class_name": "LeakyReLU", "name": "feat_act",
                 "config": {"name": "feat_act", "alpha": 0.3},
                 "inbound_nodes": [node(("feat_bn", 0)),
                                   node(("feat_bn", 1))]},
                {"class_name": "Concatenate", "name": "concat",
                 "config": {"name": "concat", "axis": 1},
                 "inbound_nodes": [node(("feat_act", 0),
                                        ("feat_act", 1))]},
                {"class_name": "Dense", "name": "comb",
                 "config": {"name": "comb", "use_bias": False},
                 "inbound_nodes": [node(("concat", 0))]},
                {"class_name": "BatchNormalization", "name": "comb_bn",
                 "config": {"name": "comb_bn", "epsilon": 1e-3},
                 "inbound_nodes": [node(("comb", 0))]},
                {"class_name": "LeakyReLU", "name": "comb_act",
                 "config": {"name": "comb_act", "alpha": 0.3},
                 "inbound_nodes": [node(("comb_bn", 0))]},
                {"class_name": "Dense", "name": "pred",
                 "config": {"name": "pred", "activation": "sigmoid"},
                 "inbound_nodes": [node(("comb_act", 0))]},
            ],
            "input_layers": [["in_ref", 0, 0], ["in_tgt", 0, 0]],
            "output_layers": [["pred", 0, 0]],
        },
    }
    bn_names = ["gamma:0", "beta:0", "moving_mean:0", "moving_variance:0"]
    layers = [
        ("feat", [("feat/kernel:0", w_feat)]),
        ("feat_bn", [(f"feat_bn/{n}", a) for n, a in zip(bn_names, bn1)]),
        ("comb", [("comb/kernel:0", w_comb)]),
        ("comb_bn", [(f"comb_bn/{n}", a) for n, a in zip(bn_names, bn2)]),
        ("pred", [("pred/kernel:0", w_pred), ("pred/bias:0", b_pred)]),
    ]
    path = tmp_path / "ffn_legacy_model.h5"
    write_keras2_h5(path, layers, model_config=model_config)

    graph = KerasGraph.from_h5(path)
    a, b = _randn(7, 61), _randn(7, 61)
    got = graph(a, b)

    params, state = import_ffn(path)
    want, _ = ffn_apply(params, state,
                        np.concatenate([a, b], axis=1))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-6)


def _stardist_cfg():
    return StarDistConfig(n_rays=8, grid=(1, 2, 2), anisotropy=(2., 1., 1.),
                          unet_n_depth=2, unet_n_filter_base=8,
                          net_conv_after_unet=16,
                          train_patch_size=(8, 16, 16))


def _stardist_keras2_layers(cfg):
    net = StarDist3DNet(cfg, arch="keras")
    layers, params = [], {}
    for i, (name, cin, cout, kernel) in enumerate(net._keras_plan()):
        w = _randn(*kernel, cin, cout)
        b = _randn(cout)
        suffix = "" if i == 0 else f"_{i}"
        layers.append((f"conv3d{suffix}",
                       [(f"conv3d{suffix}/kernel:0", w),
                        (f"conv3d{suffix}/bias:0", b)]))
        params[name] = {"w": w, "b": b}
    return layers, params


def test_import_stardist_and_model_dir(tmp_path):
    cfg = _stardist_cfg()
    layers, exp = _stardist_keras2_layers(cfg)
    model_dir = tmp_path / "stardist_models" / "stardist"
    model_dir.mkdir(parents=True)
    write_keras2_h5(model_dir / "weights_best.h5", layers)

    params = import_stardist3d(model_dir / "weights_best.h5", cfg)
    np.testing.assert_array_equal(params["pre0_0"]["w"], exp["pre0_0"]["w"])
    np.testing.assert_array_equal(params["dist_head"]["b"],
                                  exp["dist_head"]["b"])

    # stardist-0.8-style model folder (config.json written by Config3D)
    with open(model_dir / "config.json", "w") as fh:
        json.dump({"backbone": "unet", "grid": [1, 2, 2],
                   "anisotropy": [2.0, 1.0, 1.0],
                   "rays_json": {"name": "Rays_GoldenSpiral",
                                 "kwargs": {"n": 8,
                                            "anisotropy": [2., 1., 1.]}},
                   "unet_n_depth": 2, "unet_pool": [2, 2, 2],
                   "unet_n_filter_base": 8, "unet_n_conv_per_depth": 2,
                   "unet_kernel_size": [3, 3, 3],
                   "net_conv_after_unet": 16, "n_channel_in": 1,
                   "train_patch_size": [8, 16, 16]}, fh)
    with open(model_dir / "thresholds.json", "w") as fh:
        json.dump({"prob": 0.42, "nms": 0.25}, fh)

    model = t3dct.engine.stardist.load_stardist_model(
        "stardist", str(tmp_path / "stardist_models"))
    assert model.arch == "keras"
    assert model._thresholds == {"prob": 0.42, "nms": 0.25}
    assert model.config.n_rays == 8
    (labels, details), prob_map = model.predict_instances(
        _randn(8, 16, 16).astype(np.float32))
    assert labels.shape == (8, 16, 16)
    assert prob_map.shape == (8, 8, 8)   # grid resolution


def test_stardist_keras_arch_save_load_roundtrip(tmp_path):
    """Our own save/load must preserve arch='keras' params."""
    cfg = _stardist_cfg()
    from t3dct.engine.stardist import StarDist3D
    import jax
    net = StarDist3DNet(cfg, arch="keras")
    params = net.init(jax.random.PRNGKey(1))
    model = StarDist3D(cfg, params=params, arch="keras")
    model.save(tmp_path / "m")
    loaded = StarDist3D.load(tmp_path / "m")
    assert loaded.arch == "keras"
    x = _randn(1, 8, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(net.apply(params, x)[0]),
        np.asarray(loaded.net.apply(loaded.params, x)[0]), atol=0)


# ---------------------------------------------------------------------------
# slow: agreement with real TensorFlow/Keras forward passes
# ---------------------------------------------------------------------------

def _keras():
    tf = pytest.importorskip("tensorflow")
    return tf


def _randomize_bn(model):
    """Give BatchNorm layers non-trivial moving statistics so the test
    exercises the inference-mode affine, not 0/1 defaults."""
    for layer in model.layers:
        ws = layer.get_weights()
        if len(ws) == 4 and all(w.ndim == 1 for w in ws):
            c = ws[0].shape[0]
            layer.set_weights([_randn(c), _randn(c), _randn(c) * 0.3,
                               np.abs(_randn(c)) * 0.5 + 0.7])


@pytest.mark.slow
def test_unet3a_import_matches_keras(tmp_path):
    tf = _keras()
    from tensorflow.keras import layers as kl

    # reference unet3_a topology (unet3d.py:26-37,84-121), built here from
    # our spec (NOT imported from the reference)
    def block(f, x):
        x = kl.Conv3D(f, 3, padding="same")(x)
        x = kl.LeakyReLU()(x)
        return kl.BatchNormalization()(x)

    inputs = kl.Input((None, None, None, 1))
    skips, h = [], inputs
    for f1, f2 in ((8, 16), (16, 32), (32, 64)):
        h = block(f1, h)
        h = block(f2, h)
        skips.append(h)
        h = kl.MaxPooling3D((2, 2, 1))(h)
    for i, (f1, f2) in enumerate(((64, 64), (32, 32), (16, 16))):
        h = block(f1, h)
        h = block(f2, h)
        h = kl.concatenate([kl.UpSampling3D((2, 2, 1))(h), skips[2 - i]])
    h = block(8, h)
    h = block(8, h)
    out = kl.Conv3D(1, 1, padding="same", activation="sigmoid")(h)
    kmodel = tf.keras.Model(inputs, out)
    _randomize_bn(kmodel)

    path = str(tmp_path / "unet3a.h5")
    kmodel.save(path)

    spec, params, state = import_unet3(path, variant="a")
    x = _randn(1, 16, 16, 4, 1)
    want = kmodel.predict(x, verbose=0)
    got, _ = spec.apply(params, state, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.slow
def test_ffn_import_matches_keras(tmp_path):
    tf = _keras()
    from tensorflow.keras import layers as kl

    # the v1.0 FFN (ffn.py:225-265) as a functional graph with the shared
    # trunk, so save() works (subclassed models can't save to legacy h5)
    in_ref, in_tgt = kl.Input((61,)), kl.Input((61,))
    feat = kl.Dense(512, use_bias=False)
    feat_bn = kl.BatchNormalization()
    act = kl.LeakyReLU()
    a = act(feat_bn(feat(in_ref)))
    b = act(feat_bn(feat(in_tgt)))
    h = kl.Concatenate(axis=1)([a, b])
    h = kl.Dense(512, use_bias=False)(h)
    h = kl.BatchNormalization()(h)
    h = kl.LeakyReLU()(h)
    out = kl.Dense(1, activation="sigmoid")(h)
    kmodel = tf.keras.Model([in_ref, in_tgt], out)
    _randomize_bn(kmodel)

    path = str(tmp_path / "ffn.h5")
    kmodel.save(path)

    params, state = import_ffn(path)
    ra, rb = _randn(9, 61), _randn(9, 61)
    want = kmodel.predict([ra, rb], verbose=0)
    got, _ = ffn_apply(params, state, np.concatenate([ra, rb], axis=1))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # the decomposed all-pairs scorer must agree too (models/ffn.py:94)
    scores = ffn_pair_scores(params, state, ra, rb)
    np.testing.assert_allclose(np.asarray(scores)[np.arange(9),
                                                  np.arange(9)],
                               want[:, 0], atol=1e-5)


@pytest.mark.slow
def test_stardist_keras_arch_matches_keras(tmp_path):
    """Build the stardist-0.8 model3d topology in Keras (pre-grid conv
    blocks + csbdeep unet_block schedule), save, import, and require
    (prob, dist) forward agreement with arch='keras'."""
    tf = _keras()
    from tensorflow.keras import layers as kl

    cfg = _stardist_cfg()
    base, ncv, depth = cfg.unet_n_filter_base, 2, cfg.unet_n_depth
    inputs = kl.Input((None, None, None, 1))
    h = inputs
    # pre-grid: conv blocks then pool until grid reached (model3d._build)
    h = kl.Conv3D(base, 3, padding="same", activation="relu")(h)
    h = kl.Conv3D(base, 3, padding="same", activation="relu")(h)
    h = kl.MaxPooling3D((1, 2, 2))(h)
    # csbdeep unet_block(n_depth=2, n_filter_base=8, n_conv_per_depth=2)
    skips = []
    for n in range(depth):
        for _ in range(ncv):
            h = kl.Conv3D(base * 2 ** n, 3, padding="same",
                          activation="relu")(h)
        skips.append(h)
        h = kl.MaxPooling3D((2, 2, 2))(h)
    h = kl.Conv3D(base * 2 ** depth, 3, padding="same",
                  activation="relu")(h)
    h = kl.Conv3D(base * 2 ** max(0, depth - 1), 3, padding="same",
                  activation="relu")(h)
    for n in reversed(range(depth)):
        h = kl.Concatenate()([kl.UpSampling3D((2, 2, 2))(h), skips[n]])
        h = kl.Conv3D(base * 2 ** n, 3, padding="same",
                      activation="relu")(h)
        h = kl.Conv3D(base * 2 ** max(0, n - 1), 3, padding="same",
                      activation="relu")(h)
    feat = kl.Conv3D(cfg.net_conv_after_unet, 3, padding="same",
                     activation="relu", name="features")(h)
    prob = kl.Conv3D(1, 1, padding="same", activation="sigmoid",
                     name="prob")(feat)
    dist = kl.Conv3D(cfg.n_rays, 1, padding="same", name="dist")(feat)
    kmodel = tf.keras.Model(inputs, [prob, dist])

    path = str(tmp_path / "weights_best.h5")
    kmodel.save(path)

    params = import_stardist3d(path, cfg)
    net = StarDist3DNet(cfg, arch="keras")
    x = _randn(1, 8, 16, 16, 1)
    want_prob, want_dist = kmodel.predict(x, verbose=0)
    got_prob, got_dist = net.apply(params, x)
    np.testing.assert_allclose(np.asarray(got_prob), want_prob, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dist), want_dist, atol=1e-4)


def test_units_adjacent_scale_false_bn():
    """Regression: a scale=False BatchNorm (no gamma) directly after a
    completed BN unit used to be MERGED into the previous layer's unit,
    overwriting its beta/mean/var and losing one unit."""
    from t3dct.utils.keras_import import _units
    a = [("bn_a", [("bn_a/gamma:0", np.ones(4, np.float32)),
                   ("bn_a/beta:0", np.full(4, 2.0, np.float32)),
                   ("bn_a/moving_mean:0", np.zeros(4, np.float32)),
                   ("bn_a/moving_variance:0", np.ones(4, np.float32))]),
         ("bn_b", [("bn_b/beta:0", np.full(4, 7.0, np.float32)),
                   ("bn_b/moving_mean:0", np.full(4, 5.0, np.float32)),
                   ("bn_b/moving_variance:0", np.full(4, 3.0,
                                                      np.float32))])]
    units = _units(a)
    assert len(units) == 2
    assert units[0]["layer"] == "bn_a" and units[1]["layer"] == "bn_b"
    np.testing.assert_array_equal(units[0]["beta"],
                                  np.full(4, 2.0, np.float32))
    np.testing.assert_array_equal(units[1]["beta"],
                                  np.full(4, 7.0, np.float32))
    assert "gamma" not in units[1]


def test_kerasgraph_rejects_sequential_config():
    """A Sequential-format model_config has no inbound_nodes graph; the
    executor used to die later with an opaque KeyError — it must raise a
    clear ValueError at construction."""
    cfg = {"class_name": "Sequential", "config": {"layers": [
        {"class_name": "Dense", "name": "dense_1",
         "config": {"name": "dense_1", "units": 4}},
        {"class_name": "Dense", "name": "dense_2",
         "config": {"name": "dense_2", "units": 1}},
    ]}}
    with pytest.raises(ValueError, match="Sequential"):
        KerasGraph(cfg, {})
