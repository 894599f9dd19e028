"""Model forward-pass tests: U-Net shapes/ranges, FFN pairwise decomposition
parity with the reference-style 122-dim pair forward."""

import jax
import jax.numpy as jnp
import numpy as np

from t3dct.models import unet3_a, unet3_b, unet3_c, FFN, ffn_apply, \
    ffn_pair_scores


def test_unet_a_forward_shape():
    model = unet3_a()
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 32, 32, 8, 1))
    y, _ = model.apply(params, state, x)
    assert y.shape == (1, 32, 32, 8, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_unet_pool_anisotropy():
    # variant a pools (2,2,1): z never shrinks, so z=4 works at depth 3
    model = unet3_a()
    params, state = model.init(jax.random.PRNGKey(1))
    y, _ = model.apply(params, state, jnp.ones((2, 16, 16, 4, 1)))
    assert y.shape == (2, 16, 16, 4, 1)


def test_unet_c_isotropic():
    model = unet3_c()
    params, state = model.init(jax.random.PRNGKey(2))
    y, _ = model.apply(params, state, jnp.ones((1, 16, 16, 16, 1)))
    assert y.shape == (1, 16, 16, 16, 1)


def test_unet_b_shapes():
    model = unet3_b()
    params, state = model.init(jax.random.PRNGKey(3))
    y, _ = model.apply(params, state, jnp.ones((1, 16, 16, 8, 1)))
    assert y.shape == (1, 16, 16, 8, 1)


def test_unet_train_updates_bn_state():
    model = unet3_a()
    params, state = model.init(jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 4, 1))
    _, new_state = model.apply(params, state, x, train=True)
    diff = jax.tree_util.tree_reduce(
        lambda acc, p: acc + float(jnp.sum(jnp.abs(p[0] - p[1]))),
        jax.tree_util.tree_map(lambda a, b: (a, b), state, new_state),
        0.0)
    assert diff > 0.0


def _random_ffn(key):
    ffn = FFN()
    params, state = ffn.init(key)
    # nontrivial BN running stats to make the decomposition test meaningful
    k1, k2 = jax.random.split(key)
    state["feat_bn"]["mean"] = 0.1 * jax.random.normal(k1, (512,))
    state["feat_bn"]["var"] = jnp.abs(1.0 + 0.1 * jax.random.normal(k2, (512,)))
    state["comb_bn"]["mean"] = 0.05 * jax.random.normal(k2, (512,))
    state["comb_bn"]["var"] = jnp.abs(1.0 + 0.2 * jax.random.normal(k1, (512,)))
    return params, state


def test_ffn_pair_scores_match_pairwise_forward():
    params, state = _random_ffn(jax.random.PRNGKey(7))
    rng = np.random.RandomState(0)
    n_ref, m_tgt = 13, 9
    ref = rng.randn(n_ref, 61).astype(np.float32)
    tgt = rng.randn(m_tgt, 61).astype(np.float32)

    got = np.asarray(ffn_pair_scores(params, state, ref, tgt))
    assert got.shape == (m_tgt, n_ref)

    # reference-style: all 122-dim pairs [ref_i, tgt_j], reshape (tgt, ref)
    pairs = np.zeros((n_ref * m_tgt, 122), np.float32)
    idx = 0
    for j in range(m_tgt):          # row = tgt (ffn.py:320-326 tiling)
        for i in range(n_ref):
            pairs[idx, :61] = ref[i]
            pairs[idx, 61:] = tgt[j]
            idx += 1
    want, _ = ffn_apply(params, state, jnp.asarray(pairs), train=False)
    want = np.asarray(want).reshape(m_tgt, n_ref)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ffn_pair_scores_chunked():
    params, state = _random_ffn(jax.random.PRNGKey(8))
    rng = np.random.RandomState(1)
    ref = rng.randn(20, 61).astype(np.float32)
    tgt = rng.randn(17, 61).astype(np.float32)
    a = np.asarray(ffn_pair_scores(params, state, ref, tgt))
    b = np.asarray(ffn_pair_scores(params, state, ref, tgt, row_chunk=5))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_train_stardist_val_plateau_and_lr_reduce(tmp_path):
    """Validation tracking + ReduceLROnPlateau + best-weights keep
    (reference stardist Keras callbacks: ReduceLROnPlateau(factor,
    patience) on val_loss, save_best_only checkpointing)."""
    import numpy as np
    from t3dct.config import StarDistConfig
    from t3dct.models.train_stardist import TrainStarDist3D

    cfg = StarDistConfig(n_rays=4, grid=(1, 2, 2), anisotropy=(1., 1., 1.),
                         unet_n_depth=1, unet_n_filter_base=4,
                         net_conv_after_unet=8,
                         train_patch_size=(8, 16, 16))
    tr = TrainStarDist3D(cfg, basedir=tmp_path, max_dist=6,
                         learning_rate=1e-3, seed=0, batch_size=1)
    rng = np.random.RandomState(0)
    img = rng.rand(8, 16, 16).astype(np.float32)
    lab = np.zeros((8, 16, 16), np.int32)
    lab[2:6, 4:10, 4:10] = 1

    lr0 = tr.learning_rate
    # force a plateau: constant val loss -> lr halves at every epoch after
    # the first (patience=1), proving the mechanism end to end
    tr._val_loss = lambda batches: 1.0
    tr.train([img], [lab], epochs=3, steps_per_epoch=2,
             X_val=[img], Y_val=[lab], lr_patience=1,
             lr_reduce_factor=0.5, n_val_batches=1, verbose=False)
    assert tr.val_losses == [1.0, 1.0, 1.0]
    assert abs(tr.learning_rate - lr0 / 4) < 1e-9

    # real val loss path: finite values recorded, lr untouched with large
    # patience
    tr2 = TrainStarDist3D(cfg, basedir=tmp_path / "b", max_dist=6,
                          learning_rate=1e-3, seed=0, batch_size=1)
    tr2.train([img], [lab], epochs=2, steps_per_epoch=2,
              X_val=[img], Y_val=[lab], lr_patience=40, verbose=False)
    assert len(tr2.val_losses) == 2
    assert all(np.isfinite(v) for v in tr2.val_losses)
    assert abs(tr2.learning_rate - 1e-3) < 1e-9

def test_ffn_pair_scores_nondefault_hidden():
    """Regression: the comb-weight split point was the module constant
    HIDDEN=512 instead of the params' trunk width — an FFN(hidden=256)
    model (or a non-512 imported checkpoint) scored with an empty
    w_tgt."""
    from t3dct.models.ffn import FFN
    model = FFN(hidden=256)
    params, state = model.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(2)
    ref = rng.randn(8, 61).astype(np.float32)
    tgt = rng.randn(6, 61).astype(np.float32)
    got = np.asarray(ffn_pair_scores(params, state, ref, tgt))
    assert got.shape == (6, 8)

    pairs = np.zeros((8 * 6, 122), np.float32)
    idx = 0
    for j in range(6):
        for i in range(8):
            pairs[idx, :61] = ref[i]
            pairs[idx, 61:] = tgt[j]
            idx += 1
    want, _ = ffn_apply(params, state, jnp.asarray(pairs), train=False)
    np.testing.assert_allclose(got, np.asarray(want).reshape(6, 8),
                               rtol=1e-4, atol=1e-5)
    chunked = np.asarray(ffn_pair_scores(params, state, ref, tgt,
                                         row_chunk=4))
    np.testing.assert_allclose(got, chunked, rtol=1e-5, atol=1e-6)
