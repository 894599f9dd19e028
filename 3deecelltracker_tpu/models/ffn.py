"""FFN point-pair matching network.

Functional rebuild of the reference ``FFN`` Keras model (``ffn.py:225-265``):
a siamese MLP scoring "are these two local neighborhoods the same cell?".
Per point the feature vector is 61-dim (20 kNN relative offsets / mean kNN
distance + the mean distance itself, ``ffn.py:57-88``); a pair input is the
122-dim concat [ref_feat, tgt_feat].

Architecture (shared trunk): Dense(61→512, no bias) → BN → LeakyReLU applied
to each half; concat(1024) → Dense(512, no bias) → BN → LeakyReLU →
Dense(1) → sigmoid.

TPU-first redesign of all-pairs scoring: the reference materializes
n_ref×n_tgt 122-dim rows and runs Keras predict in batches of 1024
(``ffn.py:268-327``).  Here the trunk runs ONCE per point set and the
pairwise combine layer is decomposed — Dense([a, b]) = a@W1 + b@W2 — into an
outer broadcast-sum, turning the whole scoring pass into three matmuls plus
one fused elementwise map over the (m, n, 512) pair tensor.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]
State = Dict[str, Any]

N_FEATURES = 61
HIDDEN = 512


@dataclasses.dataclass(frozen=True)
class FFN:
    n_features: int = N_FEATURES
    hidden: int = HIDDEN

    def init(self, key: jax.Array) -> Tuple[Params, State]:
        k1, k2, k3 = jax.random.split(key, 3)
        params: Params = {
            "feat": L.init_dense(k1, self.n_features, self.hidden,
                                 use_bias=False),
            "comb": L.init_dense(k2, 2 * self.hidden, self.hidden,
                                 use_bias=False),
            "pred": L.init_dense(k3, self.hidden, 1),
        }
        state: State = {}
        params["feat_bn"], state["feat_bn"] = L.init_bn(self.hidden)
        params["comb_bn"], state["comb_bn"] = L.init_bn(self.hidden)
        return params, state

    def apply(self, params: Params, state: State, x: jax.Array,
              train: bool = False) -> Tuple[jax.Array, State]:
        """Pairwise forward on (batch, 2*n_features) inputs -> (batch, 1)."""
        return ffn_apply(params, state, x, train,
                         n_features=self.n_features)


def init_ffn(key: jax.Array) -> Tuple[Params, State]:
    return FFN().init(key)


def ffn_apply(params: Params, state: State, x: jax.Array,
              train: bool = False,
              n_features: int = N_FEATURES) -> Tuple[jax.Array, State]:
    """Reference-parity forward (``ffn.py:260-265``)."""
    new_state: State = dict(state)
    a = L.dense(params["feat"], x[:, :n_features])
    b = L.dense(params["feat"], x[:, n_features:])
    # Keras shares the trunk's BN over both halves; in train mode the batch
    # statistics are computed per call over each half in sequence.  We batch
    # both halves together, which is the natural functional equivalent.
    both = jnp.concatenate([a, b], axis=0)
    both, new_state["feat_bn"] = L.batchnorm(params["feat_bn"],
                                             state["feat_bn"], both, train)
    both = L.leaky_relu(both)
    a, b = jnp.split(both, 2, axis=0)
    h = jnp.concatenate([a, b], axis=1)
    h = L.dense(params["comb"], h)
    h, new_state["comb_bn"] = L.batchnorm(params["comb_bn"],
                                          state["comb_bn"], h, train)
    h = L.leaky_relu(h)
    out = jax.nn.sigmoid(L.dense(params["pred"], h))
    return out, (new_state if train else state)


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def ffn_pair_scores(params: Params, state: State,
                    ref_feats: jax.Array, tgt_feats: jax.Array,
                    row_chunk: int = 0) -> jax.Array:
    """Score all (tgt, ref) pairs; returns an (m_tgt, n_ref) matrix matching
    the reference's ``initial_matching_ffn`` output orientation
    (``ffn.py:323-327``).

    Inference-mode BN is an affine map, so the pair tensor never needs the
    122-dim concatenation: trunk features are computed once per set and the
    combine layer's weight is split into ref/tgt halves.
    """
    def trunk(f):
        h = L.dense(params["feat"], f)
        h, _ = L.batchnorm(params["feat_bn"], state["feat_bn"], h,
                           train=False)
        return L.leaky_relu(h)

    fr = trunk(ref_feats)                      # (n, hidden)
    ft = trunk(tgt_feats)                      # (m, hidden)
    w = params["comb"]["w"]
    # split at the TRUNK width from the params, not the module-default
    # HIDDEN constant — FFN(hidden=...) and imported checkpoints may use
    # a different width (utils/keras_import derives it from the file)
    h_trunk = fr.shape[-1]
    w_ref, w_tgt = w[:h_trunk], w[h_trunk:]
    zr = jnp.dot(fr, w_ref, preferred_element_type=jnp.float32)   # (n, 512)
    zt = jnp.dot(ft, w_tgt, preferred_element_type=jnp.float32)   # (m, 512)

    bn_p, bn_s = params["comb_bn"], state["comb_bn"]
    inv = jax.lax.rsqrt(bn_s["var"] + L.BN_EPS) * bn_p["scale"]
    shift = bn_p["bias"] - bn_s["mean"] * inv
    w_pred = params["pred"]["w"][:, 0]
    b_pred = params["pred"]["b"][0]

    def rows(zt_chunk):
        z = zt_chunk[:, None, :] + zr[None, :, :]          # (chunk, n, 512)
        h = L.leaky_relu(z * inv + shift)                  # BN affine + act
        logits = jnp.einsum("mnc,c->mn", h, w_pred) + b_pred
        return jax.nn.sigmoid(logits)

    m = zt.shape[0]
    if row_chunk and row_chunk < m:
        pad = (-m) % row_chunk
        zt_p = jnp.pad(zt, ((0, pad), (0, 0)))
        out = jax.lax.map(rows, zt_p.reshape(-1, row_chunk, zt.shape[1]))
        return out.reshape(-1, zr.shape[0])[:m]
    return rows(zt)
