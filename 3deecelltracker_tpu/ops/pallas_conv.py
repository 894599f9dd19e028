"""Fused Pallas 3x3x3 conv (+bias +ReLU) for the StarDist backbone.

Motivation (scripts/backbone_profile{,2}.json, measured on v5e at worm
scale): the backbone's 13.4 ms concentrates in the full-resolution
(24, 204, 84) conv layers — up0 block 4.7 ms, features 2.1 ms, down0
1.9 ms — running at 21-43 TF/s effective while the same XLA conv at 128
channels reaches 74 TF/s.  The output-channel count (32) caps MXU column
utilization at 32/128, so the ceiling for these layers is ~49 TF/s; this
kernel tries to reach it by driving the MXU directly with z-packed
patch matmuls (K = 3*C_in per (dy, dx) tap -> 9 dots per tile instead of
27) and keeping the halo window + accumulator resident in VMEM.

Layout: NDHWC input (z, y, x, c) with z on the grid's first axis and y
tiled; each program DMAs its (3, TY+2, X+2, C) halo window from the
HBM-resident padded input, accumulates 9 patch matmuls, applies
bias/ReLU, and writes one (TY, X, C_out) output tile.

STATUS: experimental, NOT wired into any model path.  The current
Mosaic-on-TPU toolchain rejects the forms this kernel needs (HBM DMA
slices must be 128-aligned on the minor dim — "Slice shape along
dimension 3 must be aligned to tiling (128), but is 32" — and the
folded-minor-dim workaround hits "infer-vector-layout: unsupported
shape cast"; every real-TPU compile in
scripts/pallas_conv_profile.json failed accordingly).  The kernel and
its CPU-interpret parity test (tests/test_backbone_variants.py, bit-
for-float vs lax.conv_general_dilated) are kept for a future
toolchain; wire it up only after a compiled run passes on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_ty(y: int, budget_bytes: int, x: int, c: int) -> int:
    """Largest tile TY dividing y with the halo window under budget."""
    best = 1
    for ty in range(1, y + 1):
        if y % ty:
            continue
        win_bytes = 3 * (ty + 2) * (x + 2) * c * 4
        patch_bytes = ty * x * 3 * c * 4
        if win_bytes + patch_bytes <= budget_bytes:
            best = ty
    return best


def _conv_kernel(ty: int, x_pad: int, x_len: int, c_in: int, c_out: int,
                 relu: bool, x_hbm, w_ref, b_ref, out_ref, win, sem):
    iz = pl.program_id(0)
    iy = pl.program_id(1)
    # the HBM source's minor dim is the FOLDED (x_pad * c_in) axis — an
    # exact multiple of the 128-lane tile, so the full-extent DMA slice
    # is tile-aligned (a (..., x, c) source with c < 128 is rejected:
    # "slice shape along dimension 3 must be aligned to tiling (128)")
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(iz, 3), pl.ds(iy * ty, ty + 2)], win, sem)
    cp.start()
    cp.wait()
    w3 = win[:].reshape(3, ty + 2, x_pad, c_in)
    acc = jnp.zeros((ty * x_len, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = jnp.concatenate(
                [w3[0, dy:dy + ty, dx:dx + x_len, :],
                 w3[1, dy:dy + ty, dx:dx + x_len, :],
                 w3[2, dy:dy + ty, dx:dx + x_len, :]],
                axis=-1).reshape(ty * x_len, 3 * c_in)
            acc = acc + jnp.dot(patch, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(ty, x_len, c_out)


@functools.partial(jax.jit, static_argnames=("relu", "ty"))
def conv3x3x3_fused(x: jax.Array, w: jax.Array, b: jax.Array,
                    relu: bool = True,
                    ty: Optional[int] = None) -> jax.Array:
    """SAME 3x3x3 conv + bias (+ReLU) on a single (z, y, x, c) volume.

    ``w``: (3, 3, 3, c_in, c_out) in DHWIO order (models/layers.py);
    ``b``: (c_out,).  Returns (z, y, x, c_out) float32.
    """
    z, y, x_len, c_in = x.shape
    c_out = w.shape[-1]
    if ty is None:
        ty = _pick_ty(y, 6 * 1024 * 1024, x_len, c_in)
    assert y % ty == 0, (y, ty)
    # pad x so the folded (x_pad * c_in) minor dim is a 128-lane multiple
    # (tile-aligned DMA, zero storage waste vs the padded (x, c) layout)
    align = 128 // int(np.gcd(c_in, 128))
    x_pad = -((-(x_len + 2)) // align) * align
    xp = jnp.pad(x.astype(jnp.float32),
                 ((1, 1), (1, 1), (1, x_pad - x_len - 1), (0, 0)))
    xf = xp.reshape(z + 2, y + 2, x_pad * c_in)
    # K packs the 3 z-taps: w9[dy, dx, dz*C + c, o] = w[dz, dy, dx, c, o]
    w9 = jnp.transpose(w.astype(jnp.float32),
                       (1, 2, 0, 3, 4)).reshape(3, 3, 3 * c_in, c_out)
    b2 = b.astype(jnp.float32).reshape(1, c_out)

    kern = functools.partial(_conv_kernel, ty, x_pad, x_len, c_in, c_out,
                             relu)
    out = pl.pallas_call(
        kern,
        grid=(z, y // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ty, x_len, c_out),
                               lambda iz, iy: (iz, iy, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((z, y, x_len, c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, ty + 2, x_pad * c_in), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(xf, w9, b2)
    return out
