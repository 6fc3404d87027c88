"""Fused UNIVERSE ConvBlock core as a Pallas TPU kernel.

The ConvBlock conv chain (reference blocks.py:383-399, our nn/blocks.py)

    cond_out = conv5(prelu(h))
    c        = film((cond_out [+ input_cond]) * sqrt(1/2), noise_cond)
    c        = conv3(prelu(c)); c = conv3(prelu(c))
    v        = (h + c) * sqrt(1/2)

is memory-bound in XLA at the shallow network levels (C = 32..128 at
T = 16k..32k: ~12 HBM traversals of large activations) and wastes MXU lanes
(C < 128).  This kernel:

  * packs P = 128 // C consecutive samples into the lane dimension via a
    zero-copy reshape, so every row is a full 128-lane vector:
    x_rows (B, T/P, P*C);
  * re-expresses each 1-D conv as a sum of 2*J+1 (rows, 128) x (128, 128)
    block-Toeplitz matmuls (y[r] = sum_j x[r+j] @ W_j with
    W_j[pC:(p+1)C, qC:(q+1)C] = w[jP + p - q + K//2]);
  * expresses the halo overlap as two extra sublane-sized BlockSpec inputs
    per tensor (the blocks left and right of the current tile, clamped at
    the edges and masked to zero in-kernel), so the whole kernel runs on the
    automatic Mosaic grid pipeline — every input and output is
    double-buffered DMA overlapped with compute, with no manual DMA.

HBM traffic is ~(1 + 2*halo/tile) reads + 2 writes per element vs ~12
traversals for the unfused XLA chain, and every matmul uses the full MXU
width.  Intermediate activations outside [0, T) are masked to zero,
matching the zero padding a chain of 'same' convolutions inserts in XLA.

Inference-path only (no custom VJP); weight norm must be folded. Enable via
ops.pallas.enable().
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_universe_tpu.ops import pallas as _config

def _sublane(dtype) -> int:
    """Sublane granularity: halo block rows must be a multiple of this, so
    the halo (and tile sizes) are dtype-dependent (f32: 8 rows, bf16: 16)."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8
SQRT_HALF = 1.0 / math.sqrt(2.0)


def _pack_conv_weights(w: jax.Array, p: int) -> jax.Array:
    """(K, C, C) tap weights -> (2J+1, P*C, P*C) block-Toeplitz row weights.

    Single gather (static index table) so the packing is a handful of XLA
    ops — it runs on every call when the weights are traced, so it must be
    cheap (a scalar .at[].set() loop here once cost more than the kernel)."""
    import numpy as np

    k, c, _ = w.shape
    half = k // 2
    jmax = (half + p - 1) // p
    tap_idx = np.full((2 * jmax + 1, p, p), k, dtype=np.int32)  # k -> zero
    for j in range(-jmax, jmax + 1):
        for pp in range(p):
            for q in range(p):
                tap = j * p + pp - q + half
                if 0 <= tap < k:
                    tap_idx[j + jmax, pp, q] = tap
    w_ext = jnp.concatenate([w, jnp.zeros((1, c, c), w.dtype)], axis=0)
    # (2J+1, P, Q, C_in, C_out) -> rows are (pp, c_in) blocks, cols (q, c_out)
    gathered = w_ext[tap_idx]  # tap axis: (..., c_in, c_out)
    out = jnp.transpose(gathered, (0, 1, 3, 2, 4))
    return out.reshape(2 * jmax + 1, p * c, p * c)


def pick_tile_rows(rows: int, target: int = 2048, align: int = 8) -> Optional[int]:
    """Tile size: a multiple of `align` (halo-block granularity), ideally a
    divisor of `rows` <= target, otherwise just <= target (the kernel masks
    the partial tail tile); None if rows is too small to tile."""
    best = None
    for d in range(align, min(rows, target) + 1, align):
        if rows % d == 0:
            best = d
    if best is not None and best >= 64:
        return best
    tile = (min(rows, target) // align) * align
    return tile if tile >= 64 else None


def _kernel(h_l, h_c, h_r, cond_l, cond_c, cond_r, w5_ref, b5_ref,
            w3a_ref, b3a_ref, w3b_ref, b3b_ref, alphas_ref, film_ref,
            v_ref, cond_ref,
            *, tile_r: int, n_tiles: int, p: int, c: int, t_valid: int,
            d5: int, halo: int, with_film: bool, with_cond: bool):
    HALO = halo
    i = pl.program_id(1)
    r0 = i * tile_r
    lanes = p * c

    lane_blk = (jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
                // c).astype(jnp.float32)

    def valid_mask(n_rows, row_offset):
        # global sample index of each (row, lane) element (float math: Mosaic
        # supports f32 comparisons on all layouts)
        g_row = jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, 1), 0).astype(jnp.float32) \
            + jnp.float32(row_offset - HALO) + r0.astype(jnp.float32)
        pos = g_row * jnp.float32(p) + lane_blk
        return jnp.logical_and(pos >= 0.0, pos < jnp.float32(t_valid))

    win = 2 * HALO + tile_r

    def window(l_ref, c_ref, r_ref):
        # the clamped/partial edge blocks carry garbage at the array
        # boundaries and in the tail of a non-divisible last tile; a chain of
        # 'same' convs sees zeros outside [0, t_valid)
        w = jnp.concatenate([l_ref[0], c_ref[0], r_ref[0]], axis=0)
        return jnp.where(valid_mask(win, 0), w, jnp.zeros_like(w))

    h = window(h_l, h_c, h_r)

    a1, a2, a3 = alphas_ref[0, 0], alphas_ref[0, 1], alphas_ref[0, 2]

    def prelu(y, a):
        # sign test in f32: Mosaic on v5e rejects sub-32-bit comparisons
        return jnp.where(y.astype(jnp.float32) >= 0.0, y,
                         (a * y.astype(jnp.float32)).astype(y.dtype))

    x = prelu(h, a1)

    # conv5: rows [HALO-2, HALO+tile_r+2) relative; offsets are static
    n1 = tile_r + 4
    o1 = HALO - 2
    acc = jnp.dot(x[o1 - d5 : o1 - d5 + n1], w5_ref[0],
                  preferred_element_type=jnp.float32)
    for j in range(1, 2 * d5 + 1):
        acc += jnp.dot(x[o1 - d5 + j : o1 - d5 + j + n1], w5_ref[j],
                       preferred_element_type=jnp.float32)
    cond_out = acc + b5_ref[0].astype(jnp.float32)

    cond_ref[0] = cond_out[2 : 2 + tile_r].astype(cond_ref.dtype)

    cc = cond_out
    if with_cond:
        cin = window(cond_l, cond_c, cond_r)
        cc = (cc + cin[o1 : o1 + n1].astype(jnp.float32)) * SQRT_HALF
    if with_film:
        gamma = film_ref[0, 0, :].astype(jnp.float32)
        beta = film_ref[0, 1, :].astype(jnp.float32)
        cc = gamma * cc + beta

    cc = jnp.where(valid_mask(n1, o1), cc, 0.0).astype(h.dtype)
    x2 = prelu(cc, a2)

    # conv3 #1: rows [HALO-1, HALO+tile_r+1); row halo is 1 for all P
    n2 = tile_r + 2
    acc2 = jnp.dot(x2[0:n2], w3a_ref[0], preferred_element_type=jnp.float32)
    for j in range(1, 3):
        acc2 += jnp.dot(x2[j : j + n2], w3a_ref[j],
                        preferred_element_type=jnp.float32)
    c2 = acc2 + b3a_ref[0].astype(jnp.float32)
    c2 = jnp.where(valid_mask(n2, HALO - 1), c2, 0.0).astype(h.dtype)
    x3 = prelu(c2, a3)

    # conv3 #2: central rows [HALO, HALO+tile_r)
    acc3 = jnp.dot(x3[0:tile_r], w3b_ref[0], preferred_element_type=jnp.float32)
    for j in range(1, 3):
        acc3 += jnp.dot(x3[j : j + tile_r], w3b_ref[j],
                        preferred_element_type=jnp.float32)
    c3 = acc3 + b3b_ref[0].astype(jnp.float32)

    v = (h[HALO : HALO + tile_r].astype(jnp.float32) + c3) * SQRT_HALF
    v_ref[0] = v.astype(v_ref.dtype)


def fused_conv_chain(
    h: jax.Array,
    w5: jax.Array, b5: jax.Array, alpha1: jax.Array,
    w3a: jax.Array, b3a: jax.Array, alpha2: jax.Array,
    w3b: jax.Array, b3b: jax.Array, alpha3: jax.Array,
    noise_cond: Optional[jax.Array] = None,
    input_cond: Optional[jax.Array] = None,
    tile_target: int = 2048,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Fused conv1 -> (cond/film) -> conv2 -> conv3 -> residual.

    h: (B, T, C); w5: (5, C, C); w3a/w3b: (3, C, C); biases (C,); alphas
    scalar PReLU slopes; noise_cond: (B, 2C) FiLM source; input_cond:
    (B, T, C) additive signal conditioning.  Returns (v, cond_out), or None
    when the shape doesn't tile cleanly (caller falls back to XLA).

    NOTE: at C < 128 the (B,T,C)->(B,T/P,PC) reshape is a physical relayout;
    callers already holding packed rows should use fused_conv_chain_rows.
    """
    b, t, c = h.shape
    p = max(1, 128 // c)
    if t % p != 0:
        return None
    out = fused_conv_chain_rows(
        h.reshape(b, t // p, p * c), p, c,
        w5, b5, alpha1, w3a, b3a, alpha2, w3b, b3b, alpha3,
        noise_cond=noise_cond,
        input_cond_rows=None if input_cond is None
        else input_cond.reshape(b, t // p, p * c),
        tile_target=tile_target)
    if out is None:
        return None
    v, cond_out = out
    return v.reshape(b, t, c), cond_out.reshape(b, t, c)


def fused_conv_chain_rows(
    h_rows: jax.Array, p: int, c: int,
    w5: jax.Array, b5: jax.Array, alpha1: jax.Array,
    w3a: jax.Array, b3a: jax.Array, alpha2: jax.Array,
    w3b: jax.Array, b3b: jax.Array, alpha3: jax.Array,
    noise_cond: Optional[jax.Array] = None,
    input_cond_rows: Optional[jax.Array] = None,
    tile_target: int = 2048,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Rows-level entry: operands already lane-packed (B, T/P, P*C)."""
    b, rows, lanes = h_rows.shape
    t = rows * p
    dtype = h_rows.dtype
    d5 = (2 + p - 1) // p  # conv5 row halo

    halo = _sublane(dtype)
    tile_r = pick_tile_rows(rows, tile_target, align=halo)
    if tile_r is None or rows < 2 * halo:
        return None
    n_tiles = -(-rows // tile_r)  # ceil: the partial tail tile is masked

    with_cond = input_cond_rows is not None
    with_film = noise_cond is not None

    if with_film:
        film = jnp.tile(noise_cond.reshape(b, 2, c), (1, 1, p))
    else:
        film = jnp.zeros((b, 2, lanes), dtype)

    w5p = _pack_conv_weights(w5, p)
    w3ap = _pack_conv_weights(w3a, p)
    w3bp = _pack_conv_weights(w3b, p)
    assert w5p.shape[0] == 2 * d5 + 1

    kernel = functools.partial(
        _kernel, tile_r=tile_r, n_tiles=n_tiles, p=p, c=c, t_valid=t, d5=d5,
        halo=halo, with_film=with_film, with_cond=with_cond)

    # halo overlap as two extra halo-row-sized BlockSpec inputs over the same
    # array (block granularity = halo rows, clamped at the edges, garbage
    # masked in-kernel): the Mosaic grid pipeline double-buffers them like
    # any other input, so total input traffic is (1 + 2*halo/tile_r) reads
    R = tile_r // halo          # halo blocks per tile
    NH = -(-rows // halo)       # total halo blocks (last may be partial)

    def spec_center():
        return pl.BlockSpec((1, tile_r, lanes), lambda b_, i: (b_, i, 0),
                            memory_space=pltpu.VMEM)

    def spec_left():
        return pl.BlockSpec((1, halo, lanes),
                            lambda b_, i: (b_, jnp.maximum(i * R - 1, 0), 0),
                            memory_space=pltpu.VMEM)

    def spec_right():
        return pl.BlockSpec(
            (1, halo, lanes),
            lambda b_, i: (b_, jnp.minimum(i * R + R, NH - 1), 0),
            memory_space=pltpu.VMEM)

    in_specs = [spec_left(), spec_center(), spec_right()]
    inputs = [h_rows, h_rows, h_rows]
    if with_cond:
        in_specs += [spec_left(), spec_center(), spec_right()]
        inputs += [input_cond_rows, input_cond_rows, input_cond_rows]
    else:
        dummy = jnp.zeros((b, 1, 1, lanes), dtype)
        tiny = pl.BlockSpec((1, 1, 1, lanes), lambda b_, i: (b_, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        in_specs += [tiny, tiny, tiny]
        inputs += [dummy, dummy, dummy]

    in_specs += [
        pl.BlockSpec((2 * d5 + 1, lanes, lanes), lambda b_, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lanes), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, lanes, lanes), lambda b_, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lanes), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, lanes, lanes), lambda b_, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lanes), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3), lambda b_, i: (0, 0),
                     memory_space=pltpu.SMEM),   # prelu alphas
        pl.BlockSpec((1, 2, lanes), lambda b_, i: (b_, 0, 0),
                     memory_space=pltpu.VMEM),   # film gamma/beta
    ]

    grid = (b, n_tiles)
    out_shape = [
        jax.ShapeDtypeStruct((b, rows, lanes), dtype),
        jax.ShapeDtypeStruct((b, rows, lanes), dtype),
    ]
    flops = 2 * b * rows * lanes * lanes * (2 * d5 + 1 + 6)
    itemsize = jnp.dtype(dtype).itemsize
    v, cond_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile_r, lanes), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r, lanes), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(5 if with_cond else 3) * b * t * c * itemsize,
            transcendentals=0),
        interpret=_config.interpret(),
    )(*inputs,
      w5p.astype(dtype), jnp.tile(b5, p).reshape(1, lanes).astype(dtype),
      w3ap.astype(dtype), jnp.tile(b3a, p).reshape(1, lanes).astype(dtype),
      w3bp.astype(dtype), jnp.tile(b3b, p).reshape(1, lanes).astype(dtype),
      jnp.stack([alpha1.reshape(()), alpha2.reshape(()),
                 alpha3.reshape(())]).reshape(1, 3).astype(jnp.float32),
      film.astype(dtype))

    return v, cond_out
