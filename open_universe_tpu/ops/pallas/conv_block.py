"""Fused UNIVERSE ConvBlock core as a Pallas TPU kernel.

The ConvBlock conv chain (reference blocks.py:383-399, our nn/blocks.py)

    cond_out = conv5(prelu(h))
    c        = film((cond_out [+ input_cond]) * sqrt(1/2), noise_cond)
    c        = conv3(prelu(c)); c = conv3(prelu(c))
    v        = (h + c) * sqrt(1/2)

is memory-bound in XLA at the shallow network levels (C = 32..128 at
T = 16k..32k: ~12 HBM traversals of large activations) and wastes MXU lanes
(C < 128).  This kernel:

  * packs P = 128 // C consecutive samples into the lane dimension, so every
    row is a full 128-lane vector: x_packed (B, T/P, P*C);
  * re-expresses each 1-D conv as a sum of 2*J+1 (rows, 128) x (128, 128)
    block-Toeplitz matmuls (y[r] = sum_j x[r+j] @ W_j with
    W_j[pC:(p+1)C, qC:(q+1)C] = w[jP + p - q + K//2]);
  * streams one (TILE_R + 16, 128) row window per grid step into VMEM
    (manual DMA — the convs need a halo, which BlockSpec tiling can't
    express) and runs the whole chain in VMEM, writing exactly two outputs.

HBM traffic drops to ~2 reads + 2 writes per element and every matmul uses
the full MXU width.  Intermediate activations outside [0, T) are masked to
zero, matching the zero padding a chain of 'same' convs inserts in XLA.

Inference-path only (no custom VJP yet); weight norm must be folded.
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

LPAD = 8  # row padding on each side (sublane-aligned halo)
SQRT_HALF = 1.0 / math.sqrt(2.0)


def _pack_conv_weights(w: jax.Array, p: int) -> jax.Array:
    """(K, C, C) tap weights -> (2J+1, P*C, P*C) block-Toeplitz row weights."""
    k, c, _ = w.shape
    half = k // 2
    jmax = (half + p - 1) // p
    out = jnp.zeros((2 * jmax + 1, p * c, p * c), w.dtype)
    for j in range(-jmax, jmax + 1):
        for pp in range(p):
            for q in range(p):
                tap = j * p + pp - q + half
                if 0 <= tap < k:
                    out = out.at[j + jmax, pp * c:(pp + 1) * c,
                                 q * c:(q + 1) * c].set(w[tap])
    return out


def _kernel(h_hbm, cond_in_hbm, w5_ref, b5_ref, w3a_ref, b3a_ref,
            w3b_ref, b3b_ref, alphas_ref, film_ref,
            v_ref, cond_ref, h_scratch, c_scratch, sem0, sem1,
            *, tile_r: int, p: int, c: int, t_valid: int, d5: int,
            with_film: bool, with_cond: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * tile_r
    lanes = p * c

    dma_h = pltpu.make_async_copy(
        h_hbm.at[b, pl.ds(r0, tile_r + 2 * LPAD), :], h_scratch, sem0)
    dma_h.start()
    if with_cond:
        dma_c = pltpu.make_async_copy(
            cond_in_hbm.at[b, pl.ds(r0, tile_r + 2 * LPAD), :], c_scratch,
            sem1)
        dma_c.start()
    dma_h.wait()

    lane_blk = (jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
                // c).astype(jnp.float32)

    def valid_mask(n_rows, row_offset):
        # global sample index of each (row, lane) element (float math: Mosaic
        # supports f32 comparisons on all layouts)
        g_row = jax.lax.broadcasted_iota(
            jnp.int32, (n_rows, 1), 0).astype(jnp.float32) \
            + jnp.float32(row_offset - LPAD) + r0.astype(jnp.float32)
        pos = g_row * jnp.float32(p) + lane_blk
        return jnp.logical_and(pos >= 0.0, pos < jnp.float32(t_valid))

    h = h_scratch[:]
    a1, a2, a3 = alphas_ref[0, 0], alphas_ref[0, 1], alphas_ref[0, 2]

    def prelu(y, a):
        # sign test in f32: Mosaic on v5e rejects sub-32-bit comparisons
        return jnp.where(y.astype(jnp.float32) >= 0.0, y,
                         (a * y.astype(jnp.float32)).astype(y.dtype))

    x = prelu(h, a1)

    # conv5: rows [LPAD-2, LPAD+tile_r+2) relative; offsets are static
    n1 = tile_r + 4
    o1 = LPAD - 2
    acc = jnp.dot(x[o1 - d5 : o1 - d5 + n1], w5_ref[0],
                  preferred_element_type=jnp.float32)
    for j in range(1, 2 * d5 + 1):
        acc += jnp.dot(x[o1 - d5 + j : o1 - d5 + j + n1], w5_ref[j],
                       preferred_element_type=jnp.float32)
    cond_out = acc + b5_ref[0].astype(jnp.float32)

    cond_ref[0] = cond_out[2 : 2 + tile_r].astype(cond_ref.dtype)

    cc = cond_out
    if with_cond:
        dma_c.wait()
        cc = (cc + c_scratch[o1 : o1 + n1].astype(jnp.float32)) * SQRT_HALF
    if with_film:
        gamma = film_ref[0, 0, :].astype(jnp.float32)
        beta = film_ref[0, 1, :].astype(jnp.float32)
        cc = gamma * cc + beta

    cc = jnp.where(valid_mask(n1, o1), cc, 0.0).astype(h.dtype)
    x2 = prelu(cc, a2)

    # conv3 #1: rows [LPAD-1, LPAD+tile_r+1); d3 == 1 for all P
    n2 = tile_r + 2
    acc2 = jnp.dot(x2[0:n2], w3a_ref[0], preferred_element_type=jnp.float32)
    for j in range(1, 3):
        acc2 += jnp.dot(x2[j : j + n2], w3a_ref[j],
                        preferred_element_type=jnp.float32)
    c2 = acc2 + b3a_ref[0].astype(jnp.float32)
    c2 = jnp.where(valid_mask(n2, LPAD - 1), c2, 0.0).astype(h.dtype)
    x3 = prelu(c2, a3)

    # conv3 #2: central rows [LPAD, LPAD+tile_r)
    acc3 = jnp.dot(x3[0:tile_r], w3b_ref[0], preferred_element_type=jnp.float32)
    for j in range(1, 3):
        acc3 += jnp.dot(x3[j : j + tile_r], w3b_ref[j],
                        preferred_element_type=jnp.float32)
    c3 = acc3 + b3b_ref[0].astype(jnp.float32)

    v = (h[LPAD : LPAD + tile_r].astype(jnp.float32) + c3) * SQRT_HALF
    v_ref[0] = v.astype(v_ref.dtype)


def fused_conv_chain(
    h: jax.Array,
    w5: jax.Array, b5: jax.Array, alpha1: jax.Array,
    w3a: jax.Array, b3a: jax.Array, alpha2: jax.Array,
    w3b: jax.Array, b3b: jax.Array, alpha3: jax.Array,
    noise_cond: Optional[jax.Array] = None,
    input_cond: Optional[jax.Array] = None,
    tile_r: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Fused conv1 -> (cond/film) -> conv2 -> conv3 -> residual.

    h: (B, T, C); w5: (5, C, C); w3a/w3b: (3, C, C); biases (C,); alphas
    scalar PReLU slopes; noise_cond: (B, 2C) FiLM source; input_cond:
    (B, T, C) additive signal conditioning.  Returns (v, cond_out).
    """
    b, t, c = h.shape
    dtype = h.dtype
    p = max(1, 128 // c)
    lanes = p * c
    d5 = (2 + p - 1) // p  # conv5 row halo

    rows = -(-t // p)
    rows_pad = -rows % tile_r
    n_tiles = (rows + rows_pad) // tile_r

    def pack(x):
        xp = jnp.pad(x, ((0, 0), (0, rows * p - t), (0, 0)))
        xp = xp.reshape(b, rows, lanes)
        return jnp.pad(xp, ((0, 0), (LPAD, LPAD + rows_pad), (0, 0)))

    h_p = pack(h)
    if input_cond is not None:
        cond_in = pack(input_cond)
    else:
        cond_in = jnp.zeros((b, 1, lanes), dtype)

    if noise_cond is not None:
        film = jnp.tile(noise_cond.reshape(b, 2, c), (1, 1, p))
    else:
        film = jnp.zeros((b, 2, lanes), dtype)

    w5p = _pack_conv_weights(w5, p)
    w3ap = _pack_conv_weights(w3a, p)
    w3bp = _pack_conv_weights(w3b, p)
    b5p = jnp.tile(b5, p).reshape(1, lanes)
    b3ap = jnp.tile(b3a, p).reshape(1, lanes)
    b3bp = jnp.tile(b3b, p).reshape(1, lanes)
    assert w5p.shape[0] == 2 * d5 + 1
    assert w3ap.shape[0] == 3 and w3bp.shape[0] == 3

    kernel = functools.partial(
        _kernel, tile_r=tile_r, p=p, c=c, t_valid=t, d5=d5,
        with_film=noise_cond is not None,
        with_cond=input_cond is not None)

    grid = (b, n_tiles)
    r_out = rows + rows_pad
    out_shape = [
        jax.ShapeDtypeStruct((b, r_out, lanes), dtype),
        jax.ShapeDtypeStruct((b, r_out, lanes), dtype),
    ]
    flops = 2 * b * r_out * lanes * lanes * (2 * d5 + 1 + 6)
    itemsize = jnp.dtype(dtype).itemsize
    v, cond_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # h (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # input_cond (manual DMA)
            pl.BlockSpec((2 * d5 + 1, lanes, lanes), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lanes, lanes), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, lanes, lanes), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),   # prelu alphas
            pl.BlockSpec((1, 2, lanes), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # film gamma/beta
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r, lanes), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r, lanes), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_r + 2 * LPAD, lanes), dtype),
            pltpu.VMEM((tile_r + 2 * LPAD, lanes), dtype)
            if input_cond is not None else pltpu.VMEM((8, lanes), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * b * t * c * itemsize,
            transcendentals=0),
        interpret=_config.interpret(),
    )(h_p, cond_in, w5p, b5p, w3ap, b3ap, w3bp, b3bp,
      jnp.stack([alpha1.reshape(()), alpha2.reshape(()),
                 alpha3.reshape(())]).reshape(1, 3).astype(jnp.float32),
      film.astype(dtype))

    def unpack(y):
        y = y[:, :rows].reshape(b, rows * p, c)
        return y[:, :t]

    return unpack(v), unpack(cond_out)
