"""Pallas TPU kernel for the ChaCha20 keystream.

The XLA formulation of the 20 ARX rounds over a [16, n_blocks] state is a
~1000-op elementwise chain; XLA's fusion splits it into dozens of HBM
passes (~170ms for the 2^19-commit's 68MB of entropy — memory, not
compute).  This kernel runs all rounds in VMEM: each grid step materializes
TILE blocks of state (16 x TILE u32 = 512KB at TILE=8192), does the 10
double-rounds in registers, and writes each block's 16 words once.

Output layout matches ``chacha.keystream_u32(...)`` exactly:
out[b, w] = word w of block b (verified bit-equal in tests/test_csprng.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..csprng.chacha import CONSTANTS, _COLUMNS, _DIAGONALS

TILE = 8192  # blocks per grid step; 16 words * TILE * 4B = 512KB VMEM
_SUB = 8     # state vectors shaped [_SUB, TILE // _SUB] for TPU tiling


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _quarter(a, b, c, d):
    a = a + b
    d = _rotl(d ^ a, 16)
    c = c + d
    b = _rotl(b ^ c, 12)
    a = a + b
    d = _rotl(d ^ a, 8)
    c = c + d
    b = _rotl(b ^ c, 7)
    return a, b, c, d


def _kernel(key_ref, out_ref):
    i = jnp.asarray(pl.program_id(0), jnp.int32)
    lanes = TILE // _SUB
    base = (i * jnp.int32(TILE)).astype(jnp.uint32)
    ctr = (base
           + jax.lax.broadcasted_iota(jnp.uint32, (_SUB, lanes), 0)
           * jnp.uint32(lanes)
           + jax.lax.broadcasted_iota(jnp.uint32, (_SUB, lanes), 1))
    zero = jnp.zeros((_SUB, lanes), dtype=jnp.uint32)
    state = [zero + jnp.uint32(int(c)) for c in CONSTANTS]
    state += [zero + key_ref[0, k] for k in range(8)]
    state += [ctr, zero, zero, zero]  # 64-bit counter (hi fits u32), nonce 0
    x = list(state)
    for _ in range(10):
        for (a, b, c, d) in _COLUMNS:
            x[a], x[b], x[c], x[d] = _quarter(x[a], x[b], x[c], x[d])
        for (a, b, c, d) in _DIAGONALS:
            x[a], x[b], x[c], x[d] = _quarter(x[a], x[b], x[c], x[d])
    for w in range(16):
        out_ref[w] = x[w] + state[w]


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def keystream_u32_pallas(key, n_blocks: int):
    """ChaCha20 keystream [n_blocks, 16] u32 (counter0 = 0, nonce 0) — the
    layout of chacha.keystream_u32."""
    n_tiles = -(-n_blocks // TILE)
    lanes = TILE // _SUB
    # cast every index-map output to int32: under x64 they trace as i64
    # and Mosaic fails to legalize the kernel (same fix as twin_pallas)
    _Z = np.int32(0)
    _i32 = lambda v: jnp.asarray(v, jnp.int32)
    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, 8), lambda i: (_Z, _Z),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((16, _SUB, lanes),
                               lambda i: (_i32(i), _Z, _Z)),
        out_shape=jax.ShapeDtypeStruct((16 * n_tiles, _SUB, lanes),
                                       jnp.uint32),
    )(key.reshape(1, 8))
    # [n_tiles*16, _SUB, lanes] -> [n_tiles, 16, TILE] -> [blocks, 16]
    out = out.reshape(n_tiles, 16, TILE)
    out = jnp.moveaxis(out, 1, 2).reshape(n_tiles * TILE, 16)
    return out[:n_blocks]
