"""Pallas TPU kernel for the twin-CDT table search.

The search is, per lane: count how many entries of CDF table row c are
< u (u uniform uint64), with a Go-BinarySearch found -> pos-1 adjustment.
The XLA formulation (one-hot matmul over the whole lane set) materializes
[lanes, T] f32 intermediates in HBM — at 8.5M lanes that's ~7 GB of traffic
per plane.  This kernel keeps everything in VMEM:

* the tables are stored as 8 byte planes [8, 128, Tpad] f32 (most
  significant byte first), resident in VMEM (~1 MB);
* each grid step processes a chunk of C lanes: the one-hot [C, 128] bf16
  selection matmul against each byte plane runs on the MXU (all values
  <= 256, exact in bf16; partial sums are single selections, exact);
* the lexicographic compare-and-count over byte planes runs on the VPU.

Padding columns carry 256 in the top byte plane, which is greater than any
real byte, so they count as neither < nor == for every u.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048
N_TABLES = 128


def _byte_planes_tables(tables: np.ndarray) -> np.ndarray:
    """[128, T] u64 -> [8, 128, Tpad] f32 byte planes, MSB first; padding
    columns get 256 in the top plane."""
    ntab, T = tables.shape
    Tpad = -(-T // 8) * 8
    out = np.zeros((8, Tpad, ntab), dtype=np.float32)
    for b in range(8):
        shift = np.uint64(8 * (7 - b))
        out[b, :T, :] = ((tables >> shift) & np.uint64(0xFF)
                         ).astype(np.float32).T
    out[0, T:, :] = 256.0
    return out


def _kernel(c0_ref, c1_ref, u8_ref, tbl_ref, v0_ref, v1_ref):
    # lanes live in one [1, CHUNK] lane-major vector: the one-hot is
    # [128, CHUNK] and each dot is [T, 128] @ [128, CHUNK] — all lanes of
    # the chunk share one MXU matmul
    ids = jax.lax.broadcasted_iota(jnp.int32, (N_TABLES, 256), 0)

    def count_row(cc_row, r):
        oh = (cc_row[None, :] == ids).astype(jnp.bfloat16)  # [128, 256]
        lt = None
        eq = None
        for b in range(8):
            rb = jnp.dot(tbl_ref[b].astype(jnp.bfloat16), oh,
                         preferred_element_type=jnp.float32)  # [T, 256]
            ub = u8_ref[b, 0, r][None, :]
            blt = rb < ub
            beq = rb == ub
            if lt is None:
                lt, eq = blt, beq
            else:
                lt = lt | (eq & blt)
                eq = eq & beq
        n_lt = jnp.sum(lt.astype(jnp.int32), axis=0, dtype=jnp.int32)
        n_le = jnp.sum((lt | eq).astype(jnp.int32), axis=0, dtype=jnp.int32)
        return n_lt - (n_le > n_lt).astype(jnp.int32)

    for r in range(ROWS):
        v0_ref[0, r, :] = count_row(c0_ref[0, r], r)
        v1_ref[0, r, :] = count_row(c1_ref[0, r], r)


ROWS = CHUNK // 256  # chunk laid out [ROWS, 256] to satisfy TPU tiling
_Z = np.int32(0)
_i32 = lambda v: jnp.asarray(v, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(c0, c1, u8, tbl, interpret=False):
    n_chunks = c0.shape[0]
    grid = (n_chunks,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        # cast every index-map output to int32: under x64 they trace as i64
        # and Mosaic fails to legalize the kernel
        in_specs=[
            pl.BlockSpec((1, ROWS, 256), lambda i: (_i32(i), _Z, _Z)),
            pl.BlockSpec((1, ROWS, 256), lambda i: (_i32(i), _Z, _Z)),
            pl.BlockSpec((8, 1, ROWS, 256), lambda i: (_Z, _i32(i), _Z, _Z)),
            # full-array block with an explicit i32 index map: the bare
            # memory_space=VMEM spec auto-generates python-int (i64) indices
            pl.BlockSpec(tbl.shape, lambda i: (_Z, _Z, _Z)),
        ],
        out_specs=[
            pl.BlockSpec((1, ROWS, 256), lambda i: (_i32(i), _Z, _Z)),
            pl.BlockSpec((1, ROWS, 256), lambda i: (_i32(i), _Z, _Z)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, ROWS, 256), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks, ROWS, 256), jnp.int32),
        ],
        interpret=interpret,
    )(c0, c1, u8, tbl)


class TwinSearchPallas:
    """Holds the byte-plane tables for one sigma; callable from traced code."""

    def __init__(self, tables: np.ndarray):
        self.planes = _byte_planes_tables(tables)  # [8, 128, Tpad] f32

    def __call__(self, c0, c1, u, interpret: bool = False):
        """c0/c1 int32 [*shape], u uint64 [*shape] -> (v0, v1) int64.
        Must be called under jit (traced)."""
        shape = u.shape
        n = int(np.prod(shape))
        n_pad = -(-n // CHUNK) * CHUNK
        pad = [(0, n_pad - n)]
        c0f = jnp.pad(c0.reshape(-1).astype(jnp.int32), pad
                      ).reshape(-1, ROWS, 256)
        c1f = jnp.pad(c1.reshape(-1).astype(jnp.int32), pad
                      ).reshape(-1, ROWS, 256)
        uf = jnp.pad(u.reshape(-1), pad)
        u8 = jnp.stack([((uf >> jnp.uint64(8 * (7 - b))) & jnp.uint64(0xFF)
                         ).astype(jnp.float32) for b in range(8)])
        u8 = u8.reshape(8, -1, ROWS, 256)
        v0, v1 = _run(c0f, c1f, u8, self.planes, interpret=interpret)
        v0 = v0.reshape(-1)[:n].reshape(shape).astype(jnp.int64)
        v1 = v1.reshape(-1)[:n].reshape(shape).astype(jnp.int64)
        return v0, v1
