"""Pallas TPU kernel for the twin-CDT table search.

The search is, per lane: count how many entries of CDF table row c are
< u (u uniform uint64), with a Go-BinarySearch found -> pos-1 adjustment.
The XLA formulation (one-hot matmul over the whole lane set) materializes
[lanes, T] f32 intermediates in HBM — at 8.5M lanes that's ~7 GB of traffic
per plane.  This kernel keeps everything in VMEM and prunes the compare to
a 24-bit first tier:

* the tables are stored as byte planes [8, 128, Tpad] f32 (most
  significant byte first), resident in VMEM (~1 MB);
* each grid step processes a chunk of C lanes: the one-hot [C, 128] bf16
  selection matmul against a byte plane runs on the MXU (all values
  <= 256, exact in bf16; partial sums are single selections, exact);
* only the TOP THREE byte planes (24 bits) are compared in-kernel — the
  order of u against every table entry is already decided at 24 bits
  unless some entry's top 24 bits tie u's exactly (probability ~T * 2^-24
  per lane, i.e. dozens of lanes per ten million).  Tied lanes are flagged
  and re-counted exactly in u64 outside the kernel (the XLA one-hot count
  on the tiny flagged subset), so the result is bit-identical to the full
  64-bit search at ~3/8 the MXU work.

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
TIER1_PLANES = 3  # 24-bit first tier


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


def _kernel(c0_ref, c1_ref, u8_ref, tbl_ref, v0_ref, v1_ref, a0_ref, a1_ref):
    # the whole chunk shares ONE one-hot [128, CHUNK] and one MXU dot per
    # byte plane: [T, 128] @ [128, CHUNK].  Every tensor keeps the chunk as
    # the LANE axis (shape [.., 1, CHUNK]) end to end — no in-kernel
    # reshapes; lane<->sublane shape casts are not legal in Mosaic.
    ids = jax.lax.broadcasted_iota(jnp.int32, (N_TABLES, CHUNK), 0)

    def count_all(cc):
        oh = (cc == ids).astype(jnp.bfloat16)               # [128, CHUNK]
        lt = None
        eq = None
        for b in range(TIER1_PLANES):
            rb = jnp.dot(tbl_ref[b].astype(jnp.bfloat16), oh,
                         preferred_element_type=jnp.float32)  # [T, CHUNK]
            ub = u8_ref[b, 0]                               # [1, CHUNK]
            blt = rb < ub
            beq = rb == ub
            if lt is None:
                lt, eq = blt, beq
            else:
                lt = lt | (eq & blt)
                eq = eq & beq
        n_lt = jnp.sum(lt.astype(jnp.int32), axis=0, keepdims=True,
                       dtype=jnp.int32)
        # eq = some entry ties u's top 24 bits: order undecided -> flag
        amb = jnp.sum(eq.astype(jnp.int32), axis=0, keepdims=True,
                      dtype=jnp.int32)
        return n_lt, (amb > 0).astype(jnp.int32)            # [1, CHUNK]

    v0_ref[0], a0_ref[0] = count_all(c0_ref[0])
    v1_ref[0], a1_ref[0] = count_all(c1_ref[0])


_Z = np.int32(0)
_i32 = lambda v: jnp.asarray(v, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(c0, c1, u8, tbl, interpret=False):
    n_chunks = c0.shape[0]
    grid = (n_chunks,)
    blk = lambda: pl.BlockSpec((1, 1, CHUNK), lambda i: (_i32(i), _Z, _Z))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        # cast every index-map output to int32: under x64 they trace as i64
        # and Mosaic fails to legalize the kernel
        in_specs=[
            blk(),
            blk(),
            pl.BlockSpec((8, 1, 1, CHUNK), lambda i: (_Z, _i32(i), _Z, _Z)),
            # full-array block with an explicit i32 index map: the bare
            # memory_space=VMEM spec auto-generates python-int (i64) indices
            pl.BlockSpec(tbl.shape, lambda i: (_Z, _Z, _Z)),
        ],
        out_specs=[blk(), blk(), blk(), blk()],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 1, CHUNK), jnp.int32)
            for _ in range(4)
        ],
        interpret=interpret,
    )(c0, c1, u8, tbl)


class TwinSearchPallas:
    """Holds the byte-plane tables for one sigma; callable from traced code.

    ``sampler`` is the owning TwinCDTDevice — its exact u64 `_count_search`
    re-resolves the (rare) lanes whose 24-bit first tier ties."""

    def __init__(self, sampler):
        self.sampler = sampler
        # [8,128,Tpad] f32 — registered on the sampler (devconst) so traced
        # callers can supply it as a jit argument instead of a constant
        planes = getattr(sampler, "pallas_planes", None)
        if planes is None:  # pragma: no cover — sampler built without jax
            from . import devconst

            planes = devconst.register(sampler, "pallas_planes",
                                       _byte_planes_tables(sampler.tables))
            sampler.pallas_planes = planes
        self.planes = planes

    def __call__(self, c0, c1, u, interpret: bool = False):
        """c0/c1 int32 [*shape], u uint64 [*shape] -> (v0, v1) int64.
        Must be called under jit (traced)."""
        from ..fields import limb

        shape = u.shape
        n = int(np.prod(shape))
        n_pad = -(-n // CHUNK) * CHUNK
        pad = [(0, n_pad - n)]
        c0f = jnp.pad(c0.reshape(-1).astype(jnp.int32), pad
                      ).reshape(-1, 1, CHUNK)
        c1f = jnp.pad(c1.reshape(-1).astype(jnp.int32), pad
                      ).reshape(-1, 1, CHUNK)
        uf = jnp.pad(u.reshape(-1), pad)
        u8 = jnp.stack([((uf >> jnp.uint64(8 * (7 - b))) & jnp.uint64(0xFF)
                         ).astype(jnp.float32) for b in range(8)])
        u8 = u8.reshape(8, -1, 1, CHUNK)
        from . import devconst
        tbl = devconst.get(self.sampler, "pallas_planes")
        v0, v1, a0, a1 = _run(c0f, c1f, u8, tbl, interpret=interpret)
        v0 = v0.reshape(-1)[:n]
        v1 = v1.reshape(-1)[:n]
        amb = (a0.reshape(-1)[:n] | a1.reshape(-1)[:n]) > 0

        # tier 2: exact u64 recount of tied lanes.  E[#tied] ~ n * T * 2^-24
        # (~8e-6 per lane); the cap is >400x the mean at n = 8.5M, so an
        # overflow is not a statistical event (Chernoff exponent < -1e5).
        cap = max(4096, n >> 8)
        idx = limb.nonzero_idx(jnp, amb, cap)
        safe = jnp.minimum(idx, n - 1)
        u_sub = jnp.take(u.reshape(-1), safe)
        c0_sub = jnp.take(c0.reshape(-1).astype(jnp.int32), safe)
        c1_sub = jnp.take(c1.reshape(-1).astype(jnp.int32), safe)
        e0 = self.sampler._count_search(jnp, c0_sub, u_sub).astype(jnp.int32)
        e1 = self.sampler._count_search(jnp, c1_sub, u_sub).astype(jnp.int32)
        v0 = v0.at[idx].set(e0, mode="drop")
        v1 = v1.at[idx].set(e1, mode="drop")
        v0 = v0.reshape(shape).astype(jnp.int64)
        v1 = v1.reshape(shape).astype(jnp.int64)
        return v0, v1
