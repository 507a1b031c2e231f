"""Jindo protocol objects: CommitKey / Commitment / Opening / Proof.

Tensorized counterparts of reference jindo/entities.go: instead of nested
slices of ring.Poly, each object is a handful of stacked digit-plane arrays
([2, L, *batch, d]) so the whole commitment pipeline is a few large
vectorized ops.

CommitKey expansion is bit-compatible with the reference (AES-CTR from the
CRS seed, SampleN per (coefficient, level) in the same order,
entities.go:21-73), so the same CRS yields the same key as the Go library.
"""

from __future__ import annotations

import numpy as np

from ..csprng import UniformSampler
from .params import Parameters


def _sample_ring_polys(u: UniformSampler, ring, count: int) -> np.ndarray:
    """count uniform polys over `ring`, reference sampling order: per poly,
    per coefficient k, per level l: SampleN(q_l)."""
    d, L = ring.d, ring.L
    qs = np.array(ring.primes, dtype=np.uint64)
    bounds = np.array([(1 << 64) - 1 - ((1 << 64) - 1) % int(q) for q in qs],
                      dtype=np.uint64)
    snap = u._snapshot()
    draws = u.sample_u64(count * d * L).reshape(count, d, L)
    if bool((draws < bounds).all()):
        res = draws % qs
    else:  # astronomically rare: replay in exact scalar order
        u._restore(snap)
        res = np.empty((count, d, L), dtype=np.uint64)
        for c in range(count):
            for k in range(d):
                for l in range(L):
                    res[c, k, l] = u.sample_n(int(qs[l]), 1)[0]
    res = np.moveaxis(res, -1, 0)  # [L, count, d]
    return ring.from_u64(res)      # [2, L, count, d]


class CommitKey:
    """CRS-expanded commitment matrices (reference entities.go:12-77).

    In   [2, L,  inR*rows,       d]  over ring_q
    MLWE [2, L,  inR*mlweRank,   d]  over ring_q
    Out  [2, LO, outR*dcmpLen,   d]  over ring_q_out
    """

    def __init__(self, params: Parameters, crs: bytes):
        self.crs = bytes(crs)
        u = UniformSampler(self.crs)
        p = params
        self.In = _sample_ring_polys(u, p.ring_q, p.in_msis_rank * p.rows)
        self.MLWE = _sample_ring_polys(u, p.ring_q, p.in_msis_rank * p.mlwe_rank)
        self.Out = _sample_ring_polys(u, p.ring_q_out,
                                      p.out_msis_rank * p.in_com_dcmp_len)
        # convenience views
        self.In = self.In.reshape(2, p.ring_q.L, p.in_msis_rank, p.rows, p.ring_q.d)
        self.MLWE = self.MLWE.reshape(2, p.ring_q.L, p.in_msis_rank, p.mlwe_rank,
                                      p.ring_q.d)
        self.Out = self.Out.reshape(2, p.ring_q_out.L, p.out_msis_rank,
                                    p.in_com_dcmp_len, p.ring_q_out.d)

    def raw_bytes(self) -> bytes:
        """Strong FS binds the key through its CRS seed only
        (reference WriteRawTo, entities.go:75-77)."""
        return self.crs


class Commitment:
    """Outer commitment: [2, LO, outMSISRank, d] over ring_q_out, NTT+MForm."""

    def __init__(self, params: Parameters, value: np.ndarray | None = None):
        self.params = params
        if value is None:
            value = params.ring_q_out.new_poly(params.out_msis_rank)
        self.value = value

    def raw_bytes(self) -> bytes:
        return self.params.ring_q_out.to_bytes(self.value)

    # -- wire format (beyond the reference, which keeps proofs in memory) ---

    def to_bytes(self) -> bytes:
        return self.raw_bytes()

    @classmethod
    def from_bytes(cls, params: Parameters, data: bytes) -> "Commitment":
        ring = params.ring_q_out
        shape = (ring.L, params.out_msis_rank, ring.d)
        u = np.frombuffer(data, dtype="<u8").astype(np.uint64).reshape(shape)
        return cls(params, ring.from_u64(u))


class Opening:
    """Commitment opening (reference entities.go:102-137).

    The Encode/MLWE tensors dominate prover memory (hundreds of MB per
    commitment at N=2^19), but are deterministic NTT images of the signed
    encode coefficients — so an Opening can instead carry those compact
    int64 ``seeds`` plus a ``materializer`` that recomputes the tensors on
    demand (batched evaluation streams the seeds through one scan and never
    materializes per-commitment tensors at all)."""

    def __init__(self, params: Parameters,
                 in_commit=None, encode=None, mlwe=None,
                 seeds=None, materializer=None, v_dev=None, v_src=None):
        p = params
        self.in_commit = (p.ring_q_out.new_poly(p.in_com_dcmp_len)
                          if in_commit is None else in_commit)
        self.seeds = seeds
        self.v_dev = v_dev  # device copy of the committed value planes
        self.v_src = v_src  # identity of the host array committed (see
        #                     Prover.evaluate: v_dev substitutes for vs[i]
        #                     only when the caller passes the same object)
        self._materializer = materializer
        if encode is None and seeds is None:
            encode = p.ring_q.new_poly(p.cols + 1, p.rows)
        if mlwe is None and seeds is None:
            mlwe = p.ring_q.new_poly(p.cols + 1, p.mlwe_rank + p.in_msis_rank)
        self._encode = encode
        self._mlwe = mlwe

    def _materialize(self):
        if self._encode is None:
            self._encode, self._mlwe = self._materializer(*self.seeds)

    @property
    def encode(self):
        self._materialize()
        return self._encode

    @encode.setter
    def encode(self, value):
        self._encode = value

    @property
    def mlwe(self):
        self._materialize()
        return self._mlwe

    @mlwe.setter
    def mlwe(self, value):
        self._mlwe = value


class Proof:
    """Evaluation proof (reference entities.go:139-179)."""

    FIELDS = ("in_commit", "partial", "partial_mask", "encode", "mlwe")

    def __init__(self, params: Parameters):
        p = params
        self.in_commit = p.ring_q_out.new_poly(p.in_com_dcmp_len)
        self.partial = p.ring_q.new_poly(p.cols)
        self.partial_mask = p.ring_q.new_poly()
        self.encode = p.ring_q.new_poly(p.rows)
        self.mlwe = p.ring_q.new_poly(p.mlwe_rank + p.in_msis_rank)

    def _rings(self, params):
        return {"in_commit": params.ring_q_out, "partial": params.ring_q,
                "partial_mask": params.ring_q, "encode": params.ring_q,
                "mlwe": params.ring_q}

    def to_bytes(self, params: Parameters) -> bytes:
        rings = self._rings(params)
        return b"".join(rings[f].to_bytes(np.asarray(getattr(self, f)))
                        for f in self.FIELDS)

    @classmethod
    def from_bytes(cls, params: Parameters, data: bytes) -> "Proof":
        pf = cls(params)
        rings = pf._rings(params)
        off = 0
        for f in cls.FIELDS:
            cur = np.asarray(getattr(pf, f))
            shape = (cur.shape[1],) + cur.shape[2:]  # drop digit axis -> u64
            n = int(np.prod(shape)) * 8
            u = np.frombuffer(data[off:off + n], dtype="<u8"
                              ).astype(np.uint64).reshape(shape)
            setattr(pf, f, rings[f].from_u64(u))
            off += n
        if off != len(data):
            raise ValueError("proof byte length mismatch")
        return pf
