"""Buckler prover (reference buckler/prover.go): the ~10-round
commit-then-challenge PIOP pipeline.  Each round is a handful of batched
tensor ops (encodes, embedding-ring NTTs, pointwise constraint evaluation)
followed by one Fiat-Shamir absorption — the structure that keeps TPU work
coarse between host syncs."""

from __future__ import annotations

import numpy as np

from ..csprng import UniformSampler
from ..fields import limb
from ..jindo.prover import sample_field_digits
from ..rings.bigring import FPoly
from ..utils.transcript import Shake128Stream, Transcript
from ..utils import profiling
from .entities import Proof
from .utils import (balanced_int64, decompose_base, decompose_big,
                    decompose_big_vec, ternary_planes)
from .witness import get_path

CHALLENGE_NAMES = [
    "projConst", "arithBatchConst", "linCheckBatchConst",
    "linCheckConst", "sumCheckBatchConst", "evalPoint",
]


def to_planes(value, ops, rank: int) -> np.ndarray:
    """Normalize a witness assignment to [w, rank] digit planes (in the
    ring's representation — Montgomery on the numpy path, plain under jax)."""
    if isinstance(value, FPoly):
        value = value.coeffs
    if hasattr(value, "dtype") and value.dtype == np.uint32:
        if value.shape != (ops.w, rank):
            raise ValueError("witness rank mismatch")
        return np.asarray(value)
    vals = list(value)
    if len(vals) != rank:
        raise ValueError("witness rank mismatch")
    return np.asarray(ops.from_ints([int(v) for v in vals]))


class Prover:
    def __init__(self, params, poly_ring, ecd, ctx, jindo_prover,
                 pw_paths, w_paths, seed: bytes | None = None):
        self.params = params
        self.spec = params.spec
        self.poly_ring = poly_ring          # CyclicRing over embed rank
        self.ecd = ecd                      # interpolation encoder
        self.ctx = ctx
        self.jindo = jindo_prover
        self.pw_paths = pw_paths
        self.w_paths = w_paths
        self.uniform = UniformSampler(None if seed is None else seed + b"bk")

    # -- helpers ---------------------------------------------------------

    def _rand_field(self, n: int) -> np.ndarray:
        return sample_field_digits(self.spec, n, self.uniform)

    def _balanced(self, plain_planes) -> np.ndarray:
        """Plain digit planes [w, n] -> balanced Python-int-exact int64
        object array.  Fast vectorized path for norm-bounded values; the
        (invalid-witness) lanes too large for int64 fall back to exact
        Python ints so semantics match decompose_big everywhere."""
        planes = np.asarray(plain_planes)
        xs, fits = balanced_int64(planes, self.spec)
        if fits.all():
            return xs
        out = xs.astype(object)
        p, half = self.spec.p, self.spec.p >> 1
        bad = np.nonzero(~fits)[0]
        vals = limb.digits_to_ints(planes[:, bad])
        for j, i in enumerate(bad):
            v = vals[j]
            out[i] = v - p if v > half else v
        return out

    def _decompose_vec(self, plain_planes, base: list[int]) -> np.ndarray:
        """Vectorized decompose_big over a witness vector: plain planes
        [w, n] -> signed digits [len(base), n] int64."""
        xs = self._balanced(plain_planes)
        if xs.dtype == object:
            n = xs.shape[0]
            out = np.zeros((len(base), n), dtype=np.int64)
            for i in range(n):
                x = int(xs[i])
                for j, b in enumerate(base):
                    if x >= b:
                        out[j, i] = 1
                        x -= b
                    elif x <= -b:
                        out[j, i] = -1
                        x += b
            return out
        return decompose_big_vec(xs, base)

    def _sum_check_mask(self, mask_rank: int) -> tuple[FPoly, int]:
        """Random mask with known subgroup sum (reference sumCheckMask,
        prover.go:381-397): final[i] = r[i] - r[i+rank], maskSum = r[0]."""
        ctx = self.ctx
        ops = self.poly_ring.ops
        r = np.zeros((self.spec.w, mask_rank), dtype=np.uint32)
        r[:, :mask_rank] = self._rand_field(mask_rank)
        mask = np.zeros((self.spec.w, self.poly_ring.rank), dtype=np.uint32)
        mask[:, :mask_rank] = r
        pd = self.spec.p_digits.reshape(self.spec.w, 1)
        n_fold = mask_rank - ctx.rank
        if n_fold > 0:
            mask[:, :n_fold] = limb.sub(mask[:, :n_fold],
                                        r[:, ctx.rank:mask_rank], pd)
        mask_sum = ops.to_ints(r[:, 0:1])[0]
        return FPoly(mask, False), mask_sum

    def _eval_circuit(self, batch_const: int, constraints, w_ntt, pw_ntt) -> FPoly:
        """NTT-domain constraint evaluation (reference evalCircuit,
        prover.go:355-379).  Default mode is faithful to the reference:
        every constraint is scaled by the *same* batch constant (the
        scaling is applied per constraint after accumulation, not
        Horner-chained), so distinct violated constraints can cancel.  In
        strict mode constraint i is scaled by batchConst^(i+1) instead."""
        ring = self.poly_ring
        mod = self.spec.p
        scale = batch_const
        out = None
        for c in constraints:
            ev = None
            for t in c.terms:
                polys = ([] if t.pw_id is None else [pw_ntt[t.pw_id]])
                polys += [w_ntt[wid] for wid in t.w_ids]
                if polys:
                    # multiply the witness polys first, scalar-scale by the
                    # coefficient last: avoids materializing (and uploading)
                    # a full-rank constant poly per term
                    term = polys[0]
                    for q in polys[1:]:
                        term = ring.mul(term, q)
                    term = FPoly(ring.ops.mul(
                        term.coeffs, ring.ops.const(t.coeff, (1,))), True)
                else:
                    term = FPoly(ring.ops.const(t.coeff, (ring.rank,)), True)
                ev = term if ev is None else ring.add(ev, term)
            if ev is None:
                continue
            ev = FPoly(ring.ops.mul(ev.coeffs, ring.ops.const(scale, (1,))),
                       True)
            out = ev if out is None else ring.add(out, ev)
            if self.ctx.strict:
                scale = scale * batch_const % mod
        return out if out is not None else ring.new_poly(True)

    def _lin_check_vectors(self, lin_check_const: int):
        """Powers of the linCheck challenge as value planes [w, rank] — on
        device under jax (ops/horner power doubling), host big-int loop on
        numpy (where planes are Montgomery-form)."""
        from .. import backend
        if backend.is_jax() and self.poly_ring.plain:
            if not hasattr(self, "_horner"):
                from ..ops.horner import HornerPlan
                self._horner = HornerPlan(self.spec)
            return self._horner.powers(lin_check_const, self.ctx.rank)
        p = self.spec.p
        vec = [1] * self.ctx.rank
        for i in range(1, self.ctx.rank):
            vec[i] = vec[i - 1] * lin_check_const % p
        return np.asarray(self.poly_ring.ops.from_ints(vec))

    def _rem_split(self, rem: FPoly):
        """remLo = rem[1:rank]; remHi = remLo shifted to degree
        JindoRank-(rank-1) (reference prover.go:443-458)."""
        ctx, jr = self.ctx, self.params.rank
        w = self.spec.w
        rem_lo = rem.coeffs[:, 1:ctx.rank]
        if limb.get_xp(rem_lo) is not np:
            import jax.numpy as jnp
            rem_hi = jnp.pad(rem_lo, ((0, 0), (jr - (ctx.rank - 1), 0)))
            return rem_lo, rem_hi
        rem_hi = np.zeros((w, jr), dtype=np.uint32)
        rem_hi[:, jr - (ctx.rank - 1):] = rem_lo
        return rem_lo, rem_hi

    # -- main ------------------------------------------------------------

    def prove(self, assignment) -> Proof:
        ctx = self.ctx
        spec = self.spec
        ring = self.poly_ring
        ops = ring.ops
        rank = ctx.rank

        # collect assigned witnesses; derived ones start at zero
        pw = [to_planes(get_path(assignment, p), ops, rank)
              for p in self.pw_paths]
        pw += [np.zeros((spec.w, rank), dtype=np.uint32)
               for _ in range(ctx.pw_cnt - len(pw))]
        w = [to_planes(get_path(assignment, p), ops, rank)
             for p in self.w_paths]
        w += [np.zeros((spec.w, rank), dtype=np.uint32)
              for _ in range(ctx.w_cnt - len(w))]

        mod = spec.p

        # inf-norm decomposition witnesses (reference prover.go:77-86) —
        # vectorized: balanced int64 + array greedy decomposition; per-value
        # Python only for (invalid-witness) values too large for int64
        for wid, w_dcmps in ctx.inf_dcmp_witness.items():
            base = decompose_base(ctx.inf_dcmp_bound[wid])
            digits = self._decompose_vec(ops.from_mont(w[wid]), base)
            for j, wd in enumerate(w_dcmps):
                w[wd.id] = ternary_planes(ops, digits[j], rank)

        # squared-two-norm decomposition (reference prover.go:88-111)
        sq_nm = 0
        for wid, bound in ctx.two_dcmp_bound.items():
            base = decompose_base(bound)
            pw_base_id = ctx.two_dcmp_base[wid].id
            pw_mask_id = ctx.two_dcmp_mask[wid].id
            base_vals = [0] * rank
            mask_vals = [0] * rank
            for i in range(len(base)):
                base_vals[i] = base[i]
                mask_vals[i] = 1
            pw[pw_base_id] = ops.from_ints(base_vals)
            pw[pw_mask_id] = ops.from_ints(mask_vals)

            # sum of squares over balanced values (v^2 = xs^2 mod p), in
            # int64 chunks where bounds allow, exact Python ints otherwise
            xs = self._balanced(ops.from_mont(w[wid]))
            if xs.dtype == object or (np.abs(xs) >= (1 << 23)).any():
                for v in xs:
                    sq_nm += int(v) * int(v)
            else:
                sq = xs * xs  # < 2^46 each; chunked sums stay < 2^63
                for c in range(0, len(sq), 1 << 16):
                    sq_nm += int(np.sum(sq[c:c + (1 << 16)]))
            sq_nm %= mod
            dcmp = decompose_big(sq_nm, base, mod)
            dvals = [0] * rank
            for i, dj in enumerate(dcmp):
                dvals[i] = dj % mod
            w[ctx.two_dcmp_witness[wid].id] = ops.from_ints(dvals)

        oracle = Transcript(CHALLENGE_NAMES)

        with profiling.span("buckler.prove.encode_public"):
            pw_ecd = [self.ecd.encode(v) for v in pw]
            pw_ecd_ntt = [ring.ntt(p) for p in pw_ecd]

        second_ids = {m.id for m in ctx.w_second}
        n_batch = ctx.batch()
        w_ecd: list = [None] * ctx.w_cnt
        w_ecd_ntt: list = [None] * ctx.w_cnt
        coms: list = [None] * n_batch
        opens: list = [None] * n_batch
        com_polys: list = [None] * n_batch

        from .. import backend as _backend
        keep_dev = _backend.is_jax()

        def strip(arr):
            """Committed slice of an encode — stays device-resident under
            jax (jindo's fused commit assembles on device; only the head
            values ever reach the host)."""
            out = ops.from_mont(arr)
            return out if keep_dev else np.asarray(out)

        def prepare_witness(i: int):
            with profiling.span("buckler.prove.encode_witness"):
                w_ecd[i] = self.ecd.rand_encode(w[i], self._rand_field(1)[:, 0])
                w_ecd_ntt[i] = ring.ntt(w_ecd[i])
                com_polys[i] = strip(w_ecd[i].coeffs[:, :rank + 1])

        def commit_batch(slots: list[int], challenge: str,
                         extra_binds: dict[int, bytes] | None = None):
            """One batched jindo commit for the given slots; bind each
            commitment (and any trailing extra data for that slot) to the
            challenge in slot order — identical transcript to sequential
            commits."""
            with profiling.span("buckler.prove.commit_batch"):
                pairs = self.jindo.commit_many([com_polys[s] for s in slots])
            for s, (com, op) in zip(slots, pairs):
                coms[s], opens[s] = com, op
                oracle.bind(challenge, com.raw_bytes())
                if extra_binds and s in extra_binds:
                    oracle.bind(challenge, extra_binds[s])

        # ROUND 1: first-round witnesses (one batched commit)
        r1_ids = [i for i in range(ctx.w_cnt) if i not in second_ids]
        for i in r1_ids:
            prepare_witness(i)
        commit_batch(r1_ids, "projConst")

        proj_bytes = oracle.compute_challenge("projConst")
        xof = Shake128Stream()
        xof.write(proj_bytes)

        if ctx.proj_checker is not None:
            ctx.proj_checker.fill_from_xof(xof)
            for wid, w_proj in ctx.proj_witness.items():
                w[w_proj.id] = ctx.proj_checker.transform(w[wid])
            for pid, w_dcmp in ctx.proj_inf_dcmp_witness.items():
                base = decompose_base(ctx.proj_inf_dcmp_bound[pid])
                digits = self._decompose_vec(
                    ops.from_mont(w[pid][:, :128]), base)
                # layout dvals[i*len(base)+j] = digits[j, i]
                w[w_dcmp.id] = ternary_planes(ops, digits.T.ravel(), rank)

        # ROUND 2: second-round (projection) witnesses + sumcheck masks —
        # one batched commit, bound in the original sequential order
        r2_ids = [m.id for m in ctx.w_second]
        for i in r2_ids:
            prepare_witness(i)

        round_idx = ctx.w_cnt
        extra: dict[int, bytes] = {}

        lin_mask = lin_mask_sum = None
        lin_mask_slot = None
        if ctx.has_linear_check():
            lin_mask, lin_mask_sum = self._sum_check_mask(2 * rank)
            com_polys[round_idx] = strip(lin_mask.coeffs[:, :2 * rank])
            extra[round_idx] = spec.marshal(lin_mask_sum)
            lin_mask_slot = round_idx
            round_idx += 1

        sum_mask = sum_mask_sum = None
        sum_mask_slot = None
        if ctx.has_sum_check():
            sum_mask, sum_mask_sum = self._sum_check_mask(ctx.sum_check_max_rank)
            com_polys[round_idx] = strip(
                sum_mask.coeffs[:, :ctx.sum_check_max_rank])
            extra[round_idx] = spec.marshal(sum_mask_sum)
            sum_mask_slot = round_idx
            round_idx += 1

        r2_slots = r2_ids + [s for s in (lin_mask_slot, sum_mask_slot)
                             if s is not None]
        commit_batch(r2_slots, "arithBatchConst", extra)

        arith_bc = spec.set_bytes(oracle.compute_challenge("arithBatchConst"))

        # ROUND 3: all quotient/remainder polynomials (arith + lin + sum) are
        # computed, then committed in one batch and bound to evalPoint in the
        # original order (binds to evalPoint don't affect the lin/sum
        # challenges, so the transcript is unchanged)
        r3_slots: list[int] = []

        if ctx.has_arithmetic_check():
            with profiling.span("buckler.prove.arith_check"):
                ev = self._eval_circuit(arith_bc, ctx.arith_constraints,
                                        w_ecd_ntt, pw_ecd_ntt)
                ev = ring.intt(ev)
                quo, _ = ring.quo_rem_by_vanishing(ev, rank)
            com_polys[round_idx] = strip(
                quo.coeffs[:, :ctx.arith_check_max_rank - rank])
            r3_slots.append(round_idx)
            round_idx += 1

        lin_bc = spec.set_bytes(oracle.compute_challenge("linCheckBatchConst"))
        lin_const = spec.set_bytes(oracle.compute_challenge("linCheckConst"))

        if ctx.has_linear_check():
          with profiling.span("buckler.prove.lin_check"):
            with profiling.span("buckler.lin.vec_host"):
                vec = self._lin_check_vectors(lin_const)
            with profiling.span("buckler.lin.vec_encode"):
                vec_ecd_ntt = ring.ntt(self.ecd.encode(vec))
            bc = ops.const(lin_bc, (1,))
            ev = None
            for chk in ctx.lin_checkers:
                with profiling.span("buckler.lin.transpose"):
                    tr = chk.transpose(vec)
                with profiling.span("buckler.lin.tr_encode"):
                    tr_ecd_ntt = ring.ntt(self.ecd.encode(tr))
                with profiling.span("buckler.lin.muls"):
                    for (out_id, in_id) in ctx.lin_check_constraints[id(chk)]:
                        term = ring.mul(tr_ecd_ntt, w_ecd_ntt[in_id])
                        term = ring.sub(term, ring.mul(vec_ecd_ntt,
                                                       w_ecd_ntt[out_id]))
                        # Horner chaining: 0*bc + term == term for the first
                        if ev is not None:
                            ev = FPoly(ops.mul(ev.coeffs, bc), True)
                            ev = ring.add(ev, term)
                        else:
                            ev = term
            if ev is None:
                ev = ring.new_poly(True)
            with profiling.span("buckler.lin.fold"):
                ev = FPoly(ops.mul(ev.coeffs, bc), True)
                ev = ring.intt(ev)
                ev = ring.add(ev, lin_mask)
                quo, rem = ring.quo_rem_by_vanishing(ev, rank)
                rem_lo, rem_hi = self._rem_split(rem)
            with profiling.span("buckler.lin.extract"):
                for arr in (quo.coeffs[:, :rank], rem_lo, rem_hi):
                    com_polys[round_idx] = strip(arr)
                    r3_slots.append(round_idx)
                    round_idx += 1

        sum_bc = spec.set_bytes(oracle.compute_challenge("sumCheckBatchConst"))

        if ctx.has_sum_check():
            ev = self._eval_circuit(sum_bc, ctx.sum_check_constraints,
                                    w_ecd_ntt, pw_ecd_ntt)
            bc = ops.const(sum_bc, (1,))
            ev = FPoly(ops.mul(ev.coeffs, bc), True)
            ev = ring.intt(ev)
            ev = ring.add(ev, sum_mask)
            quo, rem = ring.quo_rem_by_vanishing(ev, rank)
            rem_lo, rem_hi = self._rem_split(rem)
            for arr in (quo.coeffs[:, :ctx.sum_check_max_rank - rank],
                        rem_lo, rem_hi):
                com_polys[round_idx] = strip(arr)
                r3_slots.append(round_idx)
                round_idx += 1

        commit_batch(r3_slots, "evalPoint")

        eval_point = spec.set_bytes(oracle.compute_challenge("evalPoint"))

        with profiling.span("buckler.prove.evaluate"):
            evals, eval_proof = self.jindo.evaluate(eval_point, com_polys,
                                                    coms, opens)

        return Proof(
            witness=coms,
            lin_check_mask_sum=0 if lin_mask_sum is None else lin_mask_sum,
            sum_check_mask_sum=0 if sum_mask_sum is None else sum_mask_sum,
            evals=evals,
            eval_proof=eval_proof,
        )
