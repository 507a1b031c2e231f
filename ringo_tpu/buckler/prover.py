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

    def _stage_jit(self, fn):
        """jit a stage program with the big-field NTT plan tables (the
        encoder's cyclic plan + the embedding ring's plan: twiddles, banded
        DFT maps — tens of MB at (15,880)) passed as jit arguments instead
        of inline HLO constants (ops/devconst.py)."""
        from .. import backend

        if not backend.is_jax():
            return backend.jit(fn)
        owners = []
        for plan in (getattr(self.ecd, "dev_plan", None),
                     getattr(self.poly_ring, "dev_plan", None)):
            if plan is not None and hasattr(plan, "devconst_owners"):
                owners.extend(plan.devconst_owners())
        if not owners:
            return backend.jit(fn)
        from ..ops import devconst

        def tabs():
            # deferred to call time (trace state clean there) so the device
            # snapshot can never capture tracers
            if getattr(self, "_stage_tabs", None) is None:
                self._stage_tabs = devconst.device_tables(
                    owners, backend.to_device)
            return self._stage_tabs

        return devconst.wrap(fn, owners, backend.jit, tabs)

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

    # -- batched witness encodes (jax) -----------------------------------

    def _prepare_stack(self, t: int):
        """One jitted program encoding t witnesses: randomized
        interpolation encode (cyclic INTT + X^rank blind, reference
        encoder.go:50-54) + forward embedding NTT, batched over the
        witness axis — replaces 2t single-witness dispatches.  Unsharded
        embedding ring only (the sharded four-step plan is [w, n]-shaped);
        bit-identical to per-witness ``ecd.rand_encode`` + ``ring.ntt``."""
        key = ("prep", t)
        if not hasattr(self, "_prep_jits"):
            self._prep_jits = {}
        if key in self._prep_jits:
            return self._prep_jits[key]
        from .. import backend

        ecd, ring, spec = self.ecd, self.poly_ring, self.spec
        rank, emb, w = self.ctx.rank, ring.rank, spec.w
        pd = spec.p_digits.reshape(w, 1, 1)

        def run(w_stack, blinds):
            import jax.numpy as jnp

            vv = jnp.moveaxis(w_stack, 0, 1)          # [w, t, rank]
            bl = jnp.moveaxis(blinds, 0, 1)           # [w, t]
            coeffs = ecd.dev_plan.inv(vv[:, :, :rank])
            c0 = limb.sub(coeffs[:, :, 0:1], bl[:, :, None], pd)
            pad = jnp.zeros((w, t, emb - rank - 1), dtype=jnp.uint32)
            e = jnp.concatenate([c0, coeffs[:, :, 1:rank], bl[:, :, None],
                                 pad], axis=2)        # [w, t, emb]
            nt = ring.dev_plan.fwd(e)
            return jnp.moveaxis(e, 1, 0), jnp.moveaxis(nt, 1, 0)

        self._prep_jits[key] = self._stage_jit(run)
        return self._prep_jits[key]

    def _prepare_pw_stack(self, t: int):
        """Batched plain encodes (no blind) + embedding NTTs for t public
        witnesses — one program instead of 2t dispatches."""
        key = ("prep_pw", t)
        if not hasattr(self, "_prep_jits"):
            self._prep_jits = {}
        if key in self._prep_jits:
            return self._prep_jits[key]
        from .. import backend

        ecd, ring, spec = self.ecd, self.poly_ring, self.spec
        rank, emb, w = self.ctx.rank, ring.rank, spec.w

        def run(w_stack):
            import jax.numpy as jnp

            vv = jnp.moveaxis(w_stack, 0, 1)          # [w, t, rank]
            coeffs = ecd.dev_plan.inv(vv[:, :, :rank])
            pad = jnp.zeros((w, t, emb - rank), dtype=jnp.uint32)
            e = jnp.concatenate([coeffs, pad], axis=2)
            nt = ring.dev_plan.fwd(e)
            return jnp.moveaxis(e, 1, 0), jnp.moveaxis(nt, 1, 0)

        self._prep_jits[key] = self._stage_jit(run)
        return self._prep_jits[key]

    # -- fused round 3 (jax) ---------------------------------------------

    def _scale_stack(self, batch_const: int, constraints) -> np.ndarray:
        """Host: the per-constraint scale values ``_eval_circuit`` applies
        (faithful mode: the same constant for every constraint; strict:
        batch_const^(i+1), advancing only on non-empty constraints), as
        plain digit planes [n, w, 1] for the traced evaluator."""
        mod = self.spec.p
        scale = batch_const
        vals = []
        for c in constraints:
            if not c.terms:
                continue
            vals.append(scale)
            if self.ctx.strict:
                scale = scale * batch_const % mod
        if not vals:
            return np.zeros((0, self.spec.w, 1), dtype=np.uint32)
        return np.stack([np.asarray(self.poly_ring.ops.from_ints([v]))
                         for v in vals])

    def _eval_circuit_traced(self, scales, constraints, w_ntt, pw_ntt):
        """NTT-domain constraint evaluation on stacked witness planes —
        the traceable core of ``_eval_circuit`` (same math, same order;
        challenge scales arrive as traced digit planes so one compiled
        program serves every prove)."""
        ring, ops = self.poly_ring, self.poly_ring.ops
        out = None
        si = 0
        for c in constraints:
            ev = None
            for t in c.terms:
                polys = ([] if t.pw_id is None else [pw_ntt[t.pw_id]])
                polys += [w_ntt[wid] for wid in t.w_ids]
                if polys:
                    term = polys[0]
                    for q in polys[1:]:
                        term = ops.mul(term, q)
                    term = ops.mul(term, ops.const(t.coeff, (1,)))
                else:
                    term = ops.const(t.coeff, (ring.rank,))
                ev = term if ev is None else ops.add(ev, term)
            if ev is None:
                continue
            ev = ops.mul(ev, scales[si])
            si += 1
            out = ev if out is None else ops.add(out, ev)
        if out is None:
            import jax.numpy as jnp
            return jnp.zeros((self.spec.w, ring.rank), dtype=jnp.uint32)
        return out

    def _get_round3(self):
        """ONE jitted program for the whole of round 3 (reference
        prover.go:341-458): arithmetic-check quotient, linear-check
        quotient/remLo/remHi, sum-check quotient/remLo/remHi.  All four
        Fiat-Shamir challenges of the round are derivable before any of
        its commitments bind, so nothing forces the round's ~dozens of
        small dispatches — each paying the host<->TPU dispatch floor —
        to stay separate."""
        if getattr(self, "_round3", None) is not None:
            return self._round3
        from .. import backend

        ctx = self.ctx
        ring = self.poly_ring
        ops = ring.ops
        ecd = self.ecd
        rank = ctx.rank

        def run(w_ntt, pw_ntt, arith_scales, lin_bc_c, vec, trs,
                lin_mask_c, sum_scales, sum_bc_c, sum_mask_c):
            outs = []
            if ctx.has_arithmetic_check():
                ev = self._eval_circuit_traced(
                    arith_scales, ctx.arith_constraints, w_ntt, pw_ntt)
                evp = ring.intt(FPoly(ev, True))
                quo, _ = ring.quo_rem_by_vanishing(evp, rank)
                outs.append(quo.coeffs[:, :ctx.arith_check_max_rank - rank])
            if ctx.has_linear_check():
                vec_ntt = ring.ntt(ecd.encode(vec)).coeffs
                ev = None
                for ci, chk in enumerate(ctx.lin_checkers):
                    tr_ntt = ring.ntt(ecd.encode(trs[ci])).coeffs
                    for (out_id, in_id) in ctx.lin_check_constraints[id(chk)]:
                        term = ops.mul(tr_ntt, w_ntt[in_id])
                        term = ops.sub(term, ops.mul(vec_ntt, w_ntt[out_id]))
                        ev = term if ev is None else ops.add(
                            ops.mul(ev, lin_bc_c), term)
                if ev is None:  # pragma: no cover — has_linear_check implies
                    ev = ops.const(0, (ring.rank,))
                ev = ops.mul(ev, lin_bc_c)
                evp = ring.intt(FPoly(ev, True))
                evp = FPoly(ops.add(evp.coeffs, lin_mask_c), False)
                quo, rem = ring.quo_rem_by_vanishing(evp, rank)
                rem_lo, rem_hi = self._rem_split(rem)
                outs += [quo.coeffs[:, :rank], rem_lo, rem_hi]
            if ctx.has_sum_check():
                ev = self._eval_circuit_traced(
                    sum_scales, ctx.sum_check_constraints, w_ntt, pw_ntt)
                ev = ops.mul(ev, sum_bc_c)
                evp = ring.intt(FPoly(ev, True))
                evp = FPoly(ops.add(evp.coeffs, sum_mask_c), False)
                quo, rem = ring.quo_rem_by_vanishing(evp, rank)
                rem_lo, rem_hi = self._rem_split(rem)
                outs += [quo.coeffs[:, :ctx.sum_check_max_rank - rank],
                         rem_lo, rem_hi]
            return tuple(outs)

        self._round3 = self._stage_jit(run)
        return self._round3

    def _round3_fused(self, oracle, arith_bc, w_ecd_ntt, pw_ecd_ntt,
                      lin_mask, sum_mask, com_polys, round_idx):
        """Drive the fused round-3 program: compute the round's challenges
        (same transcript order as the unfused path — no bindings intervene
        between them), assemble the traced inputs, dispatch once, and lay
        the output slices into the commit slots."""
        import jax.numpy as jnp

        ctx, spec, ring = self.ctx, self.spec, self.poly_ring
        ops = ring.ops
        w = spec.w
        emb = ring.rank

        # challenge order matches the per-op path: arith (computed by the
        # caller), then linCheckBatchConst, linCheckConst, sumCheckBatchConst
        lin_bc = spec.set_bytes(oracle.compute_challenge("linCheckBatchConst"))
        lin_const = spec.set_bytes(oracle.compute_challenge("linCheckConst"))
        sum_bc = spec.set_bytes(oracle.compute_challenge("sumCheckBatchConst"))

        dev = jnp.asarray
        w_stack = jnp.stack([dev(f.coeffs) for f in w_ecd_ntt])
        pw_stack = (jnp.stack([dev(f.coeffs) for f in pw_ecd_ntt])
                    if pw_ecd_ntt else jnp.zeros((0, w, emb), jnp.uint32))

        z_scales = np.zeros((0, w, 1), dtype=np.uint32)
        z_c = np.zeros((w, 1), dtype=np.uint32)
        arith_scales = (self._scale_stack(arith_bc, ctx.arith_constraints)
                        if ctx.has_arithmetic_check() else z_scales)
        if ctx.has_linear_check():
            with profiling.span("buckler.lin.vec_host"):
                vec = self._lin_check_vectors(lin_const)
                trs_l = [jnp.asarray(np.asarray(chk.transpose(vec)))
                         for chk in ctx.lin_checkers]
            trs = (jnp.stack(trs_l) if trs_l
                   else jnp.zeros((0, w, ctx.rank), jnp.uint32))
            lin_bc_c = np.asarray(ops.from_ints([lin_bc]))
            lin_mask_c = np.asarray(lin_mask.coeffs)
            vec_in = dev(vec)
        else:
            trs = jnp.zeros((0, w, ctx.rank), jnp.uint32)
            lin_bc_c = z_c
            lin_mask_c = np.zeros((w, emb), dtype=np.uint32)
            vec_in = jnp.zeros((w, ctx.rank), jnp.uint32)
        if ctx.has_sum_check():
            sum_scales = self._scale_stack(sum_bc, ctx.sum_check_constraints)
            sum_bc_c = np.asarray(ops.from_ints([sum_bc]))
            sum_mask_c = np.asarray(sum_mask.coeffs)
        else:
            sum_scales = z_scales
            sum_bc_c = z_c
            sum_mask_c = np.zeros((w, emb), dtype=np.uint32)

        with profiling.span("buckler.prove.round3_fused"):
            outs = self._get_round3()(
                w_stack, pw_stack, arith_scales, lin_bc_c, vec_in, trs,
                lin_mask_c, sum_scales, sum_bc_c, sum_mask_c)

        r3_slots: list[int] = []
        oi = 0
        n_out = (1 if ctx.has_arithmetic_check() else 0) \
            + (3 if ctx.has_linear_check() else 0) \
            + (3 if ctx.has_sum_check() else 0)
        assert len(outs) == n_out
        for _ in range(n_out):
            com_polys[round_idx] = outs[oi]
            r3_slots.append(round_idx)
            round_idx += 1
            oi += 1
        return round_idx, r3_slots

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

        from .. import backend as _backend
        with profiling.span("buckler.prove.encode_public"):
            if (pw and _backend.is_jax()
                    and getattr(ring, "_sharded_ntt", None) is None):
                import jax.numpy as jnp
                e, nt = self._prepare_pw_stack(len(pw))(
                    jnp.stack([jnp.asarray(v) for v in pw]))
                pw_ecd = [FPoly(e[j], False) for j in range(len(pw))]
                pw_ecd_ntt = [FPoly(nt[j], True) for j in range(len(pw))]
            else:
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

        def prepare_many(ids: list[int]):
            """Batched witness encodes: one device program for the whole
            round's witnesses (same blind-draw order as the per-witness
            loop).  Falls back per-witness on numpy or a sharded ring."""
            if not ids:
                return
            if not keep_dev or getattr(ring, "_sharded_ntt", None) is not None:
                for i in ids:
                    prepare_witness(i)
                return
            import jax.numpy as jnp
            with profiling.span("buckler.prove.encode_witness"):
                blinds = np.stack([self._rand_field(1)[:, 0] for _ in ids])
                wst = jnp.stack([jnp.asarray(w[i]) for i in ids])
                e, nt = self._prepare_stack(len(ids))(wst, jnp.asarray(blinds))
                for j, i in enumerate(ids):
                    w_ecd[i] = FPoly(e[j], False)
                    w_ecd_ntt[i] = FPoly(nt[j], True)
                    com_polys[i] = strip(e[j][:, :rank + 1])

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
        prepare_many(r1_ids)
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
        prepare_many(r2_ids)

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

        if keep_dev:
            # jax: the whole round is ONE device program (all four of the
            # round's challenges derive from the transcript before any of
            # its commitments bind) — same math, same transcript order as
            # the per-op path below
            round_idx, r3_slots = self._round3_fused(
                oracle, arith_bc, w_ecd_ntt, pw_ecd_ntt, lin_mask, sum_mask,
                com_polys, round_idx)
            commit_batch(r3_slots, "evalPoint")
        else:
            round_idx, r3_slots = self._round3_host(
                oracle, arith_bc, w_ecd_ntt, pw_ecd_ntt, lin_mask, sum_mask,
                com_polys, round_idx, strip)
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

    def _round3_host(self, oracle, arith_bc, w_ecd_ntt, pw_ecd_ntt,
                     lin_mask, sum_mask, com_polys, round_idx, strip):
        """Per-op round 3 (numpy backend): identical math/transcript to the
        fused device program."""
        ctx = self.ctx
        spec = self.spec
        ring = self.poly_ring
        ops = ring.ops
        rank = ctx.rank
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

        return round_idx, r3_slots
