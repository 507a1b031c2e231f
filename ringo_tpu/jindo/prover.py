"""Jindo prover: two-tier lattice commitment + batched evaluation proofs.

Tensorized re-design of reference jindo/prover.go: the reference commits one
matrix column at a time with scalar loops (commitColTo, prover.go:89-177);
here every (column, row) cell of the commitment matrix is encoded, sampled,
NTT'd and MAC'd in single whole-tensor operations, which is what makes the
scheme map onto TPU vector units.
"""

from __future__ import annotations

import numpy as np

from ..csprng import RoundedGaussianSampler, TwinCDTGaussianSampler, UniformSampler
from ..csprng import chacha
from ..csprng.gaussian import TwinCDTDevice
from ..fields import limb
from ..rings.rns import RnsReconstructor
from ..utils.transcript import Shake128Stream
from .challenge import encode_challenges, left_vec
from .encoder import Encoder
from .entities import CommitKey, Commitment, Opening, Proof
from .params import Parameters
from ..utils import profiling
from ..ops import mac_matmul


def sample_field_digits(spec, n: int, u: UniformSampler) -> np.ndarray:
    """n uniform field elements in [0, p) as plain digit planes [w, n]
    (goff MustSetRandom: top-bit-masked rejection)."""
    out = np.zeros((spec.w, n), dtype=np.uint32)
    top_bits = spec.bits - 16 * (spec.w - 1)
    top_mask = (1 << top_bits) - 1
    pd = spec.p_digits.reshape(spec.w, 1)
    need = np.arange(n)
    while len(need):
        raw = u._take_bytes(2 * spec.w * len(need)).view("<u2")
        cand = raw.reshape(len(need), spec.w).T.astype(np.uint32).copy()
        cand[-1] &= top_mask
        ok = ~limb.geq(cand, pd)
        idx = need[np.asarray(ok)]
        out[:, idx] = cand[:, np.asarray(ok)]
        need = need[~np.asarray(ok)]
    return out


class Prover:
    # HBM budget (bytes) for one fused-commit dispatch's transients; the
    # chunk size is derived per-parameter-set from a bytes estimate of the
    # batch program's live tensors (see _fuse_chunk).  10 GB leaves ~6 GB
    # of v5e's 15.75 GB for the commit key, outputs, and fragmentation.
    FUSE_HBM_BYTES = 10 << 30

    def __init__(self, params: Parameters, crs: bytes, seed: bytes | None = None,
                 resolve: str = "device"):
        """``resolve`` picks where twin-CDT disagreements are fixed up:
        "device" (default) keeps the whole commit in one jitted program;
        "host" uses the two-program path whose fix-up bit-matches the host
        sampler (kept for the bit-equality test harness)."""
        if resolve not in ("device", "host"):
            raise ValueError(resolve)
        self.resolve = resolve
        self.params = params
        self.spec = params.spec
        self.ecd = Encoder(params, seed)
        self.rns_out = RnsReconstructor(params.ring_q_out)
        self.ck = CommitKey(params, crs)
        self.uniform = UniformSampler(None if seed is None else seed + b"u")
        self.rounded = RoundedGaussianSampler(None if seed is None else seed + b"rg")
        self.mlwe_sampler = TwinCDTGaussianSampler(
            params.mlwe_std_dev, None if seed is None else seed + b"ml")
        self._stages = None
        self._mesh = None

    def safe_copy(self, seed: bytes | None = None) -> "Prover":
        """Independent prover for caller-managed concurrency (reference
        SafeCopy, jindo/prover.go:327-339): shares the parameters, commit
        key and compiled stage programs (all read-only), with fresh
        sampler states — freshly random like the reference, or derived
        from ``seed`` for reproducibility."""
        new = object.__new__(Prover)
        new.__dict__.update(self.__dict__)
        new.ecd = Encoder(self.params, seed)
        new.uniform = UniformSampler(None if seed is None else seed + b"u")
        new.rounded = RoundedGaussianSampler(
            None if seed is None else seed + b"rg")
        new.mlwe_sampler = TwinCDTGaussianSampler(
            self.params.mlwe_std_dev, None if seed is None else seed + b"ml")
        return new

    def set_mesh(self, mesh) -> None:
        """Attach a jax.sharding.Mesh: the jitted stage programs get
        dp/tp/sp sharding constraints on their inputs/outputs (GSPMD
        propagates through the interior — same axis mapping as
        parallel/commit.py: commit batch -> dp, RNS prime planes -> tp,
        MSIS/decomposition rank -> sp).  Pass ``None`` to detach.
        Invalidates the jitted stage cache, so call before the first
        commit/evaluate (or accept a re-jit)."""
        self._mesh = mesh
        self._stages = None

    # sharding specs per stage: (input specs, output specs); None = leave
    # the array unconstrained (scalars, replicated operands).  Stages not
    # listed here (raw cores that parallel/ builders vmap themselves, the
    # host-resolve path) are never wrapped.
    _MESH_SPECS = {
        "commit_fused_batch": (
            (("dp",), ("dp",), ("dp",), ("dp",), ("dp",), ("dp",), ("dp",),
             (), ()),
            (("dp",), ("dp",), ("dp", None, "tp", "sp"), None)),
        "partial": (
            ((None, "tp"), (None, "tp")),
            ((None, "tp"),)),
        "response": (
            ((None, "tp"), (None, "tp"), (None, "tp")),
            (None,)),
        "seeds_encode": (
            (None, None),
            ((None, "tp"), (None, "tp"))),
        "combine_seeds": (
            (("dp",), ("dp",), ("dp", None, "tp", "sp"), ("dp",), ("dp",)),
            ((None, "tp", "sp"), (None, "tp"), (None, "tp"))),
    }

    def _mesh_wrap(self, name, fn):
        """Wrap a raw stage with boundary sharding constraints when a mesh
        is attached (identity otherwise)."""
        if self._mesh is None or name not in self._MESH_SPECS:
            return fn
        import jax
        from ..parallel.commit import _ns

        mesh = self._mesh
        wsc = jax.lax.with_sharding_constraint
        in_specs, out_specs = self._MESH_SPECS[name]

        def put(a, s):
            return a if s is None else wsc(a, _ns(mesh, *s))

        def wrapped(*args):
            args = [put(a, s) for a, s in zip(args, in_specs)] \
                + list(args[len(in_specs):])
            out = fn(*args)
            if isinstance(out, tuple):
                return tuple(put(o, s) for o, s in zip(out, out_specs))
            return put(out, out_specs[0])

        return wrapped

    # ---------------------------------------------------- device stage fns

    def _get_stages(self):
        """Build (and jit, under the jax backend) the three whole-tensor
        device stages of commit plus the evaluate stages.  Each stage is the
        modmul-heavy part between two host syncs (sampling / exact CRT)."""
        if self._stages is not None:
            return self._stages
        from .. import backend

        p = self.params
        ring, ring_out = p.ring_q, p.ring_q_out
        from ..ops.bigmul import BigMul
        self._horner_big = BigMul(self.spec)

        def mac_sum(mul, adder, ab_pairs):
            """Accumulate sum_k mul(a_k, b_k): python loop under numpy
            (ab_pairs = iterable of (a, b)); lax.scan under jax (ab_pairs =
            (a_stack, b_stack) with a leading k axis) so the compiled HLO is
            O(1) in the contraction length."""
            if not backend.is_jax():
                acc = None
                for a, b in ab_pairs:
                    t = mul(a, b)
                    acc = t if acc is None else adder(acc, t)
                return acc
            import jax

            a_stack, b_stack = ab_pairs
            first = mul(a_stack[0], b_stack[0])
            out, _ = jax.lax.scan(
                lambda c, ab: (adder(c, mul(ab[0], ab[1])), None),
                first, (a_stack[1:], b_stack[1:]))
            return out

        def stage_encode_mac(e_i64, noise_i64, pk_inml):
            """embed+MForm+NTT all encodes & noise, inner Ajtai MACs, INTT.
            e_i64 [B, R, d]; noise_i64 [B, K, d].  ``pk_inml`` is the folded
            MAC-plane form of [In | MLWE] (ops/mac_matmul.fold_key) under
            jax, or the raw concatenated key under numpy — an argument
            (device-resident), NOT a trace-time constant: baking it into the
            HLO would force a recompile for every CRS.

            The contraction com[j] = sum_k In[j,k].Encode[k] + MLWE-terms
            (reference prover.go:149-157) runs as exact bf16-plane matmuls
            on the MXU (ops/mac_matmul.mod_mac), not a scan of pointwise
            Montgomery muls."""
            xp = limb.get_xp(e_i64) if not isinstance(e_i64, np.ndarray) else np
            enc = ring.ntt_mform(ring.embed_int64(e_i64))
            mlwe = ring.ntt_mform(ring.embed_int64(noise_i64))
            x_all = xp.concatenate(
                [xp.moveaxis(enc, 2, 3),
                 xp.moveaxis(mlwe[:, :, :, :p.mlwe_rank, :], 2, 3)],
                axis=2)  # [2, L, rows+mlweR, B, d]
            if backend.is_jax():
                com = mac_matmul.mod_mac(ring, pk_inml, x_all, xp)
            else:
                com = mac_matmul.mod_mac_scan(ring, pk_inml, x_all)
            com = ring.add(com, xp.moveaxis(
                mlwe[:, :, :, p.mlwe_rank:, :], 3, 2))
            com = ring.intt_imform(com)
            return enc, mlwe, com

        def stage_outer_mac(in_commit_plain, pk_out):
            """MForm+NTT the decomposed inner commitments, outer MACs, INTT
            (reference prover.go:186-200) — same MXU contraction."""
            xp = limb.get_xp(in_commit_plain)
            ic = ring_out.ntt_mform(in_commit_plain)
            x = ic[:, :, :, None, :]  # [2, LO, dcmp, 1, d]
            if backend.is_jax():
                acc = mac_matmul.mod_mac(ring_out, pk_out, x, xp)
            else:
                acc = mac_matmul.mod_mac_scan(ring_out, pk_out, x)
            acc = ring_out.intt_imform(acc[:, :, :, 0, :])
            return ic, acc

        def stage_finalize(outer_plain):
            return ring_out.ntt_mform(outer_plain)

        from ..rings.rns_device import CrtShiftEmbed
        crt_in = CrtShiftEmbed(ring, ring_out, p.log_in_cutoff)
        crt_out = CrtShiftEmbed(ring_out, ring_out, p.log_out_cutoff)

        def commit_core(e_i64, noise_i64, pk_inml, pk_out):
            """The entire commit pipeline as one device program: encode
            NTTs, inner MACs, device CRT cutoff (reference prover.go:159-176),
            outer MACs and outer cutoff (prover.go:180-202)."""
            enc, mlwe, com = stage_encode_mac(e_i64, noise_i64, pk_inml)
            xp = limb.get_xp(com)
            ic = crt_in(com)  # [2, LO, inR, B, d] plain
            ic = xp.moveaxis(ic, 3, 2).reshape(
                2, ring_out.L, p.in_com_dcmp_len, p.degree)
            ic_ntt, acc = stage_outer_mac(ic, pk_out)
            outer = stage_finalize(crt_out(acc))
            return enc, mlwe, ic_ntt, outer

        # ---- device-side randomized encoding: ChaCha20 entropy + twin-CDT
        # search on device, rare disagreements fixed on host between the two
        # programs ----
        twin_ecd = TwinCDTDevice(p.ecd_std_dev)
        twin_ml = TwinCDTDevice(p.mlwe_std_dev)
        ecd = self.ecd
        B, R, S = p.cols + 1, p.rows, p.slots
        BR = B * R
        d = p.degree
        K = p.mlwe_rank + p.in_msis_rank
        # twin-table disagreement rate is ~2/128 of lanes (the tables
        # quantize centers to a 1/128 grid; measured 1.52% at the default
        # sigma, logN=19) — cap at ~1.6x the expectation (>200 sigmas of
        # slack; count variance is binomial), fall back to host beyond
        CAP = max(4096, -(-BR * d // 40960) * 1024)
        self.FIX_CAP = CAP
        OMAX = (B - 1) + R  # max non-default-sigma cells (row 0 + mask col)

        def stage_sample(e_all, key_enc, key_ml, default_lanes):
            """e_all [w, BR, S] u16; key_* uint32[8] ChaCha20 keys;
            default_lanes [BR] bool (populated cells with default sigma).
            Returns base-b digits, provisional Gaussian corrections, and one
            packed int32 [8, CAP] array of disagreement info (lane index,
            v0, v1, c_floor, c_frac bits, u bits) for the host fix-up."""
            xp = limb.get_xp(key_enc) if not isinstance(key_enc, np.ndarray) else np
            e_all = e_all.astype(xp.uint32)
            w_enc = chacha.keystream_u32(key_enc, -(-BR * d // 8),
                                         xp=xp).reshape(-1)
            u_lo32 = w_enc[0::2][:BR * d]
            u_hi32 = w_enc[1::2][:BR * d]
            u_enc = (u_lo32.astype(xp.uint64)
                     | (u_hi32.astype(xp.uint64) << xp.uint64(32))
                     ).reshape(BR, d)
            u_ml = chacha.keystream_u64(key_ml, p.cols * K * d, xp=xp
                                        ).reshape(p.cols, K, d)
            coeffs = ecd.base_digits(e_all)        # [BR, d] i64
            centers = ecd.drift_centers(coeffs)    # [BR, d] f64
            prov, agree, c_floor, c_frac, v0, v1 = twin_ecd.search(
                centers, u_enc)
            prov_ml, _, _, _, _, _ = twin_ml.search(None, u_ml,
                                                    zero_center=True)
            bad = ((~agree) & default_lanes[:, None]).reshape(-1)
            sentinel = BR * d
            idx = limb.nonzero_idx(xp, bad, CAP)
            safe = xp.minimum(idx, sentinel - 1)
            g = lambda a: xp.take(a.reshape(-1), safe)
            # c_frac as 64-bit fixed point (f64 bitcasts don't lower under
            # the TPU x64 rewriter); |reconstruction error| <= 2^-53, far
            # below the f64 accuracy of the CDF walk it feeds
            cfb = g(c_frac)
            s32 = 4294967296.0
            cf_hi = xp.floor(cfb * s32)
            cf_lo = xp.floor((cfb * s32 - cf_hi) * s32)
            packed = xp.stack([
                idx.astype(xp.uint32), g(v0).astype(xp.uint32),
                g(v1).astype(xp.uint32),
                g(c_floor).astype(xp.int32).astype(xp.uint32),
                cf_hi.astype(xp.uint32), cf_lo.astype(xp.uint32),
                g(u_lo32), g(u_hi32),
            ], axis=0)
            return coeffs, prov, prov_ml, packed

        def stage_commit(coeffs, prov, prov_ml, c_sub, oidx, default_lanes,
                         fix_idx, fix_val, noise_mask, pk_inml, pk_out):
            """Apply host fix-ups, scatter the sparse non-default-sigma
            corrections, build coefficients/noise, run the full commit
            pipeline.  c_sub [OMAX, d] i64 with row indices oidx [OMAX]
            (sentinel BR = unused); fix_idx [CAP] i32 (sentinel BR*d =
            unused); fix_val [CAP] i32."""
            xp = limb.get_xp(prov) if not isinstance(prov, np.ndarray) else np
            if xp is np:
                c_other = np.zeros((BR, d), dtype=np.int64)
                m = oidx < BR
                c_other[oidx[m]] = c_sub[m]
            else:
                c_other = xp.zeros((BR, d), dtype=xp.int64)
                c_other = c_other.at[oidx].set(c_sub, mode="drop")
            c = xp.where(default_lanes[:, None], prov, c_other)
            cf = c.reshape(-1)
            if xp is np:
                m = fix_idx < BR * d
                cf = cf.copy()
                cf[fix_idx[m]] = fix_val[m]
            else:
                cf = cf.at[fix_idx].set(fix_val.astype(xp.int64), mode="drop")
            c = cf.reshape(BR, d)
            e_i64 = ecd.correction_total(coeffs, c).reshape(B, R, d)
            noise = xp.concatenate([prov_ml, noise_mask[None]], axis=0)
            return commit_core(e_i64, noise, pk_inml, pk_out)

        def stage_commit_fused(e_all, key_enc, key_ml, default_lanes, c_sub,
                               oidx, noise_mask, pk_inml, pk_out):
            """The whole commit as ONE device program: entropy + twin-CDT
            search + exact on-device disagreement resolution + encode NTTs +
            Ajtai MACs + CRT cutoffs (reference prover.go:45-202).  The host
            round-trip of the two-program path (sample -> pull packed ->
            resolve -> push fixes) disappears; with a single host CPU that
            round-trip dominated the commit at large N.

            Returns (e_i64, noise, ic_ntt, outer, n_bad): the signed
            encode coefficients and noise are the compact opening *seeds*
            (the huge Encode/MLWE NTT tensors are re-derived on demand, see
            entities.Opening); n_bad is the exact disagreement count — if it
            exceeded CAP the tail lanes kept the provisional v0 sample and
            the caller should redo on the host path (astronomically rare;
            see CAP above)."""
            import jax.numpy as jnpl
            xp = jnpl
            e_all = e_all.astype(xp.uint32)
            w_enc = chacha.keystream_u32(key_enc, -(-BR * d // 8),
                                         xp=xp).reshape(-1)
            u_enc = (w_enc[0::2][:BR * d].astype(xp.uint64)
                     | (w_enc[1::2][:BR * d].astype(xp.uint64) << xp.uint64(32))
                     ).reshape(BR, d)
            u_ml = chacha.keystream_u64(key_ml, p.cols * K * d, xp=xp
                                        ).reshape(p.cols, K, d)
            coeffs = ecd.base_digits(e_all)
            centers = ecd.drift_centers(coeffs)
            prov, agree, c_floor, c_frac, v0, v1 = twin_ecd.search(
                centers, u_enc)
            prov_ml, _, _, _, _, _ = twin_ml.search(None, u_ml,
                                                    zero_center=True)
            bad = ((~agree) & default_lanes[:, None]).reshape(-1)
            n_bad = bad.sum(dtype=xp.int32)
            sentinel = BR * d
            idx = limb.nonzero_idx(xp, bad, CAP)
            safe = xp.minimum(idx, sentinel - 1)
            g = lambda a: xp.take(a.reshape(-1), safe)
            fix_val = twin_ecd.resolve_device(
                xp, g(c_frac), g(u_enc), g(v0), g(v1), g(c_floor),
                valid=idx < sentinel)
            # merge: twin-CDT agreements, sparse COSAC cells, resolved fixes
            c_other = xp.zeros((BR, d), dtype=xp.int64)
            c_other = c_other.at[oidx].set(c_sub, mode="drop")
            c = xp.where(default_lanes[:, None], prov, c_other)
            cf = c.reshape(-1).at[idx].set(fix_val, mode="drop")
            e_i64 = ecd.correction_total(coeffs, cf.reshape(BR, d)
                                         ).reshape(B, R, d)
            noise = xp.concatenate([prov_ml, noise_mask[None]], axis=0)
            # enc/mlwe are dead outputs here: XLA frees their buffers, so
            # the program's footprint is the seeds + in-flight transients
            _, _, ic_ntt, outer = commit_core(e_i64, noise, pk_inml, pk_out)
            return e_i64, noise, ic_ntt, outer, n_bad

        def stage_commit_fused_batch(e_all, keys_enc, keys_ml, default_lanes,
                                     c_sub, oidx, noise_mask, pk_inml,
                                     pk_out):
            """t commits as ONE device program, bit-identical to t
            sequential ``stage_commit_fused`` calls (same per-commit ChaCha
            streams, same per-lane sampling decisions), but with every
            tensor stage batched: the encode NTTs run over t*B*R rows, the
            inner Ajtai MAC contraction sees n = t*B columns and the outer
            MAC n = t — the MXU-shaped batching of SURVEY §3.3.

            e_all [t, w, BR, S] u16/u32; keys_* [t, 8] u32;
            default_lanes [t, BR] bool; c_sub [t, OMAX, d] i64;
            oidx [t, OMAX] i32; noise_mask [t, K, d] i64.
            Returns (e_i64 [t, B, R, d], noise [t, B, K, d],
            ic_ntt [t, 2, LO, dcmp, d], outer [t, 2, LO, outR, d], n_bad)."""
            import jax.numpy as xp

            t = e_all.shape[0]
            w = e_all.shape[1]
            e_flat = xp.moveaxis(e_all, 1, 0).reshape(w, t * BR, S
                                                      ).astype(xp.uint32)
            # per-commit ChaCha streams (bit-identical to the single path)
            # — ONE batched trace over all t keys, not t separate graphs
            nb = -(-BR * d // 8)
            wi = chacha.keystream_u32_batch(keys_enc, nb, xp=xp
                                            ).reshape(t, -1)  # [t, nb*16]
            u_enc = (wi[:, 0::2][:, :BR * d].astype(xp.uint64)
                     | (wi[:, 1::2][:, :BR * d].astype(xp.uint64)
                        << xp.uint64(32))).reshape(t * BR, d)
            nb_ml = -(-p.cols * K * d // 8)
            wm = chacha.keystream_u32_batch(keys_ml, nb_ml, xp=xp
                                            ).reshape(t, -1)
            u_ml = (wm[:, 0::2][:, :p.cols * K * d].astype(xp.uint64)
                    | (wm[:, 1::2][:, :p.cols * K * d].astype(xp.uint64)
                       << xp.uint64(32))).reshape(t * p.cols, K, d)

            coeffs = ecd.base_digits(e_flat)             # [t*BR, d]
            centers = ecd.drift_centers(coeffs)
            prov, agree, c_floor, c_frac, v0, v1 = twin_ecd.search(
                centers, u_enc)
            prov_ml, _, _, _, _, _ = twin_ml.search(None, u_ml,
                                                    zero_center=True)
            dl = default_lanes.reshape(t * BR)
            bad = ((~agree) & dl[:, None]).reshape(-1)
            n_bad = bad.sum(dtype=xp.int32)
            CAPT = CAP * t
            sentinel = t * BR * d
            idx = limb.nonzero_idx(xp, bad, CAPT)
            safe = xp.minimum(idx, sentinel - 1)
            g = lambda a: xp.take(a.reshape(-1), safe)
            fix_val = twin_ecd.resolve_device(
                xp, g(c_frac), g(u_enc), g(v0), g(v1), g(c_floor),
                valid=idx < sentinel, tier2=4096 * t)
            oidx_g = xp.where(
                oidx < BR, oidx + (xp.arange(t, dtype=oidx.dtype)[:, None]
                                   * BR), t * BR).reshape(-1)
            c_other = xp.zeros((t * BR, d), dtype=xp.int64)
            c_other = c_other.at[oidx_g].set(c_sub.reshape(-1, d),
                                             mode="drop")
            c = xp.where(dl[:, None], prov, c_other)
            cf = c.reshape(-1).at[idx].set(fix_val, mode="drop")
            e_i64 = ecd.correction_total(coeffs, cf.reshape(t * BR, d)
                                         ).reshape(t, B, R, d)
            noise = xp.concatenate(
                [prov_ml.reshape(t, p.cols, K, d), noise_mask[:, None]],
                axis=1)                                   # [t, B, K, d]

            # ---- commit cores, batched (MAC n-axis = t*B)
            enc = ring.ntt_mform(ring.embed_int64(e_i64))   # [2,L,t,B,R,d]
            mlwe = ring.ntt_mform(ring.embed_int64(noise))  # [2,L,t,B,K,d]
            x_all = xp.concatenate(
                [xp.moveaxis(enc, 4, 2),
                 xp.moveaxis(mlwe[:, :, :, :, :p.mlwe_rank, :], 4, 2)],
                axis=2)                                   # [2,L,KK,t,B,d]
            x_all = x_all.reshape(2, ring.L, x_all.shape[2], t * B, d)
            com = mac_matmul.mod_mac(ring, pk_inml, x_all, xp)
            tail = xp.moveaxis(mlwe[:, :, :, :, p.mlwe_rank:, :], 4, 2
                               ).reshape(2, ring.L, p.in_msis_rank, t * B, d)
            com = ring.add(com, tail)                     # [2,L,J,t*B,d]
            com = ring.intt_imform(com)
            ic = crt_in(com)                              # [2,LO,J,t*B,d]
            ic = ic.reshape(2, ring_out.L, p.in_msis_rank, t, B, d)
            ic = xp.moveaxis(ic, 2, 4)                    # [2,LO,t,B,J,d]
            ic = ic.reshape(2, ring_out.L, t * p.in_com_dcmp_len, d)
            ic_ntt = ring_out.ntt_mform(ic)
            x_out = ic_ntt.reshape(2, ring_out.L, t, p.in_com_dcmp_len, d)
            x_out = xp.moveaxis(x_out, 2, 3)              # [2,LO,dcmp,t,d]
            acc = mac_matmul.mod_mac(ring_out, pk_out, x_out, xp)
            acc = ring_out.intt_imform(acc)               # [2,LO,outR,t,d]
            outer = ring_out.ntt_mform(crt_out(acc))
            ic_ntt = ic_ntt.reshape(2, ring_out.L, t, p.in_com_dcmp_len, d)
            ic_ntt = xp.moveaxis(ic_ntt, 2, 0)            # [t,2,LO,dcmp,d]
            outer = xp.moveaxis(outer, 3, 0)              # [t,2,LO,outR,d]
            # outer digest + disagreement count packed into ONE flat array:
            # the host pulls a single buffer per chunk (each host pull pays
            # a full tunnel round trip)
            pack = xp.concatenate([outer.reshape(-1),
                                   n_bad.astype(xp.uint32)[None]])
            return e_i64, noise, ic_ntt, pack

        def stage_partial(left_ecd, enc):
            """Partial products Partial_i = sum_j left_j . Encode[i][j]
            (reference prover.go:275-294) — MXU contraction over rows."""
            if backend.is_jax():
                import jax.numpy as jnpl
                lp = mac_matmul.fold_key(ring, left_ecd[:, :, None, :, :],
                                         jnpl)
                x = jnpl.moveaxis(enc, 2, 3)  # [2, L, rows, B, d]
                return mac_matmul.mod_mac(ring, lp, x, jnpl)[:, :, 0, :, :]
            mm = lambda a, b: ring.mul_mont(a[:, :, None, :], b)
            return mac_sum(mm, ring.add,
                           ((left_ecd[:, :, j, :], enc[:, :, :, j, :])
                            for j in range(p.rows)))

        def stage_response(chals, enc, mlwe, vs_stacked=None, steps=None):
            """Responses = mask column + sum_j chal_j . column_j (reference
            prover.go:296-316) — MXU contraction over the cols axis.  Under
            jax the plain Horner evaluations y_i = v_i(x) (reference
            prover.go:318-323) ride in the same program (``vs_stacked``
            [w, t, n], ``steps`` [logn, w]) and everything returns as ONE
            flat u32 buffer: each host pull pays a tunnel round trip, so
            the whole tail of evaluate is a single pull."""
            resp_e = enc[:, :, p.cols, :, :]
            resp_m = mlwe[:, :, p.cols, :, :]
            if backend.is_jax():
                import jax.numpy as jnpl

                from ..ops.horner import horner_eval_traced

                cp = mac_matmul.fold_key(ring, chals[:, :, None, :, :], jnpl)
                te = mac_matmul.mod_mac(ring, cp, enc[:, :, :p.cols], jnpl)
                tm = mac_matmul.mod_mac(ring, cp, mlwe[:, :, :p.cols], jnpl)
                resp_e = ring.add(resp_e, te[:, :, 0, :, :])
                resp_m = ring.add(resp_m, tm[:, :, 0, :, :])
                if vs_stacked is None:
                    # tuple form for the sharded builders (parallel/)
                    return resp_e, resp_m
                ev = horner_eval_traced(self._horner_big, self.spec,
                                        vs_stacked, steps,
                                        vs_stacked.shape[2])
                return jnpl.concatenate(
                    [resp_e.reshape(-1), resp_m.reshape(-1),
                     ev.astype(jnpl.uint32).reshape(-1)])
            mm = lambda a, b: ring.mul_mont(a[:, :, None, :], b)
            for j in range(p.cols):
                cj = chals[:, :, j, :]
                resp_e = ring.add(resp_e, mm(cj, enc[:, :, j, :, :]))
                resp_m = ring.add(resp_m, mm(cj, mlwe[:, :, j, :, :]))
            return resp_e, resp_m

        def stage_combine(ics, encs, mlwes, bos, bqs):
            """Batch-combine t openings with challenge polys.
            ics [t,2,LO,dcmp,d]; encs [t,2,L,B,R,d]; bos [t,2,LO,d]."""
            def one(i_ic, i_enc, i_ml, bo, bq):
                return (ring_out.mul_mont(i_ic, bo[:, :, None, :]),
                        ring.mul_mont(i_enc, bq[:, :, None, None, :]),
                        ring.mul_mont(i_ml, bq[:, :, None, None, :]))
            if backend.is_jax():
                import jax

                def body(carry, xs):
                    tic, ten, tml = one(*xs)
                    ic, enc, ml = carry
                    return (ring_out.add(ic, tic), ring.add(enc, ten),
                            ring.add(ml, tml)), None
                init = one(ics[0], encs[0], mlwes[0], bos[0], bqs[0])
                (ic, enc, ml), _ = jax.lax.scan(
                    body, init, (ics[1:], encs[1:], mlwes[1:], bos[1:], bqs[1:]))
                return ic, enc, ml
            ic = enc = ml = None
            for i in range(p.batch):
                tic, ten, tml = one(ics[i], encs[i], mlwes[i], bos[i], bqs[i])
                ic = tic if ic is None else ring_out.add(ic, tic)
                enc = ten if enc is None else ring.add(enc, ten)
                ml = tml if ml is None else ring.add(ml, tml)
            return ic, enc, ml

        def stage_seeds_encode(e_i64, noise_i64):
            """Materialize an Opening's Encode/MLWE tensors from its seeds
            (deterministic: embed + MForm + NTT)."""
            return (ring.ntt_mform(ring.embed_int64(e_i64)),
                    ring.ntt_mform(ring.embed_int64(noise_i64)))

        def _tree_fold(rg, x):
            """Exact mod-q reduction over axis 2 by halving adds (mod-add
            is associative, so any order is bit-identical)."""
            import jax.numpy as jnpl
            while x.shape[2] > 1:
                h = x.shape[2] // 2
                s = rg.add(x[:, :, :h], x[:, :, h:2 * h])
                if x.shape[2] % 2:
                    s = jnpl.concatenate([s, x[:, :, 2 * h:]], axis=2)
                x = s
            return x[:, :, 0]

        def stage_combine_seeds(e_all, noise_all, ics, bos, bqs):
            """Batch-combine t openings from seeds with challenge polys
            (reference prover.go:230-268).  The opening tensors materialize
            in memory-bounded chunks — each chunk is ONE batched encode-NTT
            + challenge MAC + tree fold — instead of the t-step serial scan
            this replaces (round 2's non-monotone t=32 evaluate).  The
            chunk width comes from an HBM bytes estimate: the measured
            footprint is ~350 B/lane per opening (encode-NTT digit pairs,
            challenge-MAC Montgomery temporaries, tree-fold operands), and
            a TC=8 chunk at N=2^19 compiled to a 25.9 GB program."""
            import jax.numpy as jnpl

            t = e_all.shape[0]
            TC = getattr(self, "combine_chunk", None)
            if TC is None:
                lanes = (B * R + B * K) * d
                TC = max(1, int((8 << 30) // (350 * lanes)))
            acc = None
            for c0 in range(0, t, TC):
                c1 = min(c0 + TC, t)
                enc, ml = stage_seeds_encode(e_all[c0:c1], noise_all[c0:c1])
                bq = jnpl.moveaxis(bqs[c0:c1], 0, 2)[:, :, :, None, None, :]
                bo = jnpl.moveaxis(bos[c0:c1], 0, 2)[:, :, :, None, :]
                part = (
                    _tree_fold(ring_out, ring_out.mul_mont(
                        jnpl.moveaxis(ics[c0:c1], 0, 2), bo)),
                    _tree_fold(ring, ring.mul_mont(enc, bq)),
                    _tree_fold(ring, ring.mul_mont(ml, bq)),
                )
                acc = part if acc is None else (
                    ring_out.add(acc[0], part[0]),
                    ring.add(acc[1], part[1]),
                    ring.add(acc[2], part[2]))
            return acc

        self._twin_ecd = twin_ecd
        self._twin_ml = twin_ml
        self._raw_stages = {
            "commit_core": commit_core,
            "sample": stage_sample,
            "commit_from_samples": stage_commit,
            "commit_fused": stage_commit_fused,
            "commit_fused_batch": stage_commit_fused_batch,
            "seeds_encode": stage_seeds_encode,
            "combine_seeds": stage_combine_seeds,
            "partial": stage_partial,
            "response": stage_response,
            "combine": stage_combine,
        }
        self._stages = {k: self._table_jit(self._mesh_wrap(k, f))
                        for k, f in self._raw_stages.items()}
        return self._stages

    # --------------------------------------------- device-resident tables

    def _table_owners(self):
        """Objects whose big numpy tables become jit arguments of the stage
        programs (ops/devconst.py): the two matmul-NTT plans and the two
        twin-CDT samplers.  ~15 MB of tables that would otherwise inflate
        every compiled program (and its transfer through the axon tunnel)
        as inline HLO constants."""
        p = self.params
        owners = []
        for ring in (p.ring_q, p.ring_q_out):
            owners.extend(ring.devconst_owners())
        for tw in (getattr(self, "_twin_ecd", None),
                   getattr(self, "_twin_ml", None)):
            if tw is not None:
                owners.append(tw)
        return owners

    def _dev_tables(self):
        from .. import backend
        from ..ops import devconst

        key = (backend.current(), len(self._table_owners()))
        cache = getattr(self, "_dev_tables_cache", None)
        if cache is None or cache[0] != key:
            tabs = devconst.device_tables(self._table_owners(),
                                          backend.to_device)
            self._dev_tables_cache = (key, tabs)
        return self._dev_tables_cache[1]

    def _table_jit(self, fn):
        """jit with the owners' tables passed as a hidden leading argument
        (jax backend); plain backend.jit otherwise."""
        from .. import backend
        from ..ops import devconst

        if not backend.is_jax():
            return backend.jit(fn)
        return devconst.wrap(fn, self._table_owners(), backend.jit,
                             self._dev_tables)

    def raw_stages(self):
        """Unjitted device-stage functions, for wrapping in vmap/shard_map
        (see ringo_tpu.parallel) or external jit (driver graft entry)."""
        self._get_stages()
        return self._raw_stages

    def ck_device(self):
        """MAC operands of the commit-key matrices for the current backend,
        as the pair (inner [In | MLWE], outer Out) — folded bf16 MXU planes
        on jax (built once per CRS, on device), the raw concatenated digit
        planes on numpy.  Always passed to the stages as arguments — never
        baked into the HLO."""
        from .. import backend

        p = self.params
        key = backend.current()
        if getattr(self, "_ck_dev_cache", (None,))[0] != key:
            kin = np.concatenate([self.ck.In, self.ck.MLWE], axis=3)
            if backend.is_jax():
                import jax.numpy as jnp
                f_in = backend.jit(lambda k: (
                    lambda pl: (pl, mac_matmul.fold_corr(pl)))(
                        mac_matmul.fold_key(p.ring_q, k, jnp)))
                f_out = backend.jit(lambda k: (
                    lambda pl: (pl, mac_matmul.fold_corr(pl)))(
                        mac_matmul.fold_key(p.ring_q_out, k, jnp)))
                planes = (f_in(backend.to_device(kin)),
                          f_out(backend.to_device(self.ck.Out)))
            else:
                planes = (kin, self.ck.Out)
            self._ck_dev_cache = (key, planes)
        return self._ck_dev_cache[1]

    # ------------------------------------------------------------------ commit

    def _assemble(self, v: np.ndarray):
        """Host assembly of the encode-input tensor for one committed vector:
        masking rows, sigma map, populated map (reference genFirstLastRow +
        commitColTo row layout, prover.go:65-127)."""
        p = self.params
        spec = self.spec
        n = v.shape[1]
        if n > p.rank:
            raise ValueError("len(v) > params.rank")
        cs = p.cols * p.slots
        w = spec.w

        vpad = np.zeros((w, p.rank), dtype=np.uint32)
        vpad[:, :n] = np.asarray(v)

        # first/last masking rows (reference genFirstLastRow, prover.go:65-86)
        last_row = np.zeros((w, cs), dtype=np.uint32)
        last_row[:, :cs - 1] = sample_field_digits(spec, cs - 1, self.uniform)
        first_row = np.zeros((w, cs), dtype=np.uint32)
        first_row[:, 0] = vpad[:, 0]
        pd = spec.p_digits.reshape(w, 1)
        first_row[:, 1:] = limb.sub(vpad[:, 1:cs], last_row[:, :cs - 1], pd)

        # assemble the encode-input tensor [w, cols+1, rows, slots] + sigma
        # map — vectorized (the reference's commitColTo per-column loop,
        # prover.go:89-127, is a data layout: one transpose-copy here).
        # u16 throughout: digits are 16-bit, and this tensor is the
        # dominant host->device upload.
        B, R, S = p.cols + 1, p.rows, p.slots
        e_in = np.zeros((w, B, R, S), dtype=np.uint16)
        sigma = np.zeros((B, R))
        populated = np.zeros((B, R), dtype=bool)

        v3 = vpad.reshape(w, R - 1, p.cols, S)  # middle-row data view
        e_in[:, :p.cols, 0] = first_row.reshape(w, p.cols, S)
        e_in[:, :p.cols, R - 1] = last_row.reshape(w, p.cols, S)
        if R > 2:
            e_in[:, :p.cols, 1:R - 1] = np.swapaxes(v3[:, 1:], 1, 2)
        ii = np.arange(p.cols)[:, None]
        jj = np.arange(R)[None, :]
        # middle row (i, j) is populated while j*cs + i*S <= n (the
        # reference's break condition); first/last rows always are
        pop_data = (jj * cs + ii * S <= n) | (jj == 0) | (jj == R - 1)
        populated[:p.cols] = pop_data
        sigma[:p.cols] = np.where(pop_data, p.ecd_std_dev, 0.0)
        sigma[:p.cols, 0] = p.ecd_blind_std_dev
        # zero the unpopulated middle cells (loop semantics: they are
        # never written)
        e_in[:, :p.cols] *= populated[None, :p.cols, :, None].astype(np.uint16)

        # mask column (reference commitColTo i == cols branch) — all rows
        # drawn in one batched uniform call
        mask_rows = np.concatenate(
            [[0], 1 + np.nonzero(np.arange(1, R - 1) * cs <= n)[0], [R - 1]])
        mask_vals = sample_field_digits(
            spec, len(mask_rows) * S, self.uniform).reshape(w, len(mask_rows), S)
        e_in[:, p.cols, mask_rows] = mask_vals
        sigma[p.cols, mask_rows] = p.mask_std_dev
        sigma[p.cols, 0] = p.mask_blind_std_dev
        populated[p.cols, mask_rows] = True
        return e_in, sigma, populated

    def _host_side(self, e_in, sigma, populated):
        """Host inputs of the two device programs: sigma-class masks, sparse
        COSAC corrections for the non-default cells, ChaCha20 keys, and the
        mask-column MLWE noise."""
        p = self.params
        spec = self.spec
        w = spec.w
        B, R, S = p.cols + 1, p.rows, p.slots
        BR = B * R
        d = p.degree

        default = populated & np.isclose(sigma, p.ecd_std_dev, rtol=0, atol=0)
        other = populated & ~default
        default_lanes = default.reshape(-1)

        OMAX = (B - 1) + R
        oidx = np.nonzero(other.reshape(-1))[0]
        oidx_pad = np.full(OMAX, BR, dtype=np.int32)
        oidx_pad[:len(oidx)] = oidx
        c_sub = np.zeros((OMAX, d), dtype=np.int64)
        if len(oidx):
            e_sub = e_in.reshape(w, BR, S)[:, oidx, :].astype(np.uint32)
            centers_sub = self.ecd.drift_centers(self.ecd.base_digits(e_sub))
            sd_sub = np.repeat(sigma.reshape(-1)[oidx], d)
            c_sub[:len(oidx)] = self.ecd.cosac.sample(
                centers_sub.reshape(-1), sd_sub).reshape(len(oidx), d)

        K = p.mlwe_rank + p.in_msis_rank
        key_enc = chacha.key_from_bytes(bytes(self.uniform._take_bytes(32)))
        key_ml = chacha.key_from_bytes(bytes(self.uniform._take_bytes(32)))
        noise_mask = self.rounded.sample(
            0.0, p.mask_mlwe_std_dev, K * d).reshape(K, d)
        return (np.ascontiguousarray(e_in.reshape(w, BR, S)), default_lanes,
                oidx_pad, c_sub, key_enc, key_ml, noise_mask)

    # ----------------------------------- device-resident commit (fused path)

    def _meta(self, v_head: np.ndarray, n: int):
        """Host metadata for one commitment — the masking rows (drawn in
        the exact uniform-stream order of _assemble: last row, then mask
        column), sigma/populated maps — WITHOUT building the big e_in
        tensor, which is assembled on device (_assemble_stage).  Only the
        first cols*slots values of v are needed on host (they fold into the
        first masking row, reference genFirstLastRow prover.go:65-86)."""
        p, spec = self.params, self.spec
        w = spec.w
        B, R, S = p.cols + 1, p.rows, p.slots
        cs = p.cols * S
        head = np.zeros((w, cs), dtype=np.uint32)
        m = min(cs, n)
        head[:, :m] = np.asarray(v_head)[:, :m]
        last_row = np.zeros((w, cs), dtype=np.uint32)
        last_row[:, :cs - 1] = sample_field_digits(spec, cs - 1, self.uniform)
        first_row = np.zeros((w, cs), dtype=np.uint32)
        first_row[:, 0] = head[:, 0]
        pd = spec.p_digits.reshape(w, 1)
        first_row[:, 1:] = limb.sub(head[:, 1:], last_row[:, :cs - 1], pd)

        sigma = np.zeros((B, R))
        populated = np.zeros((B, R), dtype=bool)
        ii = np.arange(p.cols)[:, None]
        jj = np.arange(R)[None, :]
        pop_data = (jj * cs + ii * S <= n) | (jj == 0) | (jj == R - 1)
        populated[:p.cols] = pop_data
        sigma[:p.cols] = np.where(pop_data, p.ecd_std_dev, 0.0)
        sigma[:p.cols, 0] = p.ecd_blind_std_dev

        mask_rows = np.concatenate(
            [[0], 1 + np.nonzero(np.arange(1, R - 1) * cs <= n)[0], [R - 1]])
        mask_vals = sample_field_digits(
            spec, len(mask_rows) * S, self.uniform).reshape(w, len(mask_rows), S)
        sigma[p.cols, mask_rows] = p.mask_std_dev
        sigma[p.cols, 0] = p.mask_blind_std_dev
        populated[p.cols, mask_rows] = True
        return first_row, last_row, mask_rows, mask_vals, sigma, populated

    def _host_side_meta(self, first_row, last_row, mask_rows, mask_vals,
                        sigma, populated):
        """_host_side without e_in: the non-default-sigma cells are exactly
        the host-known masking rows, so their COSAC corrections never need
        the device tensor.  Same sampler-stream order as _host_side."""
        p, spec = self.params, self.spec
        w = spec.w
        B, R, S = p.cols + 1, p.rows, p.slots
        BR = B * R
        d = p.degree

        default = populated & np.isclose(sigma, p.ecd_std_dev, rtol=0, atol=0)
        other = populated & ~default
        default_lanes = default.reshape(-1)

        OMAX = (B - 1) + R
        oidx = np.nonzero(other.reshape(-1))[0]
        oidx_pad = np.full(OMAX, BR, dtype=np.int32)
        oidx_pad[:len(oidx)] = oidx
        c_sub = np.zeros((OMAX, d), dtype=np.int64)
        if len(oidx):
            mask_pos = {int(r): k for k, r in enumerate(mask_rows)}
            e_sub = np.zeros((w, len(oidx), S), dtype=np.uint32)
            for k, flat in enumerate(oidx):
                b, r = divmod(int(flat), R)
                if b < p.cols:
                    src = (first_row if r == 0 else last_row)
                    assert r in (0, R - 1), "middle cells are default-sigma"
                    e_sub[:, k] = src[:, b * S:(b + 1) * S]
                else:
                    e_sub[:, k] = mask_vals[:, mask_pos[r]]
            centers_sub = self.ecd.drift_centers(self.ecd.base_digits(e_sub))
            sd_sub = np.repeat(sigma.reshape(-1)[oidx], d)
            c_sub[:len(oidx)] = self.ecd.cosac.sample(
                centers_sub.reshape(-1), sd_sub).reshape(len(oidx), d)

        K = p.mlwe_rank + p.in_msis_rank
        key_enc = chacha.key_from_bytes(bytes(self.uniform._take_bytes(32)))
        key_ml = chacha.key_from_bytes(bytes(self.uniform._take_bytes(32)))
        noise_mask = self.rounded.sample(
            0.0, p.mask_mlwe_std_dev, K * d).reshape(K, d)
        return default_lanes, oidx_pad, c_sub, key_enc, key_ml, noise_mask

    def _assemble_stage(self, n: int):
        """Per-n jitted device assembly of e_all [w, BR, S] u16 from padded
        value planes + host masking rows (the data movement of the
        reference's commitColTo layout, prover.go:89-127, on device)."""
        self._get_stages()
        key = ("asm", n)
        if key in self._stages:
            return self._stages[key]
        from .. import backend
        import jax.numpy as jnp

        p, spec = self.params, self.spec
        w = spec.w
        B, R, S = p.cols + 1, p.rows, p.slots
        cs = p.cols * S
        ii = np.arange(p.cols)[:, None]
        jj = np.arange(1, R - 1)[None, :]
        pop_mid = (jj * cs + ii * S <= n).astype(np.uint16)  # [cols, R-2]
        mask_rows = np.concatenate(
            [[0], 1 + np.nonzero(np.arange(1, R - 1) * cs <= n)[0], [R - 1]])

        def run(v, first_row, last_row, mask_vals):
            v = v.astype(jnp.uint16)
            vpad = jnp.zeros((w, p.rank), dtype=jnp.uint16).at[:, :n].set(v)
            v3 = vpad.reshape(w, R - 1, p.cols, S)
            mid = jnp.swapaxes(v3[:, 1:], 1, 2) * pop_mid[None, :, :, None]
            colb = jnp.concatenate(
                [first_row.astype(jnp.uint16).reshape(w, p.cols, 1, S),
                 mid,
                 last_row.astype(jnp.uint16).reshape(w, p.cols, 1, S)],
                axis=2)
            maskc = jnp.zeros((w, 1, R, S), dtype=jnp.uint16).at[
                :, 0, mask_rows].set(mask_vals.astype(jnp.uint16))
            return jnp.concatenate([colb, maskc], axis=1).reshape(w, B * R, S)

        self._stages[key] = backend.jit(run)
        return self._stages[key]

    def _assemble_stage_batch(self, n: int, t: int):
        """vmapped ``_assemble_stage(n)`` over a leading batch of t commits
        with the same value width."""
        self._get_stages()
        key = ("asmb", n, t)
        if key not in self._stages:
            from .. import backend
            import jax

            # reuse the single-commit traced body (key ("asm", n) holds its
            # jitted form; rebuild the raw closure for vmap)
            single = self._assemble_stage(n)
            self._stages[key] = backend.jit(jax.vmap(single))
        return self._stages[key]

    def _commit_fused_path(self, vs: list):
        """Fused device commits for host- or device-resident value planes
        (u16/u32 digit planes [w, n]).  The batch is dispatched in chunks
        of the batched fused program (``stage_commit_fused_batch``): encode
        NTTs run over c*B*R rows and the Ajtai MAC contraction sees
        n = c*B columns, so batching feeds the MXU instead of pipelining t
        small programs.  The chunk size c comes from ``_fuse_chunk`` (an
        HBM-bytes transient estimate): at N=2^19 the fully-batched t=8
        program's transients exceed v5e HBM, so large-rank batches run as a few
        big chunked dispatches (still bit-identical — the batch program is
        bit-equal to sequential singles at every t).  All chunks are
        dispatched before any result is pulled, so device work overlaps the
        next chunk's host-side prep.  Returns None on (astronomically rare)
        resolver-cap overflow."""
        t = len(vs)
        c = self._fuse_chunk(t)
        chunks = [vs[s:s + c] for s in range(0, t, c)]
        parts = [self._fused_dispatch(ch) for ch in chunks]
        out = []
        for ch, pr in zip(chunks, parts):
            res = self._fused_finish(ch, pr)
            if res is None:  # pragma: no cover
                return None
            out.extend(res)
        return out

    def _opening_bytes(self) -> int:
        """Device-resident bytes ONE opening keeps alive after its commit
        returns (seeds e_i64/noise, ic_ntt digit pairs, the stashed value
        planes) — subtracted from the transient budget when chunking a
        t-commit batch, since all t openings coexist with the in-flight
        dispatch."""
        p = self.params
        B, R, d = p.cols + 1, p.rows, p.degree
        K = p.mlwe_rank + p.in_msis_rank
        LO = p.ring_q_out.L
        return (8 * B * R * d + 8 * B * K * d
                + 2 * LO * p.in_com_dcmp_len * d * 4
                + self.spec.w * p.rank * 2)

    def _fuse_chunk(self, t: int = 1) -> int:
        """Commits per fused-batch dispatch: the HBM budget left after the
        t accumulated openings, divided by a bytes estimate of the batch
        program's live transients per commit — the sampling front end (u64
        entropy, i64 digits/centers/values, ~40 B/lane live at once), the
        encode/MLWE NTT digit-pair planes and their contraction-layout
        copies (24 B/lane each), and the int8 MXU byte planes — times 2
        for scheduler overlap slack.  Evaluates to ~1.9 GB/commit at
        N=2^19 (the measured footprint): chunk 4-5 at t=8, while N=2^17
        t=16 runs as one dispatch."""
        p = self.params
        B, R, d = p.cols + 1, p.rows, p.degree
        K = p.mlwe_rank + p.in_msis_rank
        lanes = B * R * d
        ml_lanes = B * K * d
        per = 2 * ((40 + 8 + 8 + 24 + 24 + 4) * lanes
                   + (8 + 24 + 24) * ml_lanes)
        budget = max(per, self.FUSE_HBM_BYTES - t * self._opening_bytes())
        return max(1, budget // per)

    def _fused_dispatch(self, vs: list):
        """Prepare + dispatch one fused-batch chunk; no result pulls."""
        from .. import backend
        import jax.numpy as jnp

        p = self.params
        stages = self._get_stages()
        dev = backend.to_device
        t = len(vs)
        cs = p.cols * p.slots

        with profiling.span("jindo.commit.heads"):
            on_dev = [limb.get_xp(v) is not np for v in vs]
            if any(on_dev):
                hs = jnp.stack(
                    [jnp.pad(jnp.asarray(v[:, :min(cs, v.shape[1])]).astype(
                        jnp.uint32), ((0, 0), (0, cs - min(cs, v.shape[1]))))
                     for v in vs])
                heads = np.asarray(hs)  # one pull for the whole batch
            else:
                heads = [np.asarray(v[:, :cs]) for v in vs]

        if not hasattr(self, "_v_cache"):
            self._v_cache = backend.DeviceCache(8)
        sides = []
        metas = []
        v_devs = []
        for i, v in enumerate(vs):
            if not on_dev[i]:
                # memoized upload FIRST (async device_put): the ~30 MB/s
                # tunnel transfer overlaps the host meta/COSAC work below,
                # and repeated commits of the same buffer skip it entirely
                v_dev = self._v_cache.get(
                    v, lambda a: dev(np.asarray(a).astype(np.uint16)))
            else:
                v_dev = dev(v)
            v_devs.append(v_dev)
            with profiling.span("jindo.commit.meta"):
                meta = self._meta(heads[i], v.shape[1])
                metas.append(meta)
                sides.append(self._host_side_meta(*meta))

        # device assembly batched per distinct width: one vmapped dispatch
        # per group instead of t single-commit programs
        e_alls: list = [None] * t
        with profiling.span("jindo.commit.assemble"):
            groups: dict[int, list[int]] = {}
            for i, v in enumerate(vs):
                groups.setdefault(v.shape[1], []).append(i)
            for n_g, idxs in groups.items():
                if len(idxs) == 1:
                    i = idxs[0]
                    e_alls[i] = self._assemble_stage(n_g)(
                        v_devs[i], dev(metas[i][0]), dev(metas[i][1]),
                        dev(metas[i][3]))
                    continue
                fn = self._assemble_stage_batch(n_g, len(idxs))
                outs = fn(jnp.stack([v_devs[i] for i in idxs]),
                          dev(np.stack([metas[i][0] for i in idxs])),
                          dev(np.stack([metas[i][1] for i in idxs])),
                          dev(np.stack([metas[i][3] for i in idxs])))
                for j, i in enumerate(idxs):
                    e_alls[i] = outs[j]

        with profiling.span("jindo.commit.dispatch"):
            stack = lambda j: dev(np.stack([s[j] for s in sides]))
            e_all = e_alls[0][None] if t == 1 else jnp.stack(e_alls)
            out = stages["commit_fused_batch"](
                e_all, stack(3), stack(4), stack(0), stack(2), stack(1),
                stack(5), *self.ck_device())
        return out, v_devs

    def _fused_finish(self, vs: list, part):
        """Pull one dispatched chunk's results and build the entities."""
        from .. import backend

        p = self.params
        stages = self._get_stages()
        (e_i64, noise, ic_ntt, pack), v_devs = part
        t = len(vs)
        with profiling.span("jindo.commit.pull"):
            ph = backend.to_host(pack)  # one pull: outer digests + n_bad
            outer_h = ph[:-1].reshape(t, 2, p.ring_q_out.L,
                                      p.out_msis_rank, p.degree)
            if int(ph[-1]) > self.FIX_CAP * t:
                return None  # pragma: no cover
        return [(Commitment(p, outer_h[i]),
                 Opening(p, in_commit=ic_ntt[i],
                         seeds=(e_i64[i], noise[i]),
                         materializer=stages["seeds_encode"],
                         v_dev=v_devs[i], v_src=vs[i]))
                for i in range(t)]

    def _resolve_packed(self, ph):
        """Host fix-up from one pulled packed array [8, CAP].  Returns
        (fix_idx int64 [CAP], fix_val int64 [CAP]) or None on cap overflow."""
        p = self.params
        BRd = (p.cols + 1) * p.rows * p.degree
        fix_idx = ph[0].astype(np.int64)
        count = int((fix_idx < BRd).sum())
        if count >= self.FIX_CAP:  # pragma: no cover — astronomically rare
            return None
        fix_val = np.zeros(self.FIX_CAP, dtype=np.int64)
        if count:
            # nonzero() yields sorted indices, so the first `count` packed
            # rows are the real disagreements — don't resolve sentinel rows
            sl = slice(0, count)
            cfrac_b = (ph[4, sl].astype(np.float64) * 2.0 ** -32
                       + ph[5, sl].astype(np.float64) * 2.0 ** -64)
            u_b = (ph[6, sl].astype(np.uint64)
                   | (ph[7, sl].astype(np.uint64) << np.uint64(32)))
            fix_val[sl] = self._twin_ecd.resolve_host(
                cfrac_b, u_b, ph[1, sl].astype(np.int64),
                ph[2, sl].astype(np.int64), ph[3, sl].view(np.int32))
        return fix_idx, fix_val

    def _get_vstages(self, t: int):
        """Batched (vmapped) sample/commit stages for a leading axis of t."""
        from .. import backend

        self._get_stages()
        key = ("v", t)
        if key in self._stages:
            return self._stages[key]
        import jax

        vs = {
            "sample": self._table_jit(jax.vmap(self._raw_stages["sample"])),
            "commit_from_samples": self._table_jit(jax.vmap(
                self._raw_stages["commit_from_samples"],
                in_axes=(0,) * 9 + (None, None))),
        }
        self._stages[key] = vs
        return vs

    def commit(self, v: np.ndarray):
        """Commit plain digit planes v [w, n], n <= rank.
        Returns (Commitment, Opening).  Reference prover.go:45-202."""
        from .. import backend

        p = self.params
        stages = self._get_stages()
        dev = backend.to_device

        if backend.is_jax() and self.resolve == "device":
            out = self._commit_fused_path([v])
            if out is not None:
                return out[0]
            # pragma: no cover — CAP overflow: redo on the host path
            e_in, sigma, populated = self._assemble(np.asarray(v))
            B, R, S = p.cols + 1, p.rows, p.slots
            return self._commit_host_fallback(e_in, sigma, populated, B, R, S)

        with profiling.span("jindo.commit.assemble"):
            e_in, sigma, populated = self._assemble(v)
            (e_flat, default_lanes, oidx_pad, c_sub,
             key_enc, key_ml, noise_mask) = self._host_side(
                e_in, sigma, populated)

        # device program 1: entropy, base-b digits, drift, twin-CDT search
        with profiling.span("jindo.commit.sample"):
            coeffs, prov, prov_ml, packed = stages["sample"](
                dev(e_flat), dev(key_enc), dev(key_ml), dev(default_lanes))
            packed_h = np.asarray(packed)

        # host: exact resolution of the (rare) twin-table disagreements —
        # one packed pull carries everything the resolver needs
        with profiling.span("jindo.commit.resolve"):
            fixes = self._resolve_packed(packed_h)
        if fixes is None:  # pragma: no cover
            B, R, S = p.cols + 1, p.rows, p.slots
            return self._commit_host_fallback(e_in, sigma, populated, B, R, S)
        fix_idx, fix_val = fixes

        # device program 2: apply fixes, build coefficients/noise, full
        # commit pipeline (encode NTTs, Ajtai MACs, CRT cutoffs, outer)
        with profiling.span("jindo.commit.core"):
            open_ = Opening(p)
            enc, mlwe, ic_ntt, outer = stages["commit_from_samples"](
                coeffs, prov, prov_ml, dev(c_sub), dev(oidx_pad),
                dev(default_lanes), dev(fix_idx.astype(np.int32)),
                dev(fix_val.astype(np.int32)), dev(noise_mask),
                *self.ck_device())
            open_.encode, open_.mlwe, open_.in_commit = enc, mlwe, ic_ntt
            out = Commitment(p, backend.to_host(outer)), open_
        return out

    def commit_many(self, vs: list[np.ndarray]):
        """Commit a batch of vectors through one batched pass of the two
        device programs (one packed pull for all fix-ups).  Returns a list of
        (Commitment, Opening).  Semantically identical to sequential
        ``commit`` calls (up to the order randomness is drawn from the host
        streams); amortizes dispatch and transfer latency across the batch."""
        from .. import backend

        t = len(vs)
        if t == 0:
            return []
        if t == 1 or not backend.is_jax():
            return [self.commit(v) for v in vs]

        p = self.params

        if self.resolve == "device":
            out = self._commit_fused_path(vs)
            if out is not None:
                return out
            return [self.commit(np.asarray(v)) for v in vs]  # pragma: no cover

        dev = backend.to_device
        vstages = self._get_vstages(t)

        hosts = []
        assembled = []
        for v in vs:
            e_in, sigma, populated = self._assemble(v)
            assembled.append((e_in, sigma, populated))
            hosts.append(self._host_side(e_in, sigma, populated))
        stack = lambda i: np.stack([h[i] for h in hosts])

        coeffs, prov, prov_ml, packed = vstages["sample"](
            dev(stack(0)), dev(stack(4)), dev(stack(5)), dev(stack(1)))

        ph = np.asarray(packed)  # [t, 8, CAP]
        fix_idx = np.empty((t, self.FIX_CAP), dtype=np.int32)
        fix_val = np.empty((t, self.FIX_CAP), dtype=np.int32)
        for i in range(t):
            fixes = self._resolve_packed(ph[i])
            if fixes is None:  # pragma: no cover
                return [self.commit(v) for v in vs]
            fix_idx[i] = fixes[0].astype(np.int32)
            fix_val[i] = fixes[1].astype(np.int32)

        enc, mlwe, ic_ntt, outer = vstages["commit_from_samples"](
            coeffs, prov, prov_ml, dev(stack(3)), dev(stack(2)),
            dev(stack(1)), dev(fix_idx), dev(fix_val), dev(stack(6)),
            *self.ck_device())

        outer_h = backend.to_host(outer)
        out = []
        for i in range(t):
            open_ = Opening(p, in_commit=ic_ntt[i], encode=enc[i],
                            mlwe=mlwe[i])
            out.append((Commitment(p, outer_h[i]), open_))
        return out

    def _commit_host_fallback(self, e_in, sigma, populated, B, R, S):
        """Full host-sampled path (reference randEncodeTo semantics), used
        when the device disagreement count exceeds FIX_CAP."""
        from .. import backend

        p = self.params
        w = self.spec.w
        d = p.degree
        stages = self._get_stages()
        flat_idx = np.nonzero(populated.reshape(-1))[0]
        e_sel = e_in.reshape(w, B * R, S)[:, flat_idx, :]
        e_i64 = np.zeros((B * R, d), dtype=np.int64)
        e_i64[flat_idx] = self.ecd.rand_encode_coeffs(
            e_sel, sigma.reshape(-1)[flat_idx])
        e_i64 = e_i64.reshape(B, R, d)
        K = p.mlwe_rank + p.in_msis_rank
        noise = np.zeros((B, K, d), dtype=np.int64)
        noise[:p.cols] = self.mlwe_sampler.sample(
            np.zeros(p.cols * K * d)).reshape(p.cols, K, d)
        noise[p.cols] = self.rounded.sample(
            0.0, p.mask_mlwe_std_dev, K * d).reshape(K, d)
        open_ = Opening(p)
        enc, mlwe, ic_ntt, outer = stages["commit_core"](
            backend.to_device(e_i64), backend.to_device(noise),
            *self.ck_device())
        open_.encode, open_.mlwe, open_.in_commit = enc, mlwe, ic_ntt
        return Commitment(p, backend.to_host(outer)), open_

    # ---------------------------------------------------------------- evaluate

    def evaluate(self, x: int, vs: list[np.ndarray], coms: list[Commitment],
                 opens: list[Opening]):
        """Batched evaluation proof at x (reference prover.go:205-324).
        vs: plain digit planes [w, n_i].  Returns (evals, Proof)."""
        p = self.params
        spec = self.spec
        if not (len(vs) == len(coms) == len(opens) == p.batch):
            raise ValueError("batch size mismatch")
        ring, ring_out = p.ring_q, p.ring_q_out

        oracle = Shake128Stream()
        oracle.write(self.ck.raw_bytes())
        for c in coms:
            oracle.write(c.raw_bytes())
        oracle.write(spec.marshal(x))

        from .. import backend

        stages = self._get_stages()

        if p.batch > 1:
            batch_bytes = [oracle.read(16) for _ in range(p.batch)]
            batch_q = encode_challenges(p, ring, batch_bytes)     # [2,L,t,d]
            batch_out = encode_challenges(p, ring_out, batch_bytes)
            oracle.reset()
            oracle.write(self.ck.raw_bytes())
            for c in coms:
                oracle.write(c.raw_bytes())
            oracle.write(spec.marshal(x))
            oracle.write(b"".join(batch_bytes))

            if backend.is_jax() and all(o.seeds is not None for o in opens):
                import jax.numpy as jnpl
                with profiling.span("jindo.evaluate.combine"):
                    ic, enc, ml = stages["combine_seeds"](
                        jnpl.stack([o.seeds[0] for o in opens]),
                        jnpl.stack([o.seeds[1] for o in opens]),
                        jnpl.stack([jnpl.asarray(o.in_commit)
                                    for o in opens]),
                        backend.to_device(np.moveaxis(batch_out, 2, 0)),
                        backend.to_device(np.moveaxis(batch_q, 2, 0)))
            else:
                if backend.is_jax():
                    import jax.numpy as jnpl
                    xp_stack = lambda arrs: jnpl.stack(
                        [jnpl.asarray(a) for a in arrs])
                else:
                    xp_stack = lambda arrs: np.stack(
                        [np.asarray(a) for a in arrs])
                ic, enc, ml = stages["combine"](
                    xp_stack([o.in_commit for o in opens]),
                    xp_stack([o.encode for o in opens]),
                    xp_stack([o.mlwe for o in opens]),
                    backend.to_device(np.moveaxis(batch_out, 2, 0)),
                    backend.to_device(np.moveaxis(batch_q, 2, 0)),
                )
            open_batch = Opening(p, in_commit=ic, encode=enc, mlwe=ml)
        else:
            open_batch = opens[0]

        pf = Proof(p)
        ic_dev = open_batch.in_commit
        if backend.is_jax() and hasattr(ic_dev, "copy_to_host_async"):
            ic_dev.copy_to_host_async()  # overlap with the partial stage

        left = left_vec(p, x)
        left_ecd = self.ecd.encode_scalars(left)  # [2, L, rows, d]

        # partial products (reference prover.go:275-294)
        part = backend.to_host(stages["partial"](
            backend.to_device(left_ecd), backend.to_device(open_batch.encode)))
        pf.partial = part[:, :, :p.cols, :]
        pf.partial_mask = part[:, :, p.cols, :]
        pf.in_commit = backend.to_host(ic_dev).copy()

        for i in range(p.cols):
            oracle.write(ring.to_bytes(pf.partial[:, :, i, :]))
        oracle.write(ring.to_bytes(pf.partial_mask))

        chals = encode_challenges(
            p, ring, [oracle.read(16) for _ in range(p.cols)])  # [2,L,cols,d]

        # responses (reference prover.go:296-316) + device Horner
        # evaluations y_i = v_i(x) (prover.go:318-323) in one program under
        # jax, pulled as one buffer (one tunnel round trip for the whole
        # evaluate tail)
        if backend.is_jax():
            if not hasattr(self, "_horner"):
                from ..ops.horner import HornerPlan
                self._horner = HornerPlan(spec)
            # use the device copies stashed at commit time (skips
            # re-uploading hundreds of MB at t=8) — but only when the
            # caller passed the *same array object* that was committed;
            # a shape-only match would silently evaluate the committed
            # copy instead of a different same-shape value
            vs_eval = [o.v_dev if (o.v_dev is not None
                                   and (v is None or v is o.v_src))
                       else v for v, o in zip(vs, opens)]
            n_max = max(v.shape[1] for v in vs_eval)
            with profiling.span("jindo.evaluate.response"):
                pack = stages["response"](
                    backend.to_device(chals),
                    backend.to_device(open_batch.encode),
                    backend.to_device(open_batch.mlwe),
                    self._horner.stack_inputs(vs_eval, n_max),
                    backend.to_device(self._horner.steps_for(x, n_max)))
                ph = backend.to_host(pack)
            L, d, R = ring.L, p.degree, p.rows
            K = p.mlwe_rank + p.in_msis_rank
            ne = 2 * L * R * d
            nm = 2 * L * K * d
            pf.encode = ph[:ne].reshape(2, L, R, d)
            pf.mlwe = ph[ne:ne + nm].reshape(2, L, K, d)
            ev_digits = ph[ne + nm:].reshape(spec.w, len(vs_eval))
            evals = [limb.digits_to_ints(ev_digits[:, i:i + 1])[0]
                     for i in range(len(vs_eval))]
        else:
            resp_e, resp_m = stages["response"](
                backend.to_device(chals),
                backend.to_device(open_batch.encode),
                backend.to_device(open_batch.mlwe))
            pf.encode = backend.to_host(resp_e)
            pf.mlwe = backend.to_host(resp_m)
            with profiling.span("jindo.evaluate.horner"):
                evals = []
                for v in vs:
                    coeffs = limb.digits_to_ints(np.asarray(v))
                    acc = 0
                    for c in reversed(coeffs):
                        acc = (acc * x + c) % spec.p
                    evals.append(acc)

        return evals, pf
