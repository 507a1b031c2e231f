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
from ..fields import limb
from ..rings.rns import RnsReconstructor
from ..utils.transcript import Shake128Stream
from .challenge import encode_challenge, left_vec
from .encoder import Encoder
from .entities import CommitKey, Commitment, Opening, Proof
from .params import Parameters


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
    def __init__(self, params: Parameters, crs: bytes, seed: bytes | None = None):
        self.params = params
        self.spec = params.spec
        self.ecd = Encoder(params, seed)
        self.rns_out = RnsReconstructor(params.ring_q_out)
        self.ck = CommitKey(params, crs)
        self.uniform = UniformSampler(None if seed is None else seed + b"u")
        self.rounded = RoundedGaussianSampler(None if seed is None else seed + b"rg")
        self.mlwe_sampler = TwinCDTGaussianSampler(
            params.mlwe_std_dev, None if seed is None else seed + b"ml")

    # ------------------------------------------------------------------ commit

    def commit(self, v: np.ndarray):
        """Commit plain digit planes v [w, n], n <= rank.
        Returns (Commitment, Opening).  Reference prover.go:45-202."""
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

        # assemble the encode-input tensor [w, cols+1, rows, slots] + sigma map
        B, R, S = p.cols + 1, p.rows, p.slots
        e_in = np.zeros((w, B, R, S), dtype=np.uint32)
        sigma = np.zeros((B, R))
        populated = np.zeros((B, R), dtype=bool)

        v3 = vpad.reshape(w, R - 1, p.cols, S)  # middle-row data view
        for i in range(p.cols):
            e_in[:, i, 0] = first_row[:, i * S:(i + 1) * S]
            sigma[i, 0] = p.ecd_blind_std_dev
            populated[i, 0] = True
            for j in range(1, R - 1):
                if j * cs + i * S > n:
                    break
                e_in[:, i, j] = v3[:, j, i]
                sigma[i, j] = p.ecd_std_dev
                populated[i, j] = True
            e_in[:, i, R - 1] = last_row[:, i * S:(i + 1) * S]
            sigma[i, R - 1] = p.ecd_std_dev
            populated[i, R - 1] = True
        # mask column (reference commitColTo i == cols branch)
        mask_rows = [0]
        for j in range(1, R - 1):
            if j * cs > n:
                break
            mask_rows.append(j)
        mask_rows.append(R - 1)
        for j in mask_rows:
            e_in[:, p.cols, j] = sample_field_digits(spec, S, self.uniform)
            sigma[p.cols, j] = (p.mask_blind_std_dev if j == 0 else p.mask_std_dev)
            populated[p.cols, j] = True

        # batched randomized encode of the populated cells
        open_ = Opening(p)
        flat_idx = np.nonzero(populated.reshape(-1))[0]
        e_sel = e_in.reshape(w, B * R, S)[:, flat_idx, :]
        enc = self.ecd.rand_encode(e_sel, sigma.reshape(-1)[flat_idx])
        encode = p.ring_q.new_poly(B * R)
        encode[:, :, flat_idx, :] = enc
        open_.encode = encode.reshape(2, p.ring_q.L, B, R, p.degree)

        # MLWE noise (reference prover.go:130-142)
        K = p.mlwe_rank + p.in_msis_rank
        d = p.degree
        noise = np.zeros((B, K, d), dtype=np.int64)
        noise[:p.cols] = self.mlwe_sampler.sample(
            np.zeros(p.cols * K * d)).reshape(p.cols, K, d)
        noise[p.cols] = self.rounded.sample(
            0.0, p.mask_mlwe_std_dev, K * d).reshape(K, d)
        ring = p.ring_q
        open_.mlwe = ring.ntt(ring.mform(ring.embed_int64(noise)))

        # inner Ajtai products (reference prover.go:144-157):
        # com[j, col] = sum_k In[j,k] * Encode[col,k] + sum_k MLWEmat[j,k] *
        #              noise[col,k] + noise[col, mlweRank+j]
        E = open_.encode
        M = open_.mlwe
        In, MLWEmat = self.ck.In, self.ck.MLWE
        com = None
        for k in range(p.rows):
            term = ring.mul_mont(In[:, :, :, k, None, :], E[:, :, None, :, k, :])
            com = term if com is None else ring.add(com, term)
        for k in range(p.mlwe_rank):
            term = ring.mul_mont(MLWEmat[:, :, :, k, None, :], M[:, :, None, :, k, :])
            com = ring.add(com, term)
        com = ring.add(com, np.moveaxis(M[:, :, :, p.mlwe_rank:, :], 3, 2))
        # com: [2, L, inR, B, d]

        # cutoff: INTT -> exact CRT -> >> logInCutOff -> re-embed in ring_q_out
        # (reference prover.go:159-176)
        com = ring.intt(ring.imform(com))
        vals = self.ecd.rns.reconstruct(com)
        shift = p.log_in_cutoff
        vals = [x >> shift for x in vals]
        ring_out = p.ring_q_out
        in_commit = self.rns_out.set_bigints(vals).reshape(
            2, ring_out.L, p.in_msis_rank, B, d)
        in_commit = np.moveaxis(in_commit, 3, 2)  # [2, LO, B, inR, d]
        in_commit = in_commit.reshape(2, ring_out.L, p.in_com_dcmp_len, d)
        open_.in_commit = ring_out.ntt(ring_out.mform(in_commit))

        # outer commitment (reference outerCommitTo, prover.go:180-202)
        Out = self.ck.Out
        acc = None
        for j in range(p.in_com_dcmp_len):
            term = ring_out.mul_mont(Out[:, :, :, j, :],
                                     open_.in_commit[:, :, None, j, :])
            acc = term if acc is None else ring_out.add(acc, term)
        acc = ring_out.intt(ring_out.imform(acc))
        vals = self.rns_out.reconstruct(acc)
        vals = [x >> p.log_out_cutoff for x in vals]
        outer = self.rns_out.set_bigints(vals).reshape(
            2, ring_out.L, p.out_msis_rank, d)
        outer = ring_out.ntt(ring_out.mform(outer))

        return Commitment(p, outer), open_

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

        batch_q = batch_out = None
        if p.batch > 1:
            batch_bytes = [oracle.read(16) for _ in range(p.batch)]
            batch_q = [encode_challenge(p, ring, bb) for bb in batch_bytes]
            batch_out = [encode_challenge(p, ring_out, bb) for bb in batch_bytes]
            oracle.reset()
            oracle.write(self.ck.raw_bytes())
            for c in coms:
                oracle.write(c.raw_bytes())
            oracle.write(spec.marshal(x))
            oracle.write(b"".join(batch_bytes))

            ob = Opening(p)
            for i in range(p.batch):
                bo = batch_out[i][:, :, 0][:, :, None, :]          # [2,LO,1,d]
                bq = batch_q[i][:, :, 0][:, :, None, None, :]      # [2,L,1,1,d]
                ob.in_commit = ring_out.add(
                    ob.in_commit, ring_out.mul_mont(opens[i].in_commit, bo))
                ob.encode = ring.add(
                    ob.encode, ring.mul_mont(opens[i].encode, bq))
                ob.mlwe = ring.add(
                    ob.mlwe, ring.mul_mont(opens[i].mlwe, bq))
            open_batch = ob
        else:
            open_batch = opens[0]

        pf = Proof(p)
        pf.in_commit = open_batch.in_commit.copy()

        left = left_vec(p, x)
        left_ecd = self.ecd.encode_scalars(left)  # [2, L, rows, d]

        # partial products (reference prover.go:275-294)
        E = open_batch.encode  # [2, L, B, rows, d]
        part = None
        for j in range(p.rows):
            term = ring.mul_mont(left_ecd[:, :, j, None, :], E[:, :, :, j, :])
            part = term if part is None else ring.add(part, term)
        pf.partial = part[:, :, :p.cols, :]
        pf.partial_mask = part[:, :, p.cols, :]

        for i in range(p.cols):
            oracle.write(ring.to_bytes(pf.partial[:, :, i, :]))
        oracle.write(ring.to_bytes(pf.partial_mask))

        chals = [encode_challenge(p, ring, oracle.read(16))
                 for _ in range(p.cols)]

        # responses (reference prover.go:296-316)
        pf.encode = open_batch.encode[:, :, p.cols, :, :].copy()
        pf.mlwe = open_batch.mlwe[:, :, p.cols, :, :].copy()
        for j in range(p.cols):
            cj = chals[j][:, :, 0]
            pf.encode = ring.add(pf.encode, ring.mul_mont(
                cj[:, :, None, :], open_batch.encode[:, :, j, :, :]))
            pf.mlwe = ring.add(pf.mlwe, ring.mul_mont(
                cj[:, :, None, :], open_batch.mlwe[:, :, j, :, :]))

        # plain evaluations y_i = v_i(x) over Z_p (host Horner)
        evals = []
        for v in vs:
            coeffs = limb.digits_to_ints(np.asarray(v))
            acc = 0
            for c in reversed(coeffs):
                acc = (acc * x + c) % spec.p
            evals.append(acc)

        return evals, pf
