"""Parameter-fidelity closure without a Go toolchain (VERDICT r2 item 4).

The reference computes its analytic commitment/proof sizes from *60-bit
modulus budgets* (params.go:248-257,443-455: ``qLimbs = ceil(log2 q / 60)``,
``q = 2^(qBits*qLimbs)``) before any prime is materialized.  The repo's
search keeps those budget lines float-for-float (jindo/params.py:190-193,
218-221) and deviates only in `_prime_chain`, which splits the SAME budget
into 30-bit NTT-friendly primes (TPU digit planes are 2x16-bit).  Hence:

* ``com_size``/``pf_size`` are bit-identical floats to the reference at
  60-bit grain — the deviation has ZERO effect on the size accounting;
* the materialized 30-bit chain must still cover the 60-grain budget
  (soundness: the security argument sees q = 2^(bits*limbs)), with
  L = ceil(budget/30) planes — twice the reference's plane count, which
  affects in-memory layout and serialized residue bytes only.

This file asserts both, for all seven reference moduli, with an
independent recomputation of the reference size formula (the duplication
*is* the check)."""

import math

import pytest

from ringo_tpu import jindo
from ringo_tpu.fields.spec import REFERENCE_FIELDS
from ringo_tpu.jindo.params import (ETA, MAX_LOG_Q, RLWE_RANK, TAIL_CUT,
                                    find_msis_rank)


def _reference_sizes(spec, target_n: int, batch: int):
    """Independent re-derivation of the winning (com_size, pf_size) pair,
    following reference params.go:126-320 at 60-bit grain.  Returns
    (com_size, pf_size, log_q_budget, log_qq_budget)."""
    t, b, k = float(batch), float(spec.b), float(spec.k)
    d = float(max(spec.k, 256))
    l = d / k
    nu = RLWE_RANK / d
    max_cols = int(math.ceil(target_n / l))
    min_size = math.inf
    best = None

    nn = 1
    while nn <= max_cols:
        n = float(nn)
        m = math.ceil(target_n / (n * l))
        x_one = math.sqrt(k) * b
        c_one = math.sqrt(k) * min(b, 2.0 ** (120 / k)) / 2
        ecd_std = 2 / (b - 1) * (b + 1) * ETA
        ecd_blind_std = 2 * x_one / (b - 1) * (b + 1) * ETA
        mask_std = 2 * c_one / (b - 1) * (b + 1) * ETA
        mask_blind_std = 2 * c_one * x_one / (b - 1) * (b + 1) * ETA
        mlwe_std = 2 * math.sqrt(2) * ETA
        mask_mlwe_std = 2 * c_one * math.sqrt(2) * ETA
        fij_inf = TAIL_CUT * (b + 1) * ecd_std
        f0j_inf = TAIL_CUT * (b + 1) * math.sqrt(m + 1) * ecd_blind_std
        fin_inf = TAIL_CUT * (b + 1) * math.sqrt(n + 1) * mask_std
        f0n_inf = TAIL_CUT * (b + 1) * math.sqrt((m + 1) * n + 1) * mask_blind_std
        res_ecdi_inf = math.sqrt(n) * c_one * fij_inf + fin_inf
        res_ecd0_inf = math.sqrt(n) * c_one * f0j_inf + f0n_inf
        pr_inf = math.sqrt(m) * x_one * fij_inf + f0j_inf
        if t > 1:
            res_ecdi_inf *= math.sqrt(t) * c_one
            res_ecd0_inf *= math.sqrt(t) * c_one
            pr_inf *= math.sqrt(t) * c_one
        res_ecd_two = math.sqrt(d * (m * res_ecdi_inf ** 2 + res_ecd0_inf ** 2))
        mlwe_inf = TAIL_CUT * mlwe_std
        mask_mlwe_inf = TAIL_CUT * math.sqrt(n + 1) * mask_mlwe_std
        res_mlwe_inf = math.sqrt(n) * c_one * mlwe_inf + mask_mlwe_inf
        if t > 1:
            res_mlwe_inf *= math.sqrt(t) * c_one

        q = in_msis_rank = in_cutoff_two = 0.0
        d_ext_one = 0.0
        mu = 1
        while True:
            res_mlwe_two = math.sqrt(d * (mu + nu)) * res_mlwe_inf
            res_two = math.sqrt(res_ecd_two ** 2 + res_mlwe_two ** 2)
            in_cutoff_two = res_two
            if t == 1:
                ext_beta = 2 * (res_two + in_cutoff_two)
                c_ext_one = 2 * c_one
                d_ext_one = 1.0
            else:
                ext_beta = 2 * (2 * c_one) * (res_two + in_cutoff_two)
                c_ext_one = (2 * c_one) * (2 * c_one)
                d_ext_one = 2 * c_one
            in_msis_beta = 2 * d_ext_one * c_ext_one * ext_beta
            log_q = math.ceil(math.log2(in_msis_beta))
            q_limbs = int(math.ceil(log_q / 60.0))       # <- reference grain
            q_bits = int(math.ceil(log_q / q_limbs))
            q = 2.0 ** (q_bits * q_limbs)
            if math.log2(q) > MAX_LOG_Q:
                mu += 1
                continue
            if find_msis_rank(d, q, in_msis_beta) == mu:
                in_msis_rank = float(mu)
                break
            mu += 1

        in_cutoff_inf = in_cutoff_two / ((1 + math.sqrt(n) * c_one)
                                         * math.sqrt(in_msis_rank * d))
        if t > 1:
            in_cutoff_inf /= math.sqrt(t) * c_one
        in_dcmp_inf = q / in_cutoff_inf
        if t > 1:
            in_dcmp_inf *= math.sqrt(t) * c_one
        in_dcmp_two = math.sqrt((n + 1) * in_msis_rank * d) * in_dcmp_inf
        out_cutoff_two = in_dcmp_two
        out_msis_beta = 2 * d_ext_one * (2 * (in_dcmp_two + out_cutoff_two))
        log_qq = math.ceil(math.log2(out_msis_beta))
        qq_limbs = int(math.ceil(log_qq / 60.0))         # <- reference grain
        qq_bits = int(math.ceil(log_qq / qq_limbs))
        qq = 2.0 ** (qq_bits * qq_limbs)
        if math.log2(qq) > MAX_LOG_Q:
            nn <<= 1
            continue
        out_msis_rank = float(find_msis_rank(d, qq, out_msis_beta))
        out_cutoff_inf = out_cutoff_two / math.sqrt(out_msis_rank * d)
        if t > 1:
            out_cutoff_inf /= math.sqrt(t) * c_one

        com_size = t * out_msis_rank * d * math.log2(qq / out_cutoff_inf)
        pf_size = (n * d * math.log2(pr_inf)
                   + d * math.log2(q)
                   + m * d * math.log2(res_ecdi_inf)
                   + d * math.log2(res_ecd0_inf)
                   + (in_msis_rank + nu) * d * math.log2(res_mlwe_inf)
                   + ((n + 1) * in_msis_rank * d) * math.log2(in_dcmp_inf))
        if com_size + pf_size < min_size:
            min_size = com_size + pf_size
            best = (com_size, pf_size, math.log2(q), math.log2(qq))
        nn <<= 1
    return best


@pytest.mark.parametrize("name", sorted(REFERENCE_FIELDS))
@pytest.mark.parametrize("target_n,batch", [(1 << 10, 1), (1 << 14, 4)])
def test_sizes_match_reference_60bit_grain(name, target_n, batch):
    spec = REFERENCE_FIELDS[name]
    params = jindo.new_parameters(spec, target_n, batch)  # 30-bit chains
    com, pf, log_q, log_qq = _reference_sizes(spec, target_n, batch)
    # analytic sizes are grain-independent: bit-identical floats
    assert params.com_size == com
    assert params.pf_size == pf

    # the materialized 30-bit chains still cover the 60-grain budgets
    for ring, budget in ((params.ring_q, log_q), (params.ring_q_out, log_qq)):
        log_real = sum(math.log2(p) for p in ring.primes)
        assert log_real >= budget - 1e-9, (name, log_real, budget)
        assert ring.L == math.ceil(budget / 30)
        # documented delta: 2x the reference's plane count, <= 1 extra bit
        # of modulus per plane
        assert ring.L <= 2 * math.ceil(budget / 60)
        assert log_real <= budget + ring.L


@pytest.mark.parametrize("name", sorted(REFERENCE_FIELDS))
def test_parameters_size_getter(name):
    spec = REFERENCE_FIELDS[name]
    params = jindo.new_parameters(spec, 1 << 10, 1)
    assert params.size() == params.com_size + params.pf_size
    assert params.size() > 0
