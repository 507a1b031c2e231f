"""Constraint-accumulation context (reference buckler/context.go)."""

from __future__ import annotations

from .constraint import ArithmeticConstraint
from .linear import LinearChecker, ProjChecker, ProjRecomposeChecker
from .utils import decompose_base
from .witness import PublicWitness, Witness


class Context:
    def __init__(self, spec, rank: int, pw_cnt: int, w_cnt: int,
                 strict: bool = False):
        """``strict=False`` (default) reproduces two reference quirks
        bug-for-bug: every arithmetic/sumcheck constraint is scaled by the
        SAME batch constant (buckler/prover.go:355-379 — distinct violated
        constraints can cancel), and sumcheck target sums are stored but
        ignored (context.go:85-94 — only zero-sum constraints verify).
        ``strict=True`` scales constraint i by batchConst^(i+1) and honors
        the declared target sums.  Both sides of a proof must agree on the
        mode (it changes the checked identities, not the transcript)."""
        self.spec = spec
        self.strict = strict
        self.rank = rank
        self.pw_cnt = pw_cnt
        self.w_cnt = w_cnt

        self.w_second: list[Witness] = []

        self.arith_check_max_rank = 0
        self.sum_check_max_rank = 0

        self.arith_constraints: list[ArithmeticConstraint] = []
        self.sum_check_constraints: list[ArithmeticConstraint] = []
        self.sum_check_sums: list[int] = []

        self.lin_checkers: list[LinearChecker] = []
        self.lin_check_constraints: dict[int, list[tuple[int, int]]] = {}

        self.inf_dcmp_bound: dict[int, int] = {}
        self.inf_dcmp_witness: dict[int, list[Witness]] = {}

        self.two_dcmp_bound: dict[int, int] = {}
        self.two_dcmp_base: dict[int, PublicWitness] = {}
        self.two_dcmp_mask: dict[int, PublicWitness] = {}
        self.two_dcmp_witness: dict[int, Witness] = {}

        self.proj_checker: ProjChecker | None = None
        self.proj_witness: dict[int, Witness] = {}
        self.proj_inf_dcmp_bound: dict[int, int] = {}
        self.proj_inf_dcmp_witness: dict[int, Witness] = {}

    # -- internal id allocation ------------------------------------------

    def _new_witness(self) -> Witness:
        w = Witness()
        w.id = self.w_cnt
        self.w_cnt += 1
        return w

    def _new_public_witness(self) -> PublicWitness:
        w = PublicWitness()
        w.id = self.pw_cnt
        self.pw_cnt += 1
        return w

    # -- constraints (reference context.go:79-228) -------------------------

    def add_arithmetic_constraint(self, c: ArithmeticConstraint):
        self.arith_constraints.append(c)
        self.arith_check_max_rank = max(self.arith_check_max_rank,
                                        c.max_rank(self.rank))

    def add_sum_check_constraint(self, c: ArithmeticConstraint, total: int = 0):
        self.sum_check_constraints.append(c)
        self.sum_check_sums.append(total)
        self.sum_check_max_rank = max(self.sum_check_max_rank,
                                      c.max_rank(self.rank))

    def add_linear_constraint(self, w_out: Witness, w_in: Witness,
                              checker: LinearChecker):
        if self.arith_check_max_rank < 2 * self.rank - 1:
            self.arith_check_max_rank = 2 * self.rank - 1
        key = id(checker)
        if key not in self.lin_check_constraints:
            self.lin_checkers.append(checker)
            self.lin_check_constraints[key] = []
        self.lin_check_constraints[key].append((w_out.id, w_in.id))

    def add_inf_norm_constraint(self, w: Witness, bound: int):
        """Exact inf-norm via ternary decomposition witnesses
        (reference context.go:112-161)."""
        if bound < 0:
            return
        if bound == 0:
            c = ArithmeticConstraint()
            c.add_term(1, None, w)
            self.add_arithmetic_constraint(c)
            return
        if bound == 1:
            c = ArithmeticConstraint()
            c.add_term(1, None, w, w, w)
            c.add_term(-1, None, w)
            self.add_arithmetic_constraint(c)
            return

        base = decompose_base(bound)
        w_dcmp = [self._new_witness() for _ in base]
        self.inf_dcmp_witness[w.id] = w_dcmp
        self.inf_dcmp_bound[w.id] = bound

        for wd in w_dcmp:
            tern = ArithmeticConstraint()
            tern.add_term(1, None, wd, wd, wd)
            tern.add_term(-1, None, wd)
            self.add_arithmetic_constraint(tern)

        dc = ArithmeticConstraint()
        dc.add_term(1, None, w)
        for b, wd in zip(base, w_dcmp):
            dc.add_term(-b, None, wd)
        self.add_arithmetic_constraint(dc)

    def add_sq_two_norm_constraint(self, w: Witness, bound: int):
        """Squared two-norm via binary decomposition witness + sumcheck,
        modulo the witness modulus (reference context.go:165-196)."""
        w_dcmp = self._new_witness()
        pw_base = self._new_public_witness()
        pw_mask = self._new_public_witness()

        self.two_dcmp_bound[w.id] = bound
        self.two_dcmp_base[w.id] = pw_base
        self.two_dcmp_mask[w.id] = pw_mask
        self.two_dcmp_witness[w.id] = w_dcmp

        bin_c = ArithmeticConstraint()
        bin_c.add_term(1, None, w_dcmp, w_dcmp)
        bin_c.add_term(-1, pw_mask, w_dcmp)
        self.add_arithmetic_constraint(bin_c)

        dc = ArithmeticConstraint()
        dc.add_term(1, None, w, w)
        dc.add_term(-1, pw_base, w_dcmp)
        self.add_sum_check_constraint(dc, 0)

    def add_approx_inf_norm_constraint(self, w: Witness, bound: int):
        """Approximate inf-norm via modular Johnson-Lindenstrauss projection;
        slack ~rank (reference context.go:200-228)."""
        if self.proj_checker is None:
            self.proj_checker = ProjChecker(self.spec, self.rank)

        w_proj = self._new_witness()
        self.add_linear_constraint(w_proj, w, self.proj_checker)
        self.proj_witness[w.id] = w_proj

        w_proj_dcmp = self._new_witness()
        slack_bound = self.rank * bound
        self.proj_inf_dcmp_bound[w_proj.id] = slack_bound
        self.proj_inf_dcmp_witness[w_proj.id] = w_proj_dcmp
        self.add_linear_constraint(
            w_proj, w_proj_dcmp, ProjRecomposeChecker(self.spec, slack_bound))

        self.w_second += [w_proj, w_proj_dcmp]

    # -- bookkeeping (reference context.go:231-270) -------------------------

    def batch(self) -> int:
        batch = self.w_cnt
        if self.arith_constraints:
            batch += 1
        if self.lin_check_constraints:
            batch += 4
        if self.sum_check_constraints:
            batch += 4
        return batch

    def commit_rank(self) -> int:
        rank = 0
        if self.w_cnt > 0:
            rank = self.rank + 1
        for c in self.arith_constraints:
            rank = max(rank, c.max_rank(self.rank) - self.rank)
        if self.lin_check_constraints:
            rank = max(rank, 2 * self.rank)
        for c in self.sum_check_constraints:
            rank = max(rank, c.max_rank(self.rank) + self.rank + 1)
        return rank

    def has_arithmetic_check(self) -> bool:
        return bool(self.arith_constraints)

    def has_linear_check(self) -> bool:
        return bool(self.lin_check_constraints)

    def has_sum_check(self) -> bool:
        return bool(self.sum_check_constraints)
