"""ringo_tpu — a TPU-native lattice zero-knowledge library.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
Ringo-SNARK (github.com/sp301415/ringo-snark):

* ``ringo_tpu.jindo``   — the Jindo lattice polynomial commitment scheme
  (transparent setup, post-quantum, polynomials over very large prime fields
  of the special shape p = b^k + 1).
* ``ringo_tpu.buckler`` — the Buckler zero-knowledge PIOP toolkit over
  power-of-two cyclotomic rings (arithmetic / NTT / automorphism / arbitrary
  linear / exact & approximate inf-norm / squared two-norm / sumcheck
  constraints, strong Fiat-Shamir, automatic parameter selection).

Architecture (TPU-first, not a port):

* All exact modular arithmetic — both the 110..880-bit witness fields and the
  word-size RNS commitment rings — runs through one generic fixed-limb engine
  (``ringo_tpu.fields.limb``): values are planes of 16-bit digits stored in
  uint32 lanes, multiplied with Montgomery CIOS, vectorized over the
  coefficient axis.  This replaces the reference's per-modulus generated
  Go+assembly packages (reference: jindo/internal/zp, jindo-modulus/main.go).
* NTTs are stage-vectorized butterflies over digit planes
  (``ringo_tpu.ops.ntt``), replacing reference math/bigpoly/ntt.go and
  lattigo's uint64 ring NTT.
* The protocol layers operate on whole tensors (all matrix columns/rows of a
  Jindo commitment at once) so that each Fiat-Shamir round is a handful of
  large jitted device programs.
* Multi-chip scaling uses jax.sharding.Mesh + shard_map
  (``ringo_tpu.parallel``): commitment batch/columns shard across devices,
  RNS planes stay local, reductions ride psum over ICI.
"""

__version__ = "0.1.0"

from . import backend  # noqa: F401  (enables x64 before any jax tracing)
from . import fields, ops, rings, csprng, utils  # noqa: F401
