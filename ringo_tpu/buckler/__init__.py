from .witness import Witness, PublicWitness, Circuit  # noqa: F401
from .constraint import ArithmeticConstraint  # noqa: F401
from .context import Context  # noqa: F401
from .linear import (  # noqa: F401
    LinearChecker, NTTChecker, AutChecker, ProjChecker, ProjRecomposeChecker,
)
from .compile import compile_circuit  # noqa: F401
from .entities import Proof  # noqa: F401
from .encoder import Encoder  # noqa: F401
from .prover import Prover  # noqa: F401
from .verifier import Verifier  # noqa: F401
