from .params import Parameters, new_parameters, find_msis_rank  # noqa: F401
from .entities import CommitKey, Commitment, Opening, Proof  # noqa: F401
from .encoder import Encoder  # noqa: F401
from .prover import Prover, sample_field_digits  # noqa: F401
from .verifier import Verifier  # noqa: F401
from .challenge import encode_challenge, left_vec, right_vec  # noqa: F401
