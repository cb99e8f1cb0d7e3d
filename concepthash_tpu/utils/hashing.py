"""API-parity shim for the reference's missing ``utils.hashing`` module
(SURVEY.md §2.9): re-exports the TPU-native implementations under the names
the reference call sites use."""

from concepthash_tpu.ops.hamming import get_hamm_dist  # noqa: F401
from concepthash_tpu.ops.retrieval import (  # noqa: F401
    calculate_mAP,
    calculate_pr_curve,
    get_sim,
    log_trick,
)
