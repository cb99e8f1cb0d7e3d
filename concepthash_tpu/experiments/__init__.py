from concepthash_tpu.experiments.hashing import (
    GeneralExperiment,
    RetrievalEvaluation,
    RetrievalExperiment,
)

__all__ = ["RetrievalExperiment", "GeneralExperiment", "RetrievalEvaluation"]
