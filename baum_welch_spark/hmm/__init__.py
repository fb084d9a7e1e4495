from baum_welch_spark.hmm.model import HMM
from baum_welch_spark.hmm.kernel import (
    forward_backward,
    e_step_counts,
    sequential_baum_welch,
)

__all__ = ["HMM", "forward_backward", "e_step_counts", "sequential_baum_welch"]
