from wmfml_tpu.obs.metrics import MetricsWriter
from wmfml_tpu.obs.guards import check_finite, NonFiniteLossError
from wmfml_tpu.obs.profile import profile_trace, StepTimer

__all__ = [
    "MetricsWriter",
    "check_finite",
    "NonFiniteLossError",
    "profile_trace",
    "StepTimer",
]
