from psvo_tpu.utils.metrics import MetricsWriter
from psvo_tpu.utils.results import ResultsDir

__all__ = ["MetricsWriter", "ResultsDir"]
