from fastedit_tpu.metrics import functional  # noqa: F401
from fastedit_tpu.metrics.calculator import MetricsCalculator  # noqa: F401
