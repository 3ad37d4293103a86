from r3d_tpu.utils.metrics import MetricsLogger, Timer
from r3d_tpu.utils.profiling import profile_trace
