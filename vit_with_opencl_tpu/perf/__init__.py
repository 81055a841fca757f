from .kernel_trace import (  # noqa: F401
    KernelSpan,
    device_kernel_table,
    format_kernel_table,
)
from .profiler import (  # noqa: F401
    OpProfile,
    format_profile,
    profile_ops,
    throughput_report,
    trace,
)
