from .profiler import (  # noqa: F401
    OpProfile,
    format_profile,
    profile_ops,
    throughput_report,
    trace,
)
