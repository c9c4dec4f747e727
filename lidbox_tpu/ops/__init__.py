"""
TPU kernels: fused Pallas implementations of the hot DSP ops
(SURVEY.md §7 phase 1 perf deliverable).
"""
from .logmel import (  # noqa: F401
    fused_logmel,
    fused_logmel_packed,
    fused_logmel_pipelined,
    logmel_conv,
    logmel_reference,
)
