"""
TPU kernels: fused Pallas implementations of the hot DSP ops
(SURVEY.md §7 phase 1 perf deliverable).
"""
from .logmel import fused_logmel, logmel_conv, logmel_reference  # noqa: F401
