"""
TPU kernels: the fused Pallas log-mel kernel (SURVEY.md §7 phase 1 perf
deliverable; the low-peak-memory alternative to the default XLA
segment-matmul STFT — see ops/logmel.py's measurement history) plus XLA
oracle formulations.
"""
from .logmel import (  # noqa: F401
    fused_logmel_packed,
    logmel_conv,
    logmel_reference,
)
