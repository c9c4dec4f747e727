"""
Data pipeline: host streaming Dataset + step registry + jit device
featurization (reference subsystem: lidbox/data/; SURVEY.md §2.4).
"""
from .dataset import Dataset, padded_batch  # noqa: F401
from .device_pipeline import DeviceFeatureExtractor  # noqa: F401
from .steps import Step, VALID_STEP_FUNCTIONS, from_steps, pre_initialize  # noqa: F401
