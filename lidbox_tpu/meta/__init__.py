"""
Metadata layer: pandas-DataFrame contract with required columns
``path, label, split`` indexed by utterance id
(reference: lidbox/meta/__init__.py, lidbox/meta/utils.py:14-18).
"""
from .utils import (  # noqa: F401
    REQUIRED_COLUMNS,
    generate_label2target,
    random_oversampling,
    random_oversampling_on_split,
    random_undersampling,
    random_undersampling_on_split,
    read_audio_durations,
    set_unique_index,
    verify_integrity,
)
