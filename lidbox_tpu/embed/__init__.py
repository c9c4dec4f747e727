"""
Embedding back-end: self-contained PLDA + sklearn pipeline
(reference subsystem: lidbox/embed/; SURVEY.md §2.7).
"""
from .plda import PLDA  # noqa: F401
