"""
lidbox_tpu — a TPU-native spoken language identification framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of lidbox
(reference: /root/reference/lidbox/__init__.py), designed TPU-first:

- DSP feature extraction as fused XLA/Pallas programs over batched, padded
  waveforms (``lidbox_tpu.features``),
- a host-side streaming data pipeline with the same step registry contract
  as the reference tf.data pipeline (``lidbox_tpu.data``),
- Flax model zoo with the ``create(input_shape, num_outputs)`` /
  ``as_embedding_extractor`` contract (``lidbox_tpu.models``),
- pure-JAX angular proximity loss and streaming C_avg metric whose state is
  a pytree of counters reducible with ``jax.lax.psum`` (``losses``, ``metrics``),
- an optax/pjit training loop with Orbax checkpoints (``lidbox_tpu.train``),
- sklearn/PLDA embedding back-end (``lidbox_tpu.embed``).

Environment variables (parity with reference lidbox/__init__.py:11-13):
- ``LIDBOX_RANDOM_SEED``: global RNG seed (default 42).
- ``LIDBOX_DEBUG``: enable debug mode (verbose logging, deterministic host
  pipeline, disabled autotuning).
"""
import logging
import os
import sys

__version__ = "0.1.0"

RANDOM_SEED = int(os.environ.get("LIDBOX_RANDOM_SEED", 42))
DEBUG = bool(os.environ.get("LIDBOX_DEBUG", False))


class _MaxLevelFilter(logging.Filter):
    """Pass only records at or below a maximum level (INFO -> stdout)."""

    def __init__(self, max_level):
        super().__init__()
        self.max_level = max_level

    def filter(self, record):
        return record.levelno <= self.max_level


def _configure_logging(level):
    """INFO and below to stdout, WARNING and above to stderr.

    Mirrors the split-stream root logger of the reference
    (lidbox/__init__.py:20-35).
    """
    logger = logging.getLogger("lidbox_tpu")
    logger.handlers.clear()
    fmt = logging.Formatter(
        fmt="%(asctime)s.%(msecs)03d %(name)s %(levelname)s: %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")
    out = logging.StreamHandler(sys.stdout)
    out.setLevel(logging.DEBUG)
    out.addFilter(_MaxLevelFilter(logging.INFO))
    out.setFormatter(fmt)
    err = logging.StreamHandler(sys.stderr)
    err.setLevel(logging.WARNING)
    err.setFormatter(fmt)
    logger.addHandler(out)
    logger.addHandler(err)
    logger.setLevel(level)
    return logger


_logger = _configure_logging(logging.DEBUG if DEBUG else logging.INFO)


def get_logger(name=None):
    return _logger if name is None else _logger.getChild(name)


def reset_global_loglevel(level):
    """Set the loglevel of every lidbox_tpu handler and logger."""
    if isinstance(level, str):
        level = getattr(logging, level.upper())
    _logger.setLevel(level)


def get_package_root():
    return os.path.dirname(os.path.abspath(__file__))


def iter_metadata_file(path, num_columns):
    """Iterate rows of a space-separated metadata file, yielding tuples of
    the first ``num_columns`` columns (reference lidbox/__init__.py:41-46)."""
    with open(path, encoding="utf-8") as f:
        for line in f:
            cols = line.strip().split(" ", num_columns - 1)
            if len(cols) == num_columns:
                yield tuple(cols)
