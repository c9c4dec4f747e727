"""
Checkpointing with the reference's best-by-metric filename semantics.

The reference stored Keras weights as
``epoch{epoch:06d}__val_loss{val_loss:.12f}.hdf5`` and selected/resumed by
parsing metric values back out of filenames
(reference: lidbox/models/keras_utils.py:41-42, 58, 102-118, 187-203).
Here checkpoints are msgpack-serialized pytrees (params, batch_stats,
optimizer state) via flax.serialization with the same name scheme and
``.ckpt`` suffix, so best-checkpoint selection and ``initial_epoch`` resume
behave identically. Writes go through a temp file + rename so a crashed run
never leaves a torn checkpoint (failure-recovery analogue, SURVEY.md §5).
"""
import os
import tempfile

import jax
import numpy as np
from flax import serialization

from lidbox_tpu import get_logger

logger = get_logger("train.checkpoint")

CHECKPOINT_SUFFIX = ".ckpt"
DEFAULT_FORMAT = "epoch{epoch:06d}__val_loss{val_loss:.12f}" + CHECKPOINT_SUFFIX


def parse_checkpoint_value(path, key):
    """Parse the value following ``key`` from a checkpoint filename
    (reference: keras_utils.py:41-42)."""
    return (os.path.basename(path).split(key)[-1]
            .split("__")[0].split(CHECKPOINT_SUFFIX)[0])


def get_best_checkpoint_path(checkpoints_dir, key=None, mode=None):
    """Best checkpoint by parsed filename value: greatest epoch when key is
    "epoch"/None, else min/max of the monitored metric
    (reference: keras_utils.py:102-118). Selects over BOTH msgpack
    ``.ckpt`` files and Orbax checkpoint directories (``epoch...`` dirs),
    so configs can switch checkpoint backends without touching the
    best-checkpoint resolution."""
    if key is None:
        key = "epoch"
    if not os.path.isdir(checkpoints_dir):
        return None
    ckpts = [p.path for p in os.scandir(checkpoints_dir)
             if (p.is_file() and p.name.endswith(CHECKPOINT_SUFFIX))
             or (p.is_dir() and p.name.startswith("epoch")
                 # skip uncommitted async-orbax writes from a killed run
                 and ".orbax-checkpoint-tmp" not in p.name)]
    if not ckpts:
        return None
    if key == "epoch":
        return max(ckpts, key=lambda p: int(parse_checkpoint_value(p, key)))
    if mode not in ("min", "max"):
        raise ValueError(f"mode must be min or max, got {mode}")
    # NaN metric values (diverged epochs write val_lossnan filenames) must
    # never win: min()/max() comparisons against NaN are order-dependent,
    # so a NaN entry scanned first would be returned as "best" and serving
    # would silently load diverged weights
    finite = [p for p in ckpts
              if np.isfinite(float(parse_checkpoint_value(p, key)))]
    if not finite:
        logger.warning("all %d checkpoints in %s have non-finite %r; "
                       "falling back to the greatest epoch",
                       len(ckpts), checkpoints_dir, key)
        return max(ckpts,
                   key=lambda p: int(parse_checkpoint_value(p, "epoch")))
    pick = min if mode == "min" else max
    return pick(finite, key=lambda p: float(parse_checkpoint_value(p, key)))


def save_checkpoint(checkpoints_dir, state, epoch, val_loss=0.0,
                    fmt=DEFAULT_FORMAT):
    """Serialize a pytree state atomically; returns the checkpoint path."""
    os.makedirs(checkpoints_dir, exist_ok=True)
    path = os.path.join(checkpoints_dir,
                        fmt.format(epoch=epoch, val_loss=float(val_loss)))
    state = jax.device_get(state)
    data = serialization.to_bytes(state)
    fd, tmp = tempfile.mkstemp(dir=checkpoints_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    logger.info("Saved checkpoint %s (%d bytes)", path, len(data))
    return path


def restore_checkpoint(path, target):
    """Restore a pytree state into the structure of ``target``. Dispatches
    on the checkpoint kind: msgpack ``.ckpt`` files (save_checkpoint) or
    Orbax checkpoint directories (OrbaxCheckpointer.save)."""
    if os.path.isdir(path):
        return OrbaxCheckpointer(use_async=False).restore(path, target)
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


class OrbaxCheckpointer:
    """Orbax-backed checkpoint backend with the same best-by-metric
    directory naming semantics (SURVEY.md §5: "TPU equivalent: Orbax
    checkpointing with the same best-checkpoint semantics").

    Each checkpoint is an Orbax PyTree directory named
    ``epoch{epoch:06d}__val_loss{val_loss:.12f}``; saves can be
    asynchronous so training never blocks on HBM->disk transfer.
    """

    def __init__(self, use_async=True):
        import orbax.checkpoint as ocp
        handler = ocp.StandardCheckpointHandler()
        self._ckpt = (ocp.AsyncCheckpointer(handler) if use_async
                      else ocp.Checkpointer(handler))

    def save(self, checkpoints_dir, state, epoch, val_loss=0.0):
        name = DEFAULT_FORMAT.format(epoch=epoch, val_loss=float(val_loss))
        name = name[:-len(CHECKPOINT_SUFFIX)]  # orbax uses a directory
        path = os.path.abspath(os.path.join(checkpoints_dir, name))
        os.makedirs(checkpoints_dir, exist_ok=True)
        self._ckpt.save(path, state, force=True)
        return path

    def restore(self, path, target=None):
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        if target is None:  # raw nested-dict restore (no structure given)
            return self._ckpt.restore(path)
        return self._ckpt.restore(path, args=ocp.args.StandardRestore(target))

    def wait(self):
        if hasattr(self._ckpt, "wait_until_finished"):
            self._ckpt.wait_until_finished()

    @staticmethod
    def best_checkpoint_path(checkpoints_dir, key=None, mode=None):
        """Same filename-parsing selection as get_best_checkpoint_path, over
        orbax checkpoint directories."""
        if key is None:
            key = "epoch"
        if not os.path.isdir(checkpoints_dir):
            return None
        dirs = [p.path for p in os.scandir(checkpoints_dir)
                if p.is_dir() and p.name.startswith("epoch")
                and ".orbax-checkpoint-tmp" not in p.name]
        if not dirs:
            return None
        if key == "epoch":
            return max(dirs, key=lambda p: int(parse_checkpoint_value(p, key)))
        assert mode in ("min", "max"), mode
        pick = min if mode == "min" else max
        return pick(dirs, key=lambda p: float(parse_checkpoint_value(p, key)))


def load_raw_checkpoint(path):
    """Restore a checkpoint as a raw nested dict (no target structure
    needed) — used to pull params/batch_stats out of a full TrainState
    checkpoint without reconstructing the optimizer state. Handles both
    msgpack files and Orbax directories."""
    if os.path.isdir(path):
        restored = OrbaxCheckpointer(use_async=False).restore(path)
        return jax.device_get(restored)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def initial_epoch_from_path(path):
    """Epoch to resume from, parsed out of the checkpoint name
    (reference: keras_utils.py:187-189)."""
    return int(parse_checkpoint_value(path, "epoch"))
