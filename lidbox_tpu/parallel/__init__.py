"""
Device mesh and sharding helpers: the SPMD layer of the framework.

The reference had no distributed support at all — device placement was a
per-step ``tf.device("/GPU")`` string (reference: lidbox/data/steps.py:
115-122; SURVEY.md §2.8). The TPU-native replacement is single-program
data parallelism over a ``jax.sharding.Mesh``: batches are sharded over the
``data`` axis (ICI collectives inserted by XLA), parameters and metric
state are replicated, gradients and C_avg counters all-reduce with psum.
Multi-host slices extend the same program via ``jax.distributed``.

No parameter sharding is warranted for this model family (the largest model
is the x-vector at ~4-6M params, SURVEY.md §5), but ``mesh_sharding`` takes
arbitrary PartitionSpecs so tensor-sharded layouts remain expressible.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Multi-host initialization over DCN (jax.distributed).

    Arguments default to the standard launcher env vars
    ``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` / ``PROCESS_ID``; with no
    coordinator configured this is a safe no-op for single-process runs.
    Returns True when a distributed runtime was initialized.

    After initialization, ``jax.devices()`` spans every host's chips: build
    the mesh over all of them (get_mesh), keep params replicated, and feed
    each process's local slice of the global batch through
    ``global_batch_from_local`` — the same pjit program then runs on every
    host with gradient all-reduce over ICI+DCN. Tested with 2 CPU processes
    in tests/test_multihost.py.
    """
    import os
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def global_batch_from_local(local_batch, mesh, axis_name=DATA_AXIS):
    """Assemble a globally batch-sharded jax.Array from each process's
    LOCAL slice (multi-host data loading): every host decodes and feeds
    only its own shard of the global batch; the returned arrays have global
    shape [num_processes * local_batch, ...] sharded over the mesh without
    any cross-host data movement."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_batch)


def mesh_spans_processes(mesh):
    """True when ``mesh`` contains devices of MORE THAN ONE process — the
    condition under which jitted steps over it are cross-host collectives
    (and feeds must use process-local assembly + the feed-parity guard).
    A process-local mesh inside a multi-process job (each host training
    its own replica) does NOT span processes: its steps are purely local,
    and treating its feed as collective would deadlock or spuriously
    raise. Gate on THIS, never on bare ``jax.process_count()``."""
    if mesh is None:
        return False
    return len({d.process_index for d in mesh.devices.flat}) > 1


def put_replicated(tree, mesh):
    """Replicate a host pytree onto every device of ``mesh``, including
    meshes spanning MULTIPLE PROCESSES (where plain device_put cannot
    address remote devices): each process contributes its identical local
    copy via make_array_from_process_local_data. Callers must pass the
    same values on every process (standard SPMD discipline)."""
    sharding = replicated(mesh)
    if not mesh_spans_processes(mesh):
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def get_mesh(num_devices=None, devices=None, axis_name=DATA_AXIS):
    """1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


MODEL_AXIS = "model"


def get_mesh_2d(data_size=None, model_size=1, devices=None):
    """2-D (data, model) mesh for combined data + tensor parallelism.

    Batches shard over ``data``; parameters tagged by a sharding rule
    (column_parallel_rule) shard over ``model`` with XLA GSPMD inserting
    the collectives. The reference had neither (SURVEY.md §2.8); for this
    model family TP is optional capability, not a memory necessity."""
    if devices is None:
        devices = jax.devices()
    if data_size is None:
        data_size = len(devices) // model_size
    devices = np.asarray(devices[:data_size * model_size]).reshape(
        data_size, model_size)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def column_parallel_rule(mesh, min_last_dim=64):
    """(path, leaf) -> NamedSharding: shard the last (output-feature) axis
    of rank>=2 kernels over the ``model`` axis — column-parallel Dense /
    Conv; everything else (biases, scales, scalars) replicated.

    Only kernels whose last dim divides the model-axis size and is at
    least ``min_last_dim`` are sharded (tiny heads stay replicated)."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        MODEL_AXIS, 1)

    def rule(path, leaf):
        shape = getattr(leaf, "shape", ())
        if (model_size > 1 and len(shape) >= 2
                and shape[-1] % model_size == 0
                and shape[-1] >= min_last_dim):
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, PartitionSpec(*spec))
        return NamedSharding(mesh, PartitionSpec())
    return rule


def shard_params(params, mesh, rule=None):
    """device_put a parameter pytree with a per-leaf sharding rule
    (defaults to column_parallel_rule over ``mesh``)."""
    if rule is None:
        rule = column_parallel_rule(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, rule(path, leaf)), params)


def batch_sharding(mesh, axis_name=DATA_AXIS):
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def stacked_batch_sharding(mesh, axis_name=DATA_AXIS):
    """Sharding for a [K, B, ...] STACK of batches (grouped dispatch /
    cached replay): the scan axis K is replicated, the batch axis shards
    over the mesh — lax.scan then slices per-step batches without any
    resharding collective."""
    return NamedSharding(mesh, PartitionSpec(None, axis_name))


def stack_on_mesh(trees, mesh, concat=False, max_arity=32):
    """Stack a list of identically-structured mesh-sharded pytrees into
    ONE stacked pytree whose new leading (scan) axis is replicated and
    every existing axis keeps its sharding — the device-side
    consolidation for whole-epoch scan replay (Trainer._consolidate_cache,
    on_device._consolidate_signal_cache). ``concat=True`` concatenates
    along the EXISTING leading axis instead (already-stacked grouped
    entries), preserving each leaf's spec unchanged.

    Runs as jitted programs with explicit out_shardings: process-spanning
    meshes hold non-fully-addressable global arrays that eager jnp.stack
    rejects, and the explicit specs keep the stack where the scanned
    replay wants it (no resharding inside the scan). Long epochs fold in
    ``max_arity``-bounded chunks: one program taking every cached batch
    as a separate parameter would grow XLA compile time with corpus
    length (and each distinct batch count would be a fresh compile).
    HBM transient: inputs + chunk stacks + output peak at ~2-3x the
    cached corpus during consolidation — callers release the per-batch
    entries right after (Trainer.fit does), and the cache_staged HBM
    guard budgets for it."""
    import jax.numpy as jnp
    if len(trees) > max_arity:
        chunks = [stack_on_mesh(trees[i:i + max_arity], mesh, concat=concat)
                  for i in range(0, len(trees), max_arity)]
        return stack_on_mesh(chunks, mesh, concat=True,
                             max_arity=max_arity)
    first = trees[0]

    def out_sharding(leaf):
        spec = getattr(leaf.sharding, "spec", PartitionSpec())
        if not concat:
            spec = PartitionSpec(None, *spec)
        return NamedSharding(mesh, spec)

    shardings = jax.tree_util.tree_map(out_sharding, first)
    op = ((lambda *ls: jnp.concatenate(ls, axis=0)) if concat
          else (lambda *ls: jnp.stack(ls)))
    fn = jax.jit(lambda *ts: jax.tree_util.tree_map(op, *ts),
                 out_shardings=shardings)
    return fn(*trees)


def replicated(mesh):
    return NamedSharding(mesh, PartitionSpec())


def mesh_sharding(mesh, *axes):
    return NamedSharding(mesh, PartitionSpec(*axes))


def shard_batch(batch, mesh, axis_name=DATA_AXIS):
    """Place a pytree of host arrays onto the mesh with the batch axis
    sharded. Leading dims must divide the mesh size (use pad_batch_to
    first)."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def pad_batch_to(batch, batch_size):
    """Right-pad every array's leading axis to ``batch_size``; returns
    (padded_batch, valid_mask [batch_size])."""
    def _pad(x):
        x = np.asarray(x)
        n = x.shape[0]
        if n == batch_size:
            return x
        widths = [(0, batch_size - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths)
    n_valid = next(iter(jax.tree_util.tree_leaves(batch))).shape[0]
    mask = np.arange(batch_size) < n_valid
    return jax.tree_util.tree_map(_pad, batch), mask
