"""Device mesh construction and distributed initialization.

The reference has no distributed layer (single GPU pinned at `train.py:84-85`); this is
the greenfield TPU-native scaling layer (SURVEY.md §2.2): a ('data', 'model') mesh where
data-parallel gradient all-reduce rides ICI (and DCN across slices) and the optional
'model' axis tensor-shards attention heads / FFN hidden dims.
"""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


_distributed_initialized = False


def init_distributed() -> bool:
    """Join the JAX distributed runtime when multi-host env vars are present.

    `jax.distributed.initialize()` must run BEFORE any backend-touching call
    (`jax.devices()`, `jax.process_count()`, any dispatch), so the guard here is
    purely environmental — it must never query the backend to decide:

      * `JAX_COORDINATOR_ADDRESS` set -> manual bring-up; `JAX_NUM_PROCESSES` and
        `JAX_PROCESS_ID` (when set) are passed through explicitly. This is the
        path a pod launcher exporting per-worker env vars uses, and the path
        tests/test_multihost.py::test_cli_bringup_two_processes drives end-to-end
        through the training CLI.
      * `MATCHA_DISTRIBUTED=1` -> defer entirely to JAX's own cluster
        auto-detection (TPU pod metadata, SLURM, ...).

    Idempotent within a process; no-op single host. Returns True iff this call
    performed the initialization.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return False
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not (addr or os.environ.get("MATCHA_DISTRIBUTED")):
        return False
    if os.environ.get("JAX_PLATFORMS"):
        # The axon TPU plugin swallows the JAX_PLATFORMS env var, and with it set
        # (but not config-applied) the distributed join silently degrades to a
        # single-process runtime. Re-apply via jax.config — only possible before
        # backend init, which is exactly when this function runs.
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    kwargs = {}
    if addr:
        kwargs["coordinator_address"] = addr
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return True


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_spec(stacked_steps: bool = False) -> P:
    """Batch arrays shard along the data axis.

    `stacked_steps`: the array is a (K, B, ...) superbatch of K per-step batches
    (train.trainer steps-per-dispatch scan) — the step dim stays replicated and the
    batch dim (axis 1) shards over 'data'.
    """
    return P(None, DATA_AXIS) if stacked_steps else P(DATA_AXIS)


def batch_sharding(mesh: Mesh, stacked_steps: bool = False) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(stacked_steps))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def current_mesh() -> Optional[Mesh]:
    """The physical mesh from the ambient `with mesh:` context, or None.

    Model code that supports optional mesh-axis parallelism (e.g. the decoder's
    ring attention over a 'seq' axis) resolves the mesh from context — the same
    context bare-PartitionSpec `with_sharding_constraint` calls already require —
    instead of threading a Mesh through every module signature.
    """
    try:
        from jax._src.mesh import thread_resources  # no public accessor yet

        m = thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def put_global_batch(mesh: Mesh, batch: dict, stacked_steps: bool = False) -> dict:
    """Place a per-host batch shard onto the mesh as a batch-sharded global array.

    Single-process: a plain `device_put` (the local batch IS the global batch).
    Multi-process: each host holds only its `[process_index::process_count]` slice of
    the global batch (matcha_tpu.data.dataset.batch_iterator's contract), so the
    global array is assembled from per-process shards with
    `jax.make_array_from_process_local_data` — the global batch dimension becomes
    `local_batch * process_count`, sharded over the mesh's 'data' axis.

    `stacked_steps`: leaves are (K, B, ...) superbatches (K per-step batches stacked
    for a steps-per-dispatch scan); the batch dim is axis 1.
    """
    shard = batch_sharding(mesh, stacked_steps)
    if jax.process_count() == 1:
        return jax.device_put(batch, shard)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(shard, np.asarray(a)), batch
    )
