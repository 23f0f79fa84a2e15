"""Device-mesh data parallelism — the TPU-native replacement for the
reference's nn.DataParallel (sr_run_manager.py:197-198) and Horovod
(distributed_run_manager.py:72-75, SURVEY.md §2.8).

Design (the scaling-book recipe): one mesh axis 'data'; the batch is sharded
over it, parameters/optimizer state are replicated. The train step is written
with *global-batch semantics* under jit — gradients are means over the global
batch, so XLA inserts the psum over ICI itself; there is no hand-written
collective. This subsumes:

- Horovod allreduce           -> XLA all-reduce from the sharded-mean grad
- hvd.broadcast_parameters    -> replicated param sharding (single init)
- backward_passes_per_step    -> the K-subnet Python loop accumulates grads
                                 *before* the single update, so the
                                 all-reduce fires once per step
- fp16 gradient compression   -> bf16 compute dtype option
- DistributedMetric allreduce -> metrics are global-batch means under jit
- distributed BN recalib psum -> global batch moments under jit

Multi-host would extend the same mesh over DCN via jax.distributed; the mesh
axis layout keeps the gradient all-reduce on ICI within each slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host initialization (replaces hvd.init, train_ofa_net.py:121).

    Call once per host before creating arrays; afterwards jax.devices()
    spans all hosts and `make_mesh()` builds the global data mesh (gradient
    all-reduce rides ICI within a slice, DCN across slices). No-op when the
    env provides the coordination (TPU pods set it up automatically)."""
    import jax
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            pass  # single-process / already initialized
    else:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    return jax.process_index(), jax.process_count()


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all local devices (or a given list)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Place a host batch (pytree of arrays) sharded over the mesh's batch
    axis. Single-process: the arrays carry the global batch. Multi-process
    (after init_distributed the mesh spans all hosts): each process passes
    its *local* rows and the global batch is their concatenation in process
    order — the hvd/DistributedSampler contract (each rank loads its own
    shard, SURVEY.md §2.8)."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_params(params, mesh):
    """Replicate parameters/optimizer state across the mesh. Multi-process:
    every host must pass the same values (same-seed init or a restored
    checkpoint — the hvd.broadcast_parameters replacement)."""
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            params)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)
