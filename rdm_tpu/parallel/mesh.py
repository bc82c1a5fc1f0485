"""Device mesh + sharding specs: the TPU-native replacement for the
reference's DDP/NCCL layer (``run_train.py:30-49,79``; SURVEY.md 2.8).

The workload is data-parallel only (a ~6 M-param score net; TP/PP/SP are
out of scope by design, matching the reference).  Parameters are
replicated; batches are sharded on the leading axis over a 1-D
``Mesh(('data',))`` laid out over ICI.  Gradient all-reduce is inserted by
the SPMD partitioner — there is no hand-written collective layer, exactly
as NCCL all-reduce was implicit in DDP.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
and feed per-host shards (``shard_host_batch``); the data pipeline already
yields per-process shards (``rdm_tpu.data.datasets``).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_host_batch(mesh: Mesh, arrays):
    """Assemble a global batch from this host's local shard (multi-host) or
    place a full batch onto the mesh (single-host)."""
    from jax.experimental import multihost_utils
    if jax.process_count() > 1:
        return multihost_utils.host_local_array_to_global_array(
            arrays, mesh, P("data"))
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), arrays)


def jit_train_step(step_fn, mesh: Mesh, donate: bool | None = None):
    """jit the train step with params/opt/ema replicated and the batch
    sharded on the data axis.  XLA inserts the gradient all-reduce over ICI.

    ``donate``: donate the TrainState buffers (halves peak parameter memory
    on TPU).  Default OFF: on the CPU backend donation + in-process
    collectives deadlocks the thunk runtime's rendezvous, and on the
    tunnelled PJRT plugin (which reports itself as "tpu") donated
    executions fail with InvalidArgument (both reproduced on jax 0.9;
    non-donated programs run fine).  Opt in explicitly on deployments with
    directly-attached chips — for this ~25 MB model the memory saving is
    negligible anyway.
    """
    if donate is None:
        donate = False
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def jit_train_step_on_device(step_fn, mesh: Mesh, with_idx: bool = False):
    """jit the on-device-dataset train step: dataset arrays replicated.
    With ``with_idx`` the per-step INDEX vector is an argument sharded on
    the data axis (SPMD propagation then shards the gathered minibatch);
    without it the step draws indices on-device from the key and only the
    key crosses the host boundary."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    if with_idx:
        return jax.jit(step_fn, in_shardings=(repl, repl, repl, data, repl),
                       out_shardings=(repl, repl))
    return jax.jit(step_fn, in_shardings=(repl, repl, repl, repl),
                   out_shardings=(repl, repl))


def jit_eval_step(eval_fn, mesh: Mesh):
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(repl, data, data, repl),
                   out_shardings=repl)
