"""Device mesh + sharding helpers (SPMD data parallelism over ICI).

The reference is single-device (SURVEY.md §2c: no distributed code exists);
this layer is the TPU-native scale-out design: a 1-D `data` mesh axis, batches
sharded over it with NamedSharding, parameters replicated, and gradient
all-reduce left to XLA (it rides ICI within a slice, DCN across slices via
jax.distributed). The 6.5M-param model replicates trivially; spatial (H-axis)
sharding of single huge frames lives in parallel/spatial.py.

Works identically on real TPU slices and on the fake multi-device CPU platform
used by tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n (default: all) addressable devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch onto the mesh, split along the leading axis.

    Single-process: `batch` is the global batch, device_put splits it.
    Multi-process (jax.distributed): `batch` is this process's LOCAL shard of
    the global batch; the global array is assembled across hosts.

    The global batch size must be divisible by the mesh size (the trainer pads
    or drops remainders before calling this).
    """
    sharding = shard_batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (repeating the last sample);
    returns (padded, original_count) so metrics can mask the padding."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n
