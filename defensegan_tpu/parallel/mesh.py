"""1-D data-parallel mesh over TPU chips.

Defense-GAN's workloads (WGAN training, the RxL projection, attack evals) are
all embarrassingly data-parallel over the batch (and batch x restarts) axis, so
the mesh is a single `data` axis laid out over ICI. Params are replicated;
activations/batches are sharded on their leading axis. Gradient reduction in
training is an XLA-inserted psum over `data` — no hand-written collectives
(reference has none either; it is single-device, SURVEY.md section 2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 1-D (data,) mesh over the first n (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None and n_devices > 0:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dim `axis` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def validate_batch_for_mesh(mesh: Mesh, batch: int,
                            what: str = "batch") -> None:
    """Fail informatively (instead of an opaque XLA/GSPMD error or a
    silently skewed layout) when a leading axis can't shard evenly."""
    n = mesh.devices.size
    if batch % n != 0:
        raise ValueError(
            f"{what}={batch} is not divisible by the {n}-device "
            f"'{DATA_AXIS}' mesh (remainder {batch % n}); pad the batch "
            f"(eval/accuracy.py pads+masks this way) or choose a multiple "
            f"of {n}")


def validate_projection_sharding(mesh: Mesh, batch: int,
                                 rec_rr: int) -> None:
    """Projection sharding contract: shard the IMAGE batch axis, never the
    flattened batch*R axis. Each device must own whole restart groups —
    otherwise the per-image argmin over R at the end of the projection
    gathers restarts across devices (correct under GSPMD but
    collective-heavy, and wrong under shard_map). batch % n_devices == 0
    guarantees group-aligned shards for any R."""
    validate_batch_for_mesh(mesh, batch, what="projection batch")
    # R itself never needs to divide anything: restarts ride along inside
    # each image's shard ([B, R, k] sharded on axis 0).


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of arrays with leading batch axis onto the mesh.

    Scalar (0-d) leaves are replicated, not sharded — they have no batch
    axis to validate."""
    for a in jax.tree.leaves(batch):
        if np.ndim(a) > 0:
            validate_batch_for_mesh(mesh, np.shape(a)[0])
    return jax.tree.map(
        lambda a: jax.device_put(
            a, batch_sharding(mesh, np.ndim(a)) if np.ndim(a) > 0
            else replicated_sharding(mesh)), batch)
