"""Tensor-parallel (model-axis) sharding rules — designed-for, measured
as a non-goal.

SURVEY.md section 2: at Defense-GAN model sizes (< 20 M params) tensor
parallelism buys nothing — the whole generator fits in one core's VMEM
and the batch axis already saturates the chips — but the framework is
to be DESIGNED for it. This module is that design, executable: a 2-D
("data", "model") mesh plus GSPMD parameter-sharding rules for the
generator/critic param trees. Annotate the params, jit as usual, and
XLA's partitioner inserts the all-gathers/reduce-scatters; no model
code changes anywhere (the same flax modules run replicated, DP, or
DP x TP purely by placement).

Rules (the standard Megatron-style channel split, applied by leaf
shape — flax linen conventions):
  Dense kernel        [in, out]          -> shard `out` on "model"
  Conv/ConvT kernel   [kh, kw, in, out]  -> shard `out` on "model"
  bias / BN scale / BN bias / BN stats [c] -> shard on "model"
    (c is the preceding layer's out-channel axis, so the elementwise
    epilogue stays local to the shard that produced it)
  anything else (scalars, odd shapes)    -> replicated

Validation: tests/test_parallel_tp.py runs generate() and the full
projection defense with params sharded over a (data=4, model=2) virtual
mesh and checks the outputs against the replicated run (fp tolerance —
TP re-orders the matmul reductions). __graft_entry__.py's dryrun
exercises the same path under the driver.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from defensegan_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh of n_data x n_model devices.

    Device order follows jax.devices(); the model axis is innermost
    (fastest-varying) so TP collectives ride the shortest ICI hops on a
    real slice.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"requested {n_data}x{n_model}={need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def tp_spec(leaf: jax.Array) -> P:
    """PartitionSpec for one param leaf under the channel-split rules."""
    shape = np.shape(leaf)
    if len(shape) == 2:            # Dense [in, out]
        return P(None, MODEL_AXIS)
    if len(shape) == 4:            # Conv / ConvTranspose [kh, kw, in, out]
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 1:            # bias / BN scale / BN bias / BN stats
        return P(MODEL_AXIS)
    return P()                     # scalars etc.: replicated


def shard_params_tp(params, mesh: Mesh):
    """Place a flax param/stats pytree onto the mesh under the TP rules.

    Leaves whose shard axis does not divide the model-axis size are
    replicated instead (correct, just not split) — odd channel counts
    must not crash placement.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def place(leaf):
        spec = tp_spec(leaf)
        idx = [i for i, ax in enumerate(spec) if ax == MODEL_AXIS]
        if idx and np.shape(leaf)[idx[0]] % n_model != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)
