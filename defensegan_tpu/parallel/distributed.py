"""Multi-host bootstrap + explicit-collective (shard_map) train step.

The reference (kabkabm/defensegan) is single-process/single-GPU with no
communication backend at all (SURVEY.md section 2). The TPU-native
equivalent for scaling past one host:

  - `initialize_distributed()` wraps `jax.distributed.initialize()`: one
    process per host, each seeing its local chips; afterwards
    `jax.devices()` is the GLOBAL device list and a Mesh over it spans
    hosts. Intra-slice traffic rides ICI; if a mesh ever spans multiple
    slices the `data` axis crosses DCN, which only carries the per-step
    gradient psum here (params are replicated, activations never cross) —
    the one collective this workload needs, so multi-slice DP remains
    bandwidth-light by construction. See SCALING.md.

  - `make_shard_map_train_step()` is the explicit-collective variant of the
    GSPMD train step: per-shard grads computed locally, `pmean` over the
    `data` axis (ICI/DCN), optimizer update applied redundantly on every
    shard. Semantically equivalent to the jit/GSPMD path; useful when
    explicit control of collective placement is wanted (multi-host, or
    debugging what GSPMD inserts).

Single-process multi-host rehearsal: scripts/multihost_smoke.py launches 2
OS processes with a CPU coordinator and runs this step over the merged
device set — the standard JAX way to exercise the multi-process code path
without a real pod (tests/test_distributed.py runs the shard_map step on
the 8-virtual-device mesh in-process).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from defensegan_tpu.parallel.mesh import DATA_AXIS


def initialize_distributed(
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None) -> Tuple[int, int]:
    """Multi-host bootstrap; no-op in single-process runs.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, as set by TPU pod runtimes or
    scripts/multihost_smoke.py). Returns (process_index, process_count).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address and (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def make_shard_map_train_step(generator, critic, gen_tx, disc_tx, *,
                              latent_dim: int, disc_iters: int = 5,
                              gp_lambda: float = 10.0, mesh: Mesh):
    """Explicit-collective DP train step over `mesh`'s data axis.

    fn(state, real [disc_iters, B_global, H, W, C], key) -> (state, metrics)
    with state replicated and the batch sharded on axis 1. Gradients/BN
    stats/metrics are pmean'd inside (gan/train.py axis_name path).
    """
    from defensegan_tpu.gan.train import make_train_step

    step = make_train_step(generator, critic, gen_tx, disc_tx,
                           latent_dim=latent_dim, disc_iters=disc_iters,
                           gp_lambda=gp_lambda, axis_name=DATA_AXIS)

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False)  # outputs ARE replicated (pmean'd grads), but the
    #                       optimizer update is too complex for rep checking
    return jax.jit(sharded)


def global_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[disc_iters, B_global, ...] batches: shard axis 1 over data."""
    return NamedSharding(mesh, P(None, DATA_AXIS))
