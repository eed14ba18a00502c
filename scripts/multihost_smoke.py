#!/usr/bin/env python
"""Two-process multi-host rehearsal of the distributed DP train step.

Launches 2 OS processes (the driver mode), each claiming 4 virtual CPU
devices; `jax.distributed.initialize` merges them into one 8-device global
mesh, and the shard_map train step (parallel/distributed.py) runs with the
batch sharded across BOTH processes — exercising the real multi-process
code path (global mesh construction, cross-process collectives through the
distributed runtime, make_array_from_process_local_data) without TPU pods.

On a real multi-host TPU slice the same worker code runs unchanged: one
process per host, env vars set by the pod runtime, `data` axis over ICI
(and over DCN if the mesh ever spans slices — which only carries the
gradient psum; see parallel/distributed.py).

Driver:  PYTHONPATH= python scripts/multihost_smoke.py
Worker:  (spawned) scripts/multihost_smoke.py --worker <pid>
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 18765
N_PROC = 2
DEV_PER_PROC = 4


def worker():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from defensegan_tpu.gan.train import build_optimizers, init_gan_state
    from defensegan_tpu.models import critic_for, generator_for
    from defensegan_tpu.parallel import (global_batch_sharding,
                                         initialize_distributed, make_mesh,
                                         make_shard_map_train_step,
                                         replicated_sharding)

    pid, count = initialize_distributed()
    assert count == N_PROC, f"process_count={count}"
    devices = jax.devices()
    assert len(devices) == N_PROC * DEV_PER_PROC, len(devices)

    Z, SHAPE = 16, (28, 28, 1)
    gen = generator_for("mnist", dim=4)
    critic = critic_for("mnist", dim=4)
    gen_tx, disc_tx = build_optimizers()
    state = init_gan_state(gen, critic, jax.random.key(0), SHAPE, Z,
                           gen_tx, disc_tx)

    mesh = make_mesh()  # global: spans both processes
    rep = replicated_sharding(mesh)
    state = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a)),
        state)
    step = make_shard_map_train_step(gen, critic, gen_tx, disc_tx,
                                     latent_dim=Z, disc_iters=2, mesh=mesh)

    global_batch = 16  # 2 per device
    local = np.random.RandomState(100 + pid).rand(
        2, global_batch // N_PROC, *SHAPE).astype(np.float32)
    batch = jax.make_array_from_process_local_data(
        global_batch_sharding(mesh), local)
    key = jax.make_array_from_process_local_data(
        rep, np.asarray(jax.random.key_data(jax.random.key(5))))
    key = jax.random.wrap_key_data(key)

    for i in range(2):
        state, metrics = step(state, batch, key)
        key = jax.random.fold_in(key, i)
    m = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in m.values()), m
    if pid == 0:
        print(f"MULTIHOST_OK processes={count} devices={len(devices)} "
              f"d_loss={m['d_loss']:+.4f}", flush=True)


def driver():
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env.update({
            "PYTHONPATH": "",  # dodge the axon sitecustomize TPU hook
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count="
                         f"{DEV_PER_PROC}",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{PORT}",
            "JAX_NUM_PROCESSES": str(N_PROC),
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            ok = False
            print(f"--- worker {pid} FAILED (rc={p.returncode}):\n{out}")
        elif "MULTIHOST_OK" in out:
            print(out.strip().splitlines()[-1])
    if not ok:
        sys.exit(1)
    print("multi-process shard_map DP train step: PASS")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        driver()
