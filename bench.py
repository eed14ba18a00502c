#!/usr/bin/env python
"""North-star benchmark: MNIST Defense-GAN reconstructions/sec/chip.

Measures the projection defense (R=10 restarts x L=200 momentum-SGD steps on
z, argmin-restart selection — reference defaults of kabkabm/defensegan
models/gan.py::reconstruct) on the real TPU chip.

Default --cfg is configs/gans/mnist_fast.yml — the TPU-first flagship
generator (GEN_ARCH=wide, GEN_DIM=16; validated defense-quality-equivalent
to the deep reference topology, see RESULTS.md). Pass
--cfg defensegan_tpu/configs/gans/mnist.yml for the reference-depth
generator (latent_dim=128, gen_dim=64, 3-deconv DCGAN stack); the JSON
output names the generator in gen_arch/gen_dim so the two are never
conflated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "gen_arch",
"gen_dim", "kernel"} where vs_baseline is value / 1000 (the BASELINE.json
target of >=1000 recon/s/chip on TPU v5e; the reference publishes no
throughput numbers at all).
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.defense import reconstruct, sample_z0  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402

BASELINE_TARGET = 1000.0  # recon/s/chip, BASELINE.json rebuild target


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None,
                    help="config YAML or trained-run dir (default: the "
                    "shipped MNIST fast config, mnist_fast.yml; use "
                    "configs/gans/mnist.yml for the reference-depth "
                    "generator)")
    ap.add_argument("--batch", type=int, default=16384,
                    help="16384 is the measured throughput-optimal batch "
                    "for both Pallas kernels (scripts/round2_queue_d.py "
                    "occupancy sweep: v2 3760 recon/s at 16384 vs 3685 at "
                    "4096; v3 flat)")
    ap.add_argument("--rec_rr", type=int, default=10)
    ap.add_argument("--rec_iters", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--kernel",
                    choices=["auto", "xla", "packed", "pallas",
                             "pallas_int8"],
                    default="auto")
    args = ap.parse_args()

    cfg_path = args.cfg or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "defensegan_tpu", "configs", "gans", "mnist_fast.yml")
    overrides = {"rec_rr": args.rec_rr, "rec_iters": args.rec_iters}
    cfg = load_config(cfg_path, overrides)
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()  # use trained weights when available; random init is
        # throughput-equivalent (same FLOPs) otherwise

    kernel = args.kernel
    if kernel == "auto":
        # same resolution DefenseGAN.reconstruct applies: the fused Pallas
        # kernels (int8 v2i wide / bf16 v3 deep) win on the chip; XLA
        # paths elsewhere (RESULTS.md round-2 measurements)
        if jax.default_backend() in ("tpu", "axon"):
            kernel = "pallas_int8" if cfg.gen_arch == "wide" else "pallas"
        else:
            kernel = "packed" if cfg.gen_arch == "wide" else "xla"

    if kernel in ("pallas", "pallas_int8"):
        # reconstruct() silently degrades when the Pallas guards fail —
        # refuse to mislabel the measurement instead. Use the kernels'
        # own availability predicates (single source of truth with the
        # reconstruct() dispatch).
        from defensegan_tpu.kernels import (dense_kernel_available,
                                            s2d_kernel_available)
        if jax.default_backend() not in ("tpu", "axon"):
            sys.exit(f"kernel={kernel} needs a TPU backend (reconstruct "
                     "degrades to XLA off-TPU, which would mislabel the "
                     "JSON record); pass --kernel xla/packed off-TPU")
        n = args.batch * cfg.rec_rr
        if dense_kernel_available(gan) and n % 256 == 0:
            pass  # wide v2/v2i runs as requested
        elif s2d_kernel_available(gan) and n % 64 == 0:
            # deep topologies only have the bf16 v3 kernel — report what
            # actually runs
            kernel = "pallas"
        else:
            sys.exit(f"kernel={kernel} would fall back to XLA for this "
                     f"topology/batch (batch*rec_rr={n} fails the tile "
                     "divisibility, or the topology isn't covered); "
                     "adjust --batch or pass --kernel xla")

    key = jax.random.key(0)
    kx, kz = jax.random.split(key)
    x = jax.random.uniform(kx, (args.batch,) + cfg.image_shape, jnp.float32)

    cfg.projection_kernel = kernel  # dataclass field, reconstruct reads it

    def bench_fn(x, k):
        return gan.reconstruct(x, k).x_hat

    # Time with an honest barrier: fetch a scalar reduction of the output to
    # the host each repeat. (On some PJRT transports Array.block_until_ready
    # returns at enqueue time; a host fetch always waits for completion.)
    float(jnp.sum(bench_fn(x, kz)))  # warmup / compile

    times = []
    for i in range(args.repeats):
        k = jax.random.fold_in(kz, i)
        t0 = time.perf_counter()
        float(jnp.sum(bench_fn(x, k)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    value = args.batch / dt
    print(json.dumps({
        "metric": "mnist_reconstructions_per_sec_per_chip",
        "value": round(value, 2),
        "unit": f"recon/s (R={cfg.rec_rr}, L={cfg.rec_iters}, "
                f"batch={args.batch}, {kernel}, gen={cfg.gen_arch}/"
                f"dim{cfg.gen_dim})",
        "vs_baseline": round(value / BASELINE_TARGET, 4),
        "gen_arch": cfg.gen_arch,
        "gen_dim": cfg.gen_dim,
        "kernel": kernel,
    }))


if __name__ == "__main__":
    main()
