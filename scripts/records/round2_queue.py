#!/usr/bin/env python
"""Round-2 chip queue: all remaining TPU work bundled into ONE process.

Every new python process pays a multi-minute TPU session claim on this
tunnel (CLAUDE.md), so chip work is serialized here:

  1. scripts/parity.py full table — white-box fgsm/rand_fgsm/cw x models
     A-F x {none, defense_gan, adv_tr} + black-box substitutes B/E, both
     datasets. Model A runs CW at full cleverhans strength (1000 iters x
     5 bs steps) THROUGH the L=200 unrolled reconstruction — the VERDICT
     round-1 item-5 row — via the host-chunked CW driver.
  2. ImageNet-64 beyond smoke: train the stretch config past 500 steps and
     bench 64x64 projection throughput (BASELINE.json config 5).

Run:  python scripts/round2_queue.py 2>&1 | tee /tmp/round2_queue.log
"""

import importlib.util
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

FAILURES = []


def step(name):
    print(f"\n{'#' * 72}\n# QUEUE STEP: {name}  [{time.strftime('%H:%M:%S')}]"
          f"\n{'#' * 72}", flush=True)


def guarded(name, fn):
    step(name)
    t0 = time.time()
    try:
        fn()
        print(f"# DONE {name} in {time.time() - t0:.0f}s", flush=True)
    except SystemExit as e:  # parity sys.exit(0) on qualitative runs
        code = e.code if isinstance(e.code, int) else 0
        print(f"# DONE {name} (exit {code}) in {time.time() - t0:.0f}s",
              flush=True)
        if code not in (0, None):
            FAILURES.append(name)
    except Exception:
        traceback.print_exc()
        print(f"# FAILED {name} after {time.time() - t0:.0f}s — continuing",
              flush=True)
        FAILURES.append(name)


def load_script(name):
    path = os.path.join(ROOT, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_parity():
    sys.argv = ["parity.py", "--num_tests", "512",
                "--cw_full_models", "A",
                "--cw_light_iterations", "200",
                "--cw_light_bs_steps", "4"]
    load_script("parity").main()


def run_imagenet64():
    from defensegan_tpu.cli import train
    cfg_path = os.path.join(ROOT, "defensegan_tpu", "configs", "gans",
                            "imagenet64.yml")
    train.main(["--cfg", cfg_path, "--is_train", "--train_iters", "3000",
                "--override", "SAVE_EVERY=1000",
                "--override", "SAMPLE_EVERY=1000"])

    # 64x64 projection throughput (BASELINE.json config 5 number)
    import json

    import jax
    import jax.numpy as jnp

    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN

    cfg = load_config("output/gans/imagenet64")
    cfg.projection_kernel = "xla"  # Pallas kernels cover MNIST topologies
    gan = DefenseGAN(cfg)
    gan.load()
    for batch in (256, 512):
        x = jax.random.uniform(jax.random.key(0),
                               (batch,) + cfg.image_shape, jnp.float32)
        k = jax.random.key(1)
        float(jnp.sum(gan.reconstruct(x, k).x_hat))  # compile
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(gan.reconstruct(x, jax.random.fold_in(k, i)).x_hat))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(json.dumps({
            "metric": "imagenet64_reconstructions_per_sec_per_chip",
            "value": round(batch / dt, 2),
            "unit": f"recon/s (R={cfg.rec_rr}, L={cfg.rec_iters}, "
                    f"batch={batch}, xla, 64x64x3 gen_dim={cfg.gen_dim})",
        }), flush=True)


def main():
    guarded("parity full table (incl. full-strength CW on model A)",
            run_parity)
    guarded("imagenet64 train 3000 steps + 64x64 recon bench", run_imagenet64)
    print(f"\nQUEUE COMPLETE; failures: {FAILURES or 'none'}", flush=True)


if __name__ == "__main__":
    main()
