#!/usr/bin/env python
"""Round-2 chip queue, phase D — perf occupancy sweep + extended 64x64
training.

  1. Pallas v2 (wide flagship) batch x tile sweep: the shipped 3676 recon/s
     is batch=4096/tile=256; more tiles may pipeline better.
  2. Pallas v3 (deep reference arch) batch sweep at tile=64.
  3. CelebA + ImageNet-64 extended training (10k steps total each) and a
     CelebA end-to-end attack eval with the better-trained GAN.

Run:  python scripts/round2_queue_d.py 2>&1 | tee /tmp/round2_queue_d.log
"""

import json
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


def guarded(name, fn):
    print(f"\n{'#' * 72}\n# QUEUE-D STEP: {name}  "
          f"[{time.strftime('%H:%M:%S')}]\n{'#' * 72}", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"# DONE {name} in {time.time() - t0:.0f}s", flush=True)
    except SystemExit as e:
        code = e.code if isinstance(e.code, int) else 0
        if code not in (0, None):
            FAILURES.append(name)
        print(f"# DONE {name} (exit {code}) in {time.time() - t0:.0f}s",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"# FAILED {name} after {time.time() - t0:.0f}s — continuing",
              flush=True)
        FAILURES.append(name)


def _bench_reconstructor(run, batch, image_shape, label):
    import jax
    import jax.numpy as jnp

    x = jax.random.uniform(jax.random.key(0), (batch,) + tuple(image_shape),
                           jnp.float32)
    k = jax.random.key(1)
    float(jnp.sum(run(x, k).x_hat))  # compile + warm
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x, jax.random.fold_in(k, i)).x_hat))
        times.append(time.perf_counter() - t0)
    val = batch / min(times)
    print(json.dumps({"metric": "sweep", "label": label,
                      "recon_per_sec": round(val, 2)}), flush=True)
    return val


def run_v2_sweep():
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN
    from defensegan_tpu.kernels import make_pallas_dense_reconstructor

    cfg = load_config(os.path.join(ROOT, "defensegan_tpu", "configs",
                                   "gans", "mnist_fast.yml"))
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
    best = (0.0, None)
    for tile in (256, 512):
        run = make_pallas_dense_reconstructor(
            gan, rec_rr=cfg.rec_rr, rec_iters=cfg.rec_iters,
            rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum, tile=tile)
        for batch in (2048, 4096, 8192, 16384):
            if (batch * cfg.rec_rr) % tile:
                continue
            try:
                v = _bench_reconstructor(run, batch, cfg.image_shape,
                                         f"v2 tile={tile} batch={batch}")
                if v > best[0]:
                    best = (v, (tile, batch))
            except Exception:
                traceback.print_exc()
    print(f"v2 sweep best: {best}", flush=True)


def run_v3_sweep():
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN
    from defensegan_tpu.kernels import make_pallas_s2d_reconstructor

    cfg = load_config(os.path.join(ROOT, "defensegan_tpu", "configs",
                                   "gans", "mnist.yml"))
    gan = DefenseGAN(cfg)
    best = (0.0, None)
    for tile in (64,):
        run = make_pallas_s2d_reconstructor(
            gan, rec_rr=cfg.rec_rr, rec_iters=cfg.rec_iters,
            rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum, tile=tile)
        for batch in (2048, 4096, 8192):
            try:
                v = _bench_reconstructor(run, batch, cfg.image_shape,
                                         f"v3 tile={tile} batch={batch}")
                if v > best[0]:
                    best = (v, (tile, batch))
            except Exception:
                traceback.print_exc()
    print(f"v3 sweep best: {best}", flush=True)


def run_64x64_training():
    from defensegan_tpu.cli import train, whitebox

    # continue celeba + imagenet64 to 10k total steps (resumes from latest)
    for name in ("celeba", "imagenet64"):
        train.main(["--cfg", os.path.join(ROOT, "defensegan_tpu", "configs",
                                          "gans", f"{name}.yml"),
                    "--is_train", "--train_iters", "10000",
                    "--override", "SAVE_EVERY=5000",
                    "--override", "SAMPLE_EVERY=5000"])
    # end-to-end celeba attack eval with the trained GAN
    whitebox.main(["--cfg", "output/gans/celeba", "--attack_type", "fgsm",
                   "--defense_type", "defense_gan", "--model", "A",
                   "--num_tests", "128", "--classifier_epochs", "10",
                   "--attack_rec_iters", "25", "--attack_batch", "32",
                   "--retrain_classifier"])


def main():
    guarded("pallas v2 occupancy sweep (wide flagship)", run_v2_sweep)
    guarded("pallas v3 batch sweep (deep reference arch)", run_v3_sweep)
    guarded("celeba + imagenet64 to 10k steps + celeba attack eval",
            run_64x64_training)
    print(f"\nQUEUE-D COMPLETE; failures: {FAILURES or 'none'}", flush=True)


if __name__ == "__main__":
    main()
