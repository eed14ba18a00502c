#!/usr/bin/env python
"""Round-2 chip queue, phase B (run after round2_queue.py):

  1. digits (REAL sklearn handwriting): train the reference-depth GAN and
     run --train_on_recs to convergence — the reference's "classifier
     trained on Defense-GAN reconstructions" variant (whitebox.py
     --train_on_recs / --online_training), on real data (TODO item 7).
  2. 64x64 projection throughput: packed vs xla on the CelebA topology
     (and the trained imagenet64 checkpoint when phase A produced one).
  3. Full-strength CW through the defense WITH abort_early (cleverhans'
     default) — wall-clock comparison against the phase-A row.
  4. bench.py records for both MNIST configs (flagship + reference-depth).

Run:  python scripts/round2_queue_b.py 2>&1 | tee /tmp/round2_queue_b.log
"""

import importlib.util
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
    print(f"\n{'#' * 72}\n# QUEUE-B STEP: {name}  "
          f"[{time.strftime('%H:%M:%S')}]\n{'#' * 72}", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"# DONE {name} in {time.time() - t0:.0f}s", flush=True)
    except SystemExit as e:
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


def cfgp(name):
    return os.path.join(ROOT, "defensegan_tpu", "configs", "gans",
                        f"{name}.yml")


def run_digits_train_on_recs():
    from defensegan_tpu.ckpt import latest_step
    from defensegan_tpu.cli import train, whitebox

    if latest_step("output/gans/digits") is None:
        train.main(["--cfg", cfgp("digits"), "--is_train",
                    "--override", "SAVE_EVERY=5000",
                    "--override", "SAMPLE_EVERY=5000"])
    common = ["--cfg", "output/gans/digits", "--model", "A",
              "--num_tests", "256", "--classifier_epochs", "20"]
    # baseline: ordinary classifier
    whitebox.main(common + ["--attack_type", "fgsm",
                            "--defense_type", "defense_gan",
                            "--fgsm_eps", "0.1"])
    # the reference's train-on-reconstructions variant, to convergence
    whitebox.main(common + ["--attack_type", "fgsm",
                            "--defense_type", "defense_gan",
                            "--fgsm_eps", "0.1", "--train_on_recs",
                            "--num_rec_train", "1024",
                            "--retrain_classifier"])


def run_64x64_throughput():
    import jax
    import jax.numpy as jnp

    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN

    for cfg_src, rr in ((cfgp("celeba"), 2), ("output/gans/imagenet64", 2)):
        try:
            cfg = load_config(cfg_src)
        except Exception as e:
            print(f"skip {cfg_src}: {e}", flush=True)
            continue
        cfg.rec_rr = rr
        gan = DefenseGAN(cfg)
        if gan.can_load():
            gan.load()
        for kernel in ("xla", "packed"):
            cfg.projection_kernel = kernel
            gan._reconstructors.clear()
            try:
                batch = 256
                x = jax.random.uniform(jax.random.key(0),
                                       (batch,) + cfg.image_shape,
                                       jnp.float32)
                k = jax.random.key(1)
                float(jnp.sum(gan.reconstruct(x, k).x_hat))  # compile
                times = []
                for i in range(3):
                    t0 = time.perf_counter()
                    float(jnp.sum(
                        gan.reconstruct(x, jax.random.fold_in(k, i)).x_hat))
                    times.append(time.perf_counter() - t0)
                print(json.dumps({
                    "metric": f"{cfg.type}_recon_per_sec",
                    "value": round(batch / min(times), 2),
                    "unit": f"recon/s (R={cfg.rec_rr}, L={cfg.rec_iters}, "
                            f"batch={batch}, {kernel}, 64x64x3 "
                            f"gen_dim={cfg.gen_dim})",
                }), flush=True)
            except Exception:
                traceback.print_exc()
                print(f"{cfg.type}/{kernel} failed — continuing", flush=True)


def run_cw_abort_early():
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/mnist_fast", "--attack_type", "cw",
                   "--defense_type", "defense_gan", "--model", "A",
                   "--num_tests", "256", "--attack_batch", "256",
                   "--cw_max_iterations", "1000",
                   "--cw_binary_search_steps", "5",
                   "--attack_rec_iters", "200", "--cw_abort_early"])


def run_bench():
    for cfg, batch in ((None, 4096), (cfgp("mnist"), 4096)):
        sys.argv = ["bench.py", "--batch", str(batch)] + \
            (["--cfg", cfg] if cfg else [])
        path = os.path.join(ROOT, "bench.py")
        spec = importlib.util.spec_from_file_location("bench_mod", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()


def main():
    guarded("digits train_on_recs convergence (real handwriting)",
            run_digits_train_on_recs)
    guarded("64x64 projection throughput: packed vs xla",
            run_64x64_throughput)
    guarded("full-strength CW + abort_early wall-clock", run_cw_abort_early)
    guarded("bench records (flagship + reference-depth)", run_bench)
    print(f"\nQUEUE-B COMPLETE; failures: {FAILURES or 'none'}", flush=True)


if __name__ == "__main__":
    main()
