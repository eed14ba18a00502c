#!/usr/bin/env python
"""Round-2 chip queue, phase E — trained evidence for the
reference-faithful deep config (mnist.yml, the topology of
kabkabm/defensegan models/gan.py):

  1. train the deep dim-64 WGAN-GP 20k steps;
  2. white-box A: fgsm / rand_fgsm / light CW through the defense
     (the projection now runs the v3 Pallas kernel with TRAINED weights);
  3. bench the deep config with trained weights.

Run:  python scripts/round2_queue_e.py 2>&1 | tee /tmp/round2_queue_e.log
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


def guarded(name, fn):
    print(f"\n{'#' * 72}\n# QUEUE-E STEP: {name}  "
          f"[{time.strftime('%H:%M:%S')}]\n{'#' * 72}", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"# DONE {name} in {time.time() - t0:.0f}s", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"# FAILED {name} after {time.time() - t0:.0f}s — continuing",
              flush=True)
        FAILURES.append(name)


def cfgp(name):
    return os.path.join(ROOT, "defensegan_tpu", "configs", "gans",
                        f"{name}.yml")


def run_train_deep():
    from defensegan_tpu.ckpt import latest_step
    from defensegan_tpu.cli import train

    if latest_step("output/gans/mnist") is None:
        train.main(["--cfg", cfgp("mnist"), "--is_train",
                    "--override", "SAVE_EVERY=5000",
                    "--override", "SAMPLE_EVERY=5000"])
    else:
        print("deep checkpoint already present", flush=True)


def run_whitebox_deep():
    from defensegan_tpu.cli import whitebox

    common = ["--cfg", "output/gans/mnist", "--model", "A",
              "--num_tests", "512", "--classifier_epochs", "10"]
    whitebox.main(common + ["--attack_type", "fgsm",
                            "--defense_type", "defense_gan"])
    whitebox.main(common + ["--attack_type", "rand_fgsm",
                            "--defense_type", "defense_gan"])
    whitebox.main(["--cfg", "output/gans/mnist", "--model", "A",
                   "--num_tests", "256", "--classifier_epochs", "10",
                   "--attack_type", "cw", "--defense_type", "defense_gan",
                   "--cw_max_iterations", "200",
                   "--cw_binary_search_steps", "4",
                   "--cw_chunk_iters", "25", "--cw_abort_early",
                   "--attack_batch", "256"])


def run_bench_deep():
    sys.argv = ["bench.py", "--cfg", cfgp("mnist")]
    path = os.path.join(ROOT, "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def main():
    guarded("train deep mnist.yml 20k", run_train_deep)
    guarded("whitebox A on the deep GAN (fgsm/rand_fgsm/cw)",
            run_whitebox_deep)
    guarded("bench deep with trained weights", run_bench_deep)
    print(f"\nQUEUE-E COMPLETE; failures: {FAILURES or 'none'}", flush=True)


if __name__ == "__main__":
    main()
