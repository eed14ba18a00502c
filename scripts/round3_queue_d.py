#!/usr/bin/env python
"""Round-3 chip queue D: f-mnist fast operating point.

Completes the wide-flagship story across the MNIST family: train
fmnist_fast.yml (wide/dim16 — identical topology to the MNIST flagship,
so throughput is the already-measured 3763/5761 recon/s) and run the
quality-equivalence protocol against the reference-depth f-mnist GAN at
matched 20k steps: clean-defended + FGSM/CW defended, eval_z0 both.

Same discipline as round3_queue.py. Run: python scripts/round3_queue_d.py
"""

import os
import runpy
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

QDIR = os.path.join("output", "round3_queue")


def step_train():
    from defensegan_tpu.cli import train
    train.main(["--cfg", "defensegan_tpu/configs/gans/fmnist_fast.yml",
                "--is_train", "--train_iters", "20000",
                "--override", "SAVE_EVERY=10000",
                "--override", "SAMPLE_EVERY=10000"])


def _wb(extra):
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/fmnist_fast",
                   "--defense_type", "defense_gan", "--model", "A",
                   "--num_tests", "256", "--classifier_epochs", "10",
                   "--attack_rec_iters", "200", "--attack_batch", "256",
                   "--eval_z0", "both"] + extra)


def step_eval_fgsm():
    _wb(["--attack_type", "fgsm"])


def step_eval_cw():
    _wb(["--attack_type", "cw", "--cw_max_iterations", "200",
         "--cw_binary_search_steps", "4", "--cw_abort_early",
         "--cw_chunk_iters", "25"])


STEPS = [("fmf_train", step_train), ("fmf_fgsm", step_eval_fgsm),
         ("fmf_cw", step_eval_cw)]


def main():
    os.makedirs(QDIR, exist_ok=True)
    only = set(sys.argv[1:])
    failures = []
    for name, fn in STEPS:
        if only and name not in only:
            continue
        marker = os.path.join(QDIR, f"{name}.done")
        if os.path.exists(marker) and not only:
            print(f"== [{name}] already done, skipping", flush=True)
            continue
        print(f"\n== [{name}] start {time.strftime('%H:%M:%S')}",
              flush=True)
        t0 = time.time()
        try:
            fn()
        except KeyboardInterrupt:
            raise
        except BaseException:
            traceback.print_exc()
            failures.append(name)
            print(f"== [{name}] FAILED after {time.time()-t0:.0f}s — "
                  "continuing", flush=True)
            continue
        with open(marker, "w") as f:
            f.write(f"{time.time()-t0:.0f}s\n")
        print(f"== [{name}] done in {time.time()-t0:.0f}s", flush=True)
    print(f"\nqueue D complete; failures: {failures or 'none'}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
