#!/usr/bin/env python
"""R x L ablation on REAL data (paper-figure reproduction, queue J).

The Defense-GAN paper studies the defense's two knobs — R random
restarts and L projection steps — and shows defended accuracy and
reconstruction quality improve monotonically (with diminishing returns)
in both. That figure has never been reproduced here. This runs the grid
on the one real image dataset reachable offline (sklearn digits,
upsampled — output/gans/digits checkpoint from queue E):

  for R in {1, 2, 5, 10, 20} x L in {25, 50, 100, 200}:
      clean-defended acc, FGSM(eps=0.1, bare-graph)-defended acc,
      mean final reconstruction MSE (tanh space)

The adversarial set is crafted ONCE (bare-graph FGSM on the classifier)
and held fixed across the grid; the eval key is fixed so cells differ
only in (R, L). Uses model_eval_gan's rec_rr/rec_iters overrides — the
same override surface the reference exposes as --rec_rr/--rec_iters
(SURVEY.md section 2 whitebox flags).

Writes one JSON row per cell to output/results/rl_ablation_rows.jsonl.
Run via scripts/records/round3_queue_j.py (chip discipline).
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from defensegan_tpu.attacks import fgsm  # noqa: E402
from defensegan_tpu.cli.common import load_data, limit  # noqa: E402
from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.eval import (model_eval, model_eval_gan,  # noqa: E402
                                 train_classifier)
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models import build_classifier  # noqa: E402

RS = (1, 2, 5, 10, 20)
LS = (25, 50, 100, 200)
N = 256


def _load_target(argv):
    """Default: real digits (eps=0.1). `restore <style> <amp>`: the
    collapse-and-restore GANs (eps=0.3) — the mechanism prediction is
    that the falling defended-vs-L trend measured on digits appears for
    the ON-manifold (smooth) watermark family but not for the
    off-manifold (salt) one."""
    if argv and argv[0] == "restore":
        import restore_exp
        from defensegan_tpu.configs import Config
        wm_style, wm_amp = argv[1], float(argv[2])
        margin = 12.0
        suffix = "" if wm_style == "salt" else f"_{wm_style}"
        cfg = Config(type="mnist", gen_arch="wide", gen_dim=16,
                     latent_dim=128, disc_dim=64, rec_iters=200, rec_rr=10,
                     rec_lr=10.0, rec_unroll=50, compute_dtype="bfloat16",
                     output_dir=os.path.join(
                         "output", "gans",
                         f"restore_m{margin:g}_w{wm_amp:g}{suffix}"))
        x_train, y_train = restore_exp.make_data(8192, "train", margin,
                                                 wm_amp, wm_style=wm_style)
        x_test, y_test = restore_exp.make_data(N, "test", margin, wm_amp,
                                               wm_style=wm_style)
        return (cfg, x_train, y_train, x_test, y_test, 0.3,
                f"restore_{wm_style}_w{wm_amp:g}")
    cfg = load_config("output/gans/digits")
    ds = load_data(cfg)
    x_train, y_train = ds.load("train")
    x_test, y_test = ds.load("test")
    x_test, y_test = limit(x_test, y_test, N)
    return cfg, x_train, y_train, x_test, y_test, 0.1, "digits"


def main():
    (cfg, x_train, y_train, x_test, y_test, EPS,
     label) = _load_target(sys.argv[1:])
    gan = DefenseGAN(cfg)
    gan.load()

    key = jax.random.key(99)
    k_clf, k_att, k_eval = jax.random.split(key, 3)
    clf = train_classifier(build_classifier("A", num_classes=10),
                           x_train, y_train, key=k_clf, epochs=10,
                           quiet=True)
    logits_fn = clf.logits_fn()

    @jax.jit
    def craft(xb, yb):
        return fgsm(logits_fn, xb, yb, EPS)

    advs = [np.asarray(craft(jnp.asarray(x_test[i:i + 64]),
                             jnp.asarray(y_test[i:i + 64])))
            for i in range(0, x_test.shape[0], 64)]
    x_adv = np.concatenate(advs)
    print(json.dumps({"target": label,
                      "clean_acc": model_eval(logits_fn, x_test, y_test),
                      "bare_adv_acc": model_eval(logits_fn, x_adv, y_test),
                      "eps": EPS, "n": int(x_test.shape[0])}), flush=True)

    rows = []
    for r in RS:
        for l in LS:
            # kernel pinned to xla: one numeric family across all 20
            # cells (the ablation varies R/L semantics, not kernels)
            res = gan.reconstruct(jnp.asarray(x_test), k_eval,
                                  rec_rr=r, rec_iters=l, kernel="xla")
            mse = float(jnp.mean(res.loss))
            acc_c = model_eval_gan(gan, logits_fn, x_test, y_test,
                                   key=k_eval, rec_rr=r, rec_iters=l,
                                   rec_kernel="xla")
            acc_a = model_eval_gan(gan, logits_fn, x_adv, y_test,
                                   key=k_eval, rec_rr=r, rec_iters=l,
                                   rec_kernel="xla")
            row = {"dataset": label, "R": r, "L": l, "eps": EPS,
                   "clean_defended_acc": acc_c,
                   "fgsm_defended_acc": acc_a,
                   "mean_rec_mse": round(mse, 6)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    os.makedirs("output/results", exist_ok=True)
    with open("output/results/rl_ablation_rows.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
