#!/usr/bin/env python
"""End-to-end defense-quality gate for the int8 projection kernel.

With the trained mnist_fast GAN and classifier A: purified-CLEAN accuracy
and FGSM-defended accuracy (defense-unaware attacker) must match across
projection kernels xla / pallas (bf16) / pallas_int8. This is the
accuracy-level complement to scripts/int8_validate.py's loss-level checks.

Run:  python scripts/int8_accuracy_gate.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from defensegan_tpu.attacks import fgsm  # noqa: E402
from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.data import get_dataset  # noqa: E402
from defensegan_tpu.eval import (model_eval, model_eval_gan,  # noqa: E402
                                 train_classifier)
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models import build_classifier  # noqa: E402


def main():
    cfg = load_config(os.path.join(ROOT, "defensegan_tpu", "configs",
                                   "gans", "mnist_fast.yml"))
    gan = DefenseGAN(cfg)
    assert gan.can_load(), "needs the trained mnist_fast checkpoint"
    gan.load()

    ds = get_dataset("mnist")
    x_tr, y_tr = ds.load("train")
    x_te, y_te = ds.load("test")
    x_te, y_te = x_te[:256], y_te[:256]

    clf = train_classifier(build_classifier("A"), x_tr, y_tr,
                           key=jax.random.key(5), epochs=5)
    logits_fn = clf.logits_fn()
    clean = model_eval(logits_fn, x_te, y_te)
    adv = jnp.asarray(x_te)
    adv = fgsm(logits_fn, adv, jnp.asarray(y_te), 0.1)
    adv_acc = model_eval(logits_fn, adv, y_te)
    print(json.dumps({"clean_acc": clean, "fgsm01_acc": adv_acc}),
          flush=True)

    key = jax.random.key(9)
    for kernel in ("xla", "pallas", "pallas_int8"):
        cfg.projection_kernel = kernel
        gan._reconstructors.clear()
        out = {
            "kernel": kernel,
            "clean_defended": model_eval_gan(gan, logits_fn, x_te, y_te,
                                             key=key),
            "fgsm01_defended": model_eval_gan(gan, logits_fn, adv, y_te,
                                              key=key),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
