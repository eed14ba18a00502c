#!/usr/bin/env python
"""Collapse-and-restore falsification experiment (round-3 follow-up to
the margin sweep).

The margin/sparsity sweeps explained the FGSM-defended LEVEL but never
reproduced the paper's collapse-and-restore PATTERN (bare classifier
0.22 -> defense 0.988): on point-prototype data, whatever makes the
manifold robust makes the bare classifier robust too, so defended ~=
bare everywhere. The paper pattern needs a classifier that relies on
SMALL-margin features over a LARGE-margin manifold.

This experiment engineers exactly that: sparse prototypes at manifold
margin ~12 (where the sparse sweep measured defended ~0.96) PLUS a
faint per-class additive watermark (amplitude 0.1, positive so it
survives the [0,1] clip). The watermark is perfectly discriminative and
trivially flippable inside an eps=0.3 L-inf ball, so the classifier that
latches onto it COLLAPSES under FGSM; the projection is L2-driven by the
big shapes (the watermark contributes ~1% of pixel energy), so the
reconstruction restores the SHAPE's class — and its watermark, if the
GAN learned the correlation. Predictions:
  collapse: adversarial bare-classifier accuracy well below the
            shape-only sweep's 0.96;
  restore:  defended accuracy back near clean.
Either outcome is informative: if the GAN fails to reproduce the
watermark, clean-defended drops and the report says so.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from defensegan_tpu.attacks import fgsm  # noqa: E402
from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.attacks import make_attack_target  # noqa: E402
from defensegan_tpu.data.synthetic import synthetic_protos  # noqa: E402
from defensegan_tpu.eval import (model_eval, model_eval_gan,  # noqa: E402
                                 train_classifier)
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models import build_classifier  # noqa: E402


def make_marks(wm_amp, wm_style, seed):
    """Per-class additive watermark [10, 28, 28, 1].

    salt:   iid Bernoulli pixel salt — perfectly discriminative but pure
            high-frequency noise, the hardest feature family for a DCGAN
            generator to reproduce (its reconstruction noise is what caps
            the restore at high amplitude).
    smooth: low-frequency per-class blob field (sum of a few Gaussians)
            — equally discriminative and equally flippable inside the
            eps ball, but exactly the feature family deconv generators
            learn best. Prediction was "same collapse, much higher
            restore"; MEASURED (queue G): smooth restores 5-8 points
            WORSE at matched collapse depth — on-manifold flips survive
            the projection, off-manifold salt flips are stripped (see
            RESULTS.md collapse section for the mechanism).
    """
    wrng = np.random.RandomState(seed * 131 + 7)
    if wm_style == "salt":
        return (wrng.rand(10, 28, 28, 1) < 0.5).astype(np.float32) * wm_amp
    assert wm_style == "smooth", wm_style
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    marks = np.zeros((10, 28, 28, 1), np.float32)
    for c in range(10):
        field = np.zeros((28, 28), np.float32)
        for _ in range(4):
            cy, cx = wrng.uniform(4, 24, 2)
            sig = wrng.uniform(2.5, 5.0)
            field += wrng.choice([-1.0, 1.0]) * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig * sig))
        field -= field.min()          # positive so it survives [0,1] clip
        field /= max(field.max(), 1e-6)
        marks[c, :, :, 0] = field * wm_amp
    return marks


def make_data(num, split, margin, wm_amp, seed=0, wm_style="salt"):
    protos = synthetic_protos(28, 1, seed=seed, margin=margin,
                              style="sparse")  # [10, 28, 28, 1]
    marks = make_marks(wm_amp, wm_style, seed)
    salt = {"train": 0, "test": 2}[split]
    srng = np.random.RandomState(seed * 104729 + salt * 7907 + 23)
    labels = srng.randint(0, 10, size=num).astype(np.int32)
    images = protos[labels] + marks[labels]
    images = images + srng.randn(*images.shape).astype(np.float32) * 0.08
    shifts = srng.randint(-1, 2, size=(num, 2))
    for i, (dy, dx) in enumerate(shifts):
        images[i] = np.roll(images[i], (dy, dx), axis=(0, 1))
    return np.clip(images, 0.0, 1.0), labels


def main():
    margin = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    wm_amp = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    train_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
    wm_style = sys.argv[4] if len(sys.argv) > 4 else "salt"
    eps = 0.3
    x_train, y_train = make_data(8192, "train", margin, wm_amp,
                                 wm_style=wm_style)
    x_test, y_test = make_data(256, "test", margin, wm_amp,
                               wm_style=wm_style)

    cfg = Config(type="mnist", gen_arch="wide", gen_dim=16, latent_dim=128,
                 disc_dim=64, batch_size=64, disc_iters=5,
                 rec_iters=200, rec_rr=10, rec_lr=10.0, rec_unroll=50,
                 compute_dtype="bfloat16", projection_kernel="xla",
                 train_iters=train_iters, sample_every=10**9,
                 save_every=train_iters,
                 output_dir=os.path.join(
                     "output", "gans",
                     f"restore_m{margin:g}_w{wm_amp:g}" +
                     ("" if wm_style == "salt" else f"_{wm_style}")))
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
        print("reusing trained GAN")
    else:
        print(f"training GAN {train_iters} steps")
        gan.train(x_train, log_every=1000, quiet=True)

    key = jax.random.key(99)
    k_clf, k_att, k_eval = jax.random.split(key, 3)
    clf = train_classifier(build_classifier("A", num_classes=10),
                           x_train, y_train, key=k_clf, epochs=10,
                           quiet=True)
    logits_fn = clf.logits_fn()

    clean = model_eval(logits_fn, x_test, y_test)
    clean_def = model_eval_gan(gan, logits_fn, x_test, y_test, key=k_eval)

    # same composition as cli/whitebox.py (shared helper); this script
    # attacks through the full L=200 unroll regardless of cfg.rec_iters
    attack_target = make_attack_target(gan, logits_fn, cfg, rec_iters=200)

    @jax.jit
    def craft_def(xb, yb, k):
        return fgsm(lambda x: attack_target(x, k), xb, yb, eps)

    @jax.jit
    def craft_bare(xb, yb, k):
        return fgsm(logits_fn, xb, yb, eps)

    out = {"margin": margin, "wm_amp": wm_amp, "wm_style": wm_style,
           "eps": eps, "train_iters": train_iters,
           "clean_acc": clean, "clean_defended_acc": clean_def}
    for name, craft in (("through_defense", craft_def),
                        ("bare_graph", craft_bare)):
        advs = []
        for i in range(0, x_test.shape[0], 64):
            advs.append(np.asarray(craft(jnp.asarray(x_test[i:i + 64]),
                                         jnp.asarray(y_test[i:i + 64]),
                                         jax.random.fold_in(k_att, i))))
        x_adv = np.concatenate(advs)
        out[f"adv_acc_{name}"] = model_eval(logits_fn, x_adv, y_test)
        out[f"defended_acc_{name}"] = model_eval_gan(
            gan, logits_fn, x_adv, y_test, key=k_eval)
    print(json.dumps(out), flush=True)
    os.makedirs("output/results", exist_ok=True)
    with open(os.path.join("output", "results", "restore_rows.jsonl"),
              "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
