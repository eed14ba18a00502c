#!/usr/bin/env python
"""Measure the off-manifold rejection mechanism directly (queue I).

The collapse-and-restore follow-up (RESULTS.md) INFERRED from accuracy
curves that the projection strips perturbation components orthogonal to
the generator's range (salt flips) and passes components inside it
(smooth blob flips). This measures that claim instead of inferring it:
for each watermark family, reconstruct the clean batch and its
bare-graph FGSM adversarial batch with the SAME z0 key (removing restart
stochasticity), and report how much of the input perturbation survives
projection:

    survival = mean ||recon(x_adv) - recon(x_clean)||_2
             / mean ||x_adv - x_clean||_2      (per image)

Prediction from the mechanism: survival(smooth) > survival(salt). The
numerator is also split into its low-frequency component (3x3 box-blur)
to show WHERE the surviving energy lives.

Uses the GANs trained by queue G / the salt runs
(output/gans/restore_m12_w<amp>[_smooth]); skips missing checkpoints.
Run via scripts/records/round3_queue_i.py (chip discipline).
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
from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.eval import train_classifier  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models import build_classifier  # noqa: E402

import restore_exp  # noqa: E402  (make_data: same data as the curves)


def _mean_l2(a, b):
    d = (a - b).reshape(a.shape[0], -1)
    return float(jnp.mean(jnp.linalg.norm(d, axis=1)))


def _blur3(x):
    """3x3 box blur, NHWC — the low-frequency projector for the split."""
    k = jnp.ones((3, 3, 1, 1), x.dtype) / 9.0
    return jax.lax.conv_general_dilated(
        x, jnp.tile(k, (1, 1, 1, x.shape[-1])),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def run_family(wm_style, wm_amp, margin=12.0, eps=0.3, n=256):
    suffix = "" if wm_style == "salt" else f"_{wm_style}"
    out_dir = os.path.join(
        "output", "gans", f"restore_m{margin:g}_w{wm_amp:g}{suffix}")
    cfg = Config(type="mnist", gen_arch="wide", gen_dim=16, latent_dim=128,
                 disc_dim=64, rec_iters=200, rec_rr=10, rec_lr=10.0,
                 rec_unroll=50, compute_dtype="bfloat16",
                 projection_kernel="xla", output_dir=out_dir)
    gan = DefenseGAN(cfg)
    if not gan.can_load():
        print(json.dumps({"family": wm_style, "wm_amp": wm_amp,
                          "skipped": f"no checkpoint in {out_dir}"}),
              flush=True)
        return None
    gan.load()

    x_train, y_train = restore_exp.make_data(8192, "train", margin, wm_amp,
                                             wm_style=wm_style)
    x_test, y_test = restore_exp.make_data(n, "test", margin, wm_amp,
                                           wm_style=wm_style)
    key = jax.random.key(99)  # same key structure as restore_exp
    k_clf, k_att, k_eval = jax.random.split(key, 3)
    clf = train_classifier(build_classifier("A", num_classes=10),
                           x_train, y_train, key=k_clf, epochs=10,
                           quiet=True)
    logits_fn = clf.logits_fn()

    @jax.jit
    def craft(xb, yb, k):
        return fgsm(logits_fn, xb, yb, eps)

    advs = []
    for i in range(0, n, 64):
        advs.append(np.asarray(craft(jnp.asarray(x_test[i:i + 64]),
                                     jnp.asarray(y_test[i:i + 64]),
                                     jax.random.fold_in(k_att, i))))
    x_adv = jnp.asarray(np.concatenate(advs))
    x_clean = jnp.asarray(x_test)

    # identical z0 for both reconstructions: same key, same shapes
    r_clean = gan.reconstruct(x_clean, k_eval).x_hat
    r_adv = gan.reconstruct(x_adv, k_eval).x_hat

    d_in = _mean_l2(x_adv, x_clean)
    d_out = _mean_l2(r_adv, r_clean)
    lo = _blur3(r_adv - r_clean)
    d_out_lo = float(jnp.mean(jnp.linalg.norm(
        lo.reshape(lo.shape[0], -1), axis=1)))

    # Aggregate survival conflates perturbation RESIDUE with full mode
    # switches (projection lands in another class's mode, recon diff is
    # huge by construction). Condition on the defended prediction:
    # residue on still-correct images is the clean mechanism read.
    per_in = jnp.linalg.norm(
        (x_adv - x_clean).reshape(n, -1), axis=1)
    per_out = jnp.linalg.norm(
        (r_adv - r_clean).reshape(n, -1), axis=1)
    per_surv = np.asarray(per_out / jnp.maximum(per_in, 1e-9))
    pred = np.asarray(jnp.argmax(logits_fn(r_adv), axis=-1))
    correct = pred == y_test
    row = {"family": wm_style, "wm_amp": wm_amp, "eps": eps, "n": n,
           "d_input_l2": round(d_in, 4),
           "d_recon_l2": round(d_out, 4),
           "survival": round(d_out / d_in, 4),
           "d_recon_lowfreq_l2": round(d_out_lo, 4),
           "lowfreq_frac": round(d_out_lo / max(d_out, 1e-9), 4),
           "frac_defended_correct": round(float(correct.mean()), 4),
           "survival_correct": round(float(per_surv[correct].mean()), 4)
           if correct.any() else None,
           "survival_wrong": round(float(per_surv[~correct].mean()), 4)
           if (~correct).any() else None}
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = []
    for wm_style in ("salt", "smooth"):
        for wm_amp in (0.3, 0.4):
            r = run_family(wm_style, wm_amp)
            if r:
                rows.append(r)
    os.makedirs("output/results", exist_ok=True)
    with open("output/results/mechanism_rows.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
