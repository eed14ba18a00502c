#!/usr/bin/env python
"""One-process MNIST pipeline on the TPU: train WGAN -> artifacts ->
white-box evals -> black-box eval. Bundled into a single process because
TPU session claims / remote compiles dominate small-job wall-clock here.

Usage: python scripts/pipeline_mnist.py [--train_iters N] [--skip_train]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.cli import blackbox, train, whitebox  # noqa: E402

CFG = os.path.join("defensegan_tpu", "configs", "gans", "mnist.yml")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_iters", type=int, default=20000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--num_tests", type=int, default=256)
    ap.add_argument("--rec_iters", type=int, default=200)
    ap.add_argument("--rec_rr", type=int, default=10)
    ap.add_argument("--attack_rec_iters", type=int, default=100,
                    help="L inside the white-box attack graph")
    ap.add_argument("--skip_cw", action="store_true")
    args = ap.parse_args()

    base = ["--cfg", "output/gans/mnist" if args.skip_train else CFG,
            "--rec_iters", str(args.rec_iters), "--rec_rr", str(args.rec_rr)]

    if not args.skip_train:
        print("=" * 70, "\n[1/6] training MNIST WGAN-GP\n", "=" * 70)
        train.main([*base, "--is_train", "--train_iters",
                    str(args.train_iters),
                    # checkpoint fetches cross the relay pipe; keep cadence low
                    "--override", "SAVE_EVERY=5000",
                    "--override", "SAMPLE_EVERY=2000"])
    print("=" * 70, "\n[2/6] test-mode artifacts\n", "=" * 70)
    train.main(["--cfg", "output/gans/mnist", "--num_recs", "16"])

    wb = ["--cfg", "output/gans/mnist", "--num_tests", str(args.num_tests),
          "--rec_iters", str(args.rec_iters), "--rec_rr", str(args.rec_rr),
          "--attack_rec_iters", str(args.attack_rec_iters), "--model", "A"]
    print("=" * 70, "\n[3/6] whitebox FGSM, no defense\n", "=" * 70)
    whitebox.main([*wb, "--attack_type", "fgsm", "--defense_type", "none"])
    print("=" * 70, "\n[4/6] whitebox FGSM vs Defense-GAN\n", "=" * 70)
    whitebox.main([*wb, "--attack_type", "fgsm",
                   "--defense_type", "defense_gan"])
    print("=" * 70, "\n[5/6] whitebox RAND+FGSM vs Defense-GAN\n", "=" * 70)
    whitebox.main([*wb, "--attack_type", "rand_fgsm",
                   "--defense_type", "defense_gan"])
    if not args.skip_cw:
        print("=" * 70, "\n[5b/6] whitebox CW-L2 vs Defense-GAN\n", "=" * 70)
        whitebox.main([*wb, "--attack_type", "cw",
                       "--defense_type", "defense_gan",
                       "--cw_max_iterations", "100",
                       "--cw_binary_search_steps", "3",
                       "--num_tests", str(min(args.num_tests, 64))])
    print("=" * 70, "\n[6/6] blackbox substitute FGSM\n", "=" * 70)
    blackbox.main(["--cfg", "output/gans/mnist", "--bb_model", "A",
                   "--sub_model", "B", "--num_tests", str(args.num_tests),
                   "--rec_iters", str(args.rec_iters),
                   "--rec_rr", str(args.rec_rr)])
    print("pipeline complete; results under output/results/")


if __name__ == "__main__":
    main()
