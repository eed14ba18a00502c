#!/usr/bin/env python
"""One-process pipeline on the TPU for any dataset config: train WGAN ->
artifacts -> white-box evals -> black-box eval. Bundled into a single
process because TPU session claims / remote compiles dominate small-job
wall-clock here.

Usage:
  python scripts/pipeline.py --type mnist --train_iters 20000
  python scripts/pipeline.py --type f-mnist --skip_cw
  python scripts/pipeline.py --type digits --train_iters 10000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()
from defensegan_tpu.cli import blackbox, train, whitebox  # noqa: E402

CFG_DIR = os.path.join("defensegan_tpu", "configs", "gans")
CFG_FILES = {"mnist": "mnist.yml", "f-mnist": "fmnist.yml",
             "fmnist": "fmnist.yml", "digits": "digits.yml",
             "celeba": "celeba.yml", "imagenet64": "imagenet64.yml"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", default="mnist", choices=sorted(CFG_FILES))
    ap.add_argument("--train_iters", type=int, default=20000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_attacks", action="store_true")
    ap.add_argument("--num_tests", type=int, default=256)
    ap.add_argument("--rec_iters", type=int, default=200)
    ap.add_argument("--rec_rr", type=int, default=10)
    ap.add_argument("--attack_rec_iters", type=int, default=100,
                    help="L inside the white-box attack graph")
    ap.add_argument("--skip_cw", action="store_true")
    ap.add_argument("--model", default="A")
    args = ap.parse_args()

    cfg_yml = os.path.join(CFG_DIR, CFG_FILES[args.type])
    out_dir = None
    import yaml
    with open(cfg_yml) as f:
        out_dir = yaml.safe_load(f)["OUTPUT_DIR"]

    base = ["--cfg", out_dir if args.skip_train else cfg_yml,
            "--rec_iters", str(args.rec_iters), "--rec_rr", str(args.rec_rr)]

    if not args.skip_train:
        print("=" * 70, "\n[1] training WGAN-GP:", args.type, "\n", "=" * 70)
        train.main([*base, "--is_train", "--train_iters",
                    str(args.train_iters),
                    # checkpoint fetches cross the relay pipe; keep cadence low
                    "--override", "SAVE_EVERY=5000",
                    "--override", "SAMPLE_EVERY=2000"])
    print("=" * 70, "\n[2] test-mode artifacts\n", "=" * 70)
    train.main(["--cfg", out_dir, "--num_recs", "16"])
    if args.skip_attacks:
        return

    wb = ["--cfg", out_dir, "--num_tests", str(args.num_tests),
          "--rec_iters", str(args.rec_iters), "--rec_rr", str(args.rec_rr),
          "--attack_rec_iters", str(args.attack_rec_iters),
          "--model", args.model]
    print("=" * 70, "\n[3] whitebox FGSM, no defense\n", "=" * 70)
    whitebox.main([*wb, "--attack_type", "fgsm", "--defense_type", "none"])
    print("=" * 70, "\n[4] whitebox FGSM vs Defense-GAN\n", "=" * 70)
    whitebox.main([*wb, "--attack_type", "fgsm",
                   "--defense_type", "defense_gan"])
    print("=" * 70, "\n[5] whitebox RAND+FGSM vs Defense-GAN\n", "=" * 70)
    whitebox.main([*wb, "--attack_type", "rand_fgsm",
                   "--defense_type", "defense_gan"])
    if not args.skip_cw:
        print("=" * 70, "\n[5b] whitebox CW-L2 vs Defense-GAN\n", "=" * 70)
        whitebox.main([*wb, "--attack_type", "cw",
                       "--defense_type", "defense_gan",
                       "--cw_max_iterations", "100",
                       "--cw_binary_search_steps", "3",
                       "--num_tests", str(min(args.num_tests, 64))])
    print("=" * 70, "\n[6] blackbox substitute FGSM\n", "=" * 70)
    blackbox.main(["--cfg", out_dir, "--bb_model", args.model,
                   "--sub_model", "B", "--num_tests", str(args.num_tests),
                   "--rec_iters", str(args.rec_iters),
                   "--rec_rr", str(args.rec_rr)])
    print("pipeline complete; results under output/results/")


if __name__ == "__main__":
    main()
