"""GAN training / test-mode CLI.

Reference parity: train.py of kabkabm/defensegan —
  python train.py --cfg experiments/cfgs/gans/mnist.yml --is_train
trains the WGAN; without --is_train it loads the checkpoint and dumps sample
grids + test-split reconstructions (the reference's test mode).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from defensegan_tpu.cli.common import (add_cfg_args, cfg_from_args, load_data,
                                       load_gan)
from defensegan_tpu.utils.visualize import save_images


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_cfg_args(ap)
    ap.add_argument("--is_train", action="store_true",
                    help="train the GAN (otherwise: test mode)")
    ap.add_argument("--num_recs", type=int, default=16,
                    help="test mode: how many test images to reconstruct")
    ap.add_argument("--save_recs_files", action="store_true",
                    help="test mode: also dump each original and "
                    "reconstruction as its own PNG under "
                    "<output_dir>/recs/ (reference save_images_files "
                    "parity — per-image files, labels in the filename)")
    ap.add_argument("--train_encoder", action="store_true",
                    help="train the amortized-inversion encoder E(x)->z "
                    "against the trained generator and checkpoint it under "
                    "<output_dir>/encoder/ (enables REC_INIT=encoder*; "
                    "defense/encoder_init.py — a TPU-first extension, not "
                    "in the reference). Runs after --is_train training, or "
                    "standalone against the stored checkpoint.")
    args = ap.parse_args(argv)
    cfg = cfg_from_args(args)

    ds = load_data(cfg)
    if args.train_encoder and not args.is_train:
        gan = load_gan(cfg, require_trained=True)
        # uint8 stays uint8 on device (normalized per minibatch in the
        # jitted encoder step, same as gan.train)
        x_train, _ = ds.load_u8("train")
        print(f"training encoder on {x_train.shape[0]} images for "
              f"{cfg.encoder_train_iters} steps (generator frozen at step "
              f"{int(gan.state.step)})")
        m = gan.train_encoder(x_train)
        print(f"encoder done in {m['wall_s']}s: img_mse={m['img_mse']:.5f} "
              f"z_cycle={m['z_cycle']:.4f}; saved under {gan.encoder_dir}")
        return
    if args.is_train:
        gan = load_gan(cfg)
        if gan.can_load():
            print("resuming from checkpoint")
        # uint8 keeps CelebA/ImageNet-64-scale datasets 4x leaner on host
        # and in HBM; the jitted step normalizes per minibatch
        x_train, _ = ds.load_u8("train")
        print(f"training {cfg.type} WGAN-GP on {x_train.shape[0]} images "
              f"for {cfg.train_iters} generator steps")
        gan.train(x_train)
        print(f"done; checkpoints + samples under {cfg.output_dir}")
        if args.train_encoder:
            m = gan.train_encoder(x_train)
            print(f"encoder done in {m['wall_s']}s: "
                  f"img_mse={m['img_mse']:.5f} z_cycle={m['z_cycle']:.4f}")
        return

    # test mode: sample grid + test reconstructions
    gan = load_gan(cfg, require_trained=True)
    key = jax.random.key(cfg.seed + 100)
    samples = gan.generate(key, 64)
    path = save_images(np.asarray(samples),
                       os.path.join(cfg.output_dir, "test_samples.png"))
    print(f"wrote {path}")
    x_test, y_test = ds.load("test")
    x = x_test[:args.num_recs]
    res = gan.reconstruct(jax.numpy.asarray(x), key)
    pair = np.stack([x, np.asarray(res.x_hat)], axis=1).reshape(
        (-1,) + x.shape[1:])
    path = save_images(pair, os.path.join(cfg.output_dir,
                                          "test_reconstructions.png"),
                       grid=(args.num_recs, 2))
    print(f"wrote {path} (rows: original | reconstruction); "
          f"mean rec loss {float(np.mean(np.asarray(res.loss))):.5f}")
    if args.save_recs_files:
        from defensegan_tpu.utils.visualize import save_images_files

        recs_dir = os.path.join(cfg.output_dir, "recs")
        labels = np.asarray(y_test[:args.num_recs]).tolist()
        save_images_files(x, recs_dir, prefix="orig", labels=labels)
        save_images_files(np.asarray(res.x_hat), recs_dir, prefix="rec",
                          labels=labels)
        print(f"wrote {2 * len(x)} per-image PNGs under {recs_dir}/")


if __name__ == "__main__":
    main()
