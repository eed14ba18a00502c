#!/usr/bin/env python
"""Round-3 chip queue H: ImageNet-64 wide-arch operating point (perf leg).

celeba_wide (RESULTS.md VERDICT#9 section) showed the one-level-shallower
wide 64x64 generator is both faster (641 vs 421 recon/s) and
defense-quality-superior on CelebA. ImageNet-64 shares the 64x64 topology
at gen_dim=96 / latent 256; this queue measures the same wide-vs-deep
throughput split there. recon/s is weight-independent (RESULTS.md), so
random-init weights suffice — no 100k-step training run is needed for
the perf leg. Quality at imagenet64 scale stays untestable offline
(synthetic 1000-class fallback; TODO.md item 4).

Run: python scripts/round3_queue_h.py  (cwd=/root/repo)
"""

import json
import sys
import os

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

from queue_lib import bench_recon, run_steps  # noqa: E402


def step_imagenet64_arch_bench():
    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN

    for arch in ("wide", "deep"):
        cfg = load_config("defensegan_tpu/configs/gans/imagenet64.yml")
        cfg.gen_arch = arch
        cfg.projection_kernel = "xla"
        gan = DefenseGAN(cfg)
        v = bench_recon(gan.reconstruct, 256, cfg.image_shape,
                        print_compile=True, label=None)
        print(json.dumps({"metric": f"imagenet64_{arch}",
                          "recon_per_sec": round(v, 2),
                          "rec_rr": cfg.rec_rr,
                          "rec_iters": cfg.rec_iters,
                          "gen_dim": cfg.gen_dim,
                          "batch": 256}), flush=True)


def step_celeba_deep_evalz0():
    # the round-2 deep-celeba quality row (clean-def 0.883 / defended
    # 0.820) predates --eval_z0; measure its fresh-vs-exact-replay split
    # under the same protocol as the celeba_wide queue-F row
    from defensegan_tpu.cli import whitebox
    whitebox.main(["--cfg", "output/gans/celeba",
                   "--attack_type", "fgsm", "--defense_type", "defense_gan",
                   "--model", "A", "--num_tests", "128",
                   "--classifier_epochs", "10",
                   "--attack_rec_iters", "25", "--attack_batch", "64",
                   "--eval_z0", "both"])


STEPS = [
    ("imagenet64_arch_bench", step_imagenet64_arch_bench),
    ("celeba_deep_evalz0", step_celeba_deep_evalz0),
]


if __name__ == "__main__":
    run_steps(STEPS, only=sys.argv[1:], label="queue H")
