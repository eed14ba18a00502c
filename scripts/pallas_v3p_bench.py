#!/usr/bin/env python
"""A/B: v3 (masked) vs v3p (padded-x, mask-elided) deep-kernel throughput.

VERDICT round-2 item 5: claim the deep kernel's estimated headroom (v3
ships at 1131 recon/s vs ~1200-1500 estimates) or produce a measured
bound. v3p trades +14.3% matmul rows (pixel grid 7x7 -> 7x8 with a zero
pad column) for eliminating 22 of 24 per-step boundary-mask VPU
multiplies; v3 is VPU-bound (round-2 int8 and tap-packing negatives), so
this is the predicted direction of the remaining headroom.

Protocol: same batch/key, interleaved repeats, argmin agreement + loss
deltas as the correctness gate (both against the XLA path), recon/s for
both kernels and tiles 64/128.
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
import numpy as np  # noqa: E402

from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.kernels.fused_projection_v3 import (  # noqa: E402
    make_pallas_s2d_reconstructor)
sys.path.insert(0, os.path.join(ROOT, "scripts"))
from fused_projection_v3p_exp import (  # noqa: E402
    make_pallas_s2d_padded_reconstructor)


from queue_lib import bench_recon  # noqa: E402  (shared timing)


def bench(run, batch, image_shape, label, repeats=3):
    return bench_recon(run, batch, image_shape, label=label,
                       repeats=repeats, print_compile=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = load_config(os.path.join(ROOT, "defensegan_tpu", "configs",
                                   "gans", "mnist.yml"))
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
    kw = dict(rec_rr=cfg.rec_rr, rec_iters=cfg.rec_iters, rec_lr=cfg.rec_lr,
              momentum=cfg.rec_momentum)

    # ---- correctness gate vs the XLA path (small batch, shared key)
    xs = jax.random.uniform(jax.random.key(7), (256,) + cfg.image_shape,
                            jnp.float32)
    key = jax.random.key(11)
    cfg.projection_kernel = "xla"
    ref = gan.reconstruct(xs, key)
    run_p64 = make_pallas_s2d_padded_reconstructor(gan, tile=64, **kw)
    got = run_p64(xs, key)
    ref_l = np.asarray(ref.all_losses)
    got_l = np.asarray(got.all_losses)
    from defensegan_tpu.eval import tie_aware_disagreement
    m = tie_aware_disagreement(ref_l, got_l)
    print(json.dumps({"v3p_vs_xla": {
        "argmin_agreement": float((ref_l.argmin(1) == got_l.argmin(1))
                                  .mean()),
        **m,
        "best_loss_mean_xla": float(np.asarray(ref.loss).mean()),
        "best_loss_mean_v3p": float(np.asarray(got.loss).mean()),
    }}), flush=True)

    # ---- throughput A/B, interleaved
    runs = {
        "v3_tile64": make_pallas_s2d_reconstructor(gan, tile=64, **kw),
        "v3p_tile64": run_p64,
        "v3p_tile128": make_pallas_s2d_padded_reconstructor(gan, tile=128,
                                                            **kw),
    }
    results = {}
    for name, run in runs.items():
        results[name] = bench(run, batch, cfg.image_shape,
                              f"{name}_batch{batch}")
    print(json.dumps({"summary": results, "batch": batch}), flush=True)


if __name__ == "__main__":
    main()
