#!/usr/bin/env python
"""EXPERIMENT: v4 fused projection for 64x64 multi-deconv generators.

The full-kernel follow-up to scripts/stream64_probe.py (TODO #1 / VERDICT
round-3 item 6): run the WHOLE R x L momentum-GD projection loop for the
64x64 archs (celeba/imagenet64, deep AND wide) inside one Pallas kernel,
with every intermediate activation VMEM-resident — the "HBM-streaming
fused kernel" the round-3 trace analysis priced (XLA sits at 38-45% of
MXU peak on these stacks; ~40% of step time is f32 elementwise/convert
fusions between convs).

Design (everything reuses validated machinery):
  - every deconv level, INCLUDING the final one, is a 3x3 SAME grid-conv
    in space-to-depth form, extracted numerically by
    defense/fastgen.py::_probe_grid_conv (the v3 kernel's packing path):
      mid level:  [g, g, C_in]        -> [g, g, 4*C_out]   (then +b, relu)
      out level:  [g_f, g_f, 4*C_M]   -> [g_f, g_f, 16*out_c]
    The out-level fold composes the LAST interleave + 5x5/2 deconv into
    one grid-conv on the last mid grid (support check is asserted by the
    prober), so the deepest (4*g_f^2-slice) interleave never exists.
  - a grid-conv is 9 shift-masked matmuls on pixel-major rows
    (row = pixel*T + t), exactly kernels/fused_projection_v3.py's
    conventions (static slice+concat shifts, boundary masks, narrow-side
    shifting; pltpu.roll is avoided — known Mosaic crash);
  - between mid levels the s2d-blocked output is interleaved to the fine
    grid by 4*g^2 static [T, C] slice copies (cheap VPU moves; the
    compounding-density trap of full-stack s2d — 150 MB weights — is
    avoided because weights stay per-level);
  - backward is the transposed grid-conv chain with relu masks from
    stashed (bf16) activations; interleave inverse is the same slices
    mirrored. fc fwd/bwd is v3's per-pixel-block matmul pattern.
  - FLOP inflation vs exact deconvs is the priced 36/25 = 1.44x (9-tap
    zero-padded phase packing), carried honestly.

Numerics gate + A/B vs the XLA path (gan.reconstruct kernel="xla") at
the shipped 64x64 protocol (cfg R, L=200). The kernel lives in
kernels/fused_projection_v4.py (OPT-IN as PROJECTION_KERNEL=pallas_v4);
this script is the on-chip gate + A/B whose numbers decide whether auto
ever resolves to it (RESULTS.md records the decision).

Run:  python scripts/fused_projection_v4_exp.py --cfg output/gans/celeba
      [--batch 512] [--tile 32] [--repeats 3]
CPU:  --interpret --batch 4 --tile 2 --rec_iters 3 (tiny-dim smoke lives
      in tests/test_fused_v4.py)
"""

import argparse
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

from defensegan_tpu.kernels.fused_projection_v4 import (  # noqa: E402
    V4Pack, fused_projection_v4, make_v4_reconstructor,
    v4_kernel_available)

__all__ = ["V4Pack", "fused_projection_v4", "make_v4_reconstructor",
           "v4_kernel_available", "main"]


# ------------------------------------------------------------ experiment
def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", default="output/gans/celeba")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--rec_rr", type=int, default=None)
    ap.add_argument("--rec_iters", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--gate_batch", type=int, default=64)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--results_dir", default="output/results")
    args = ap.parse_args(argv)

    from defensegan_tpu.configs import load_config
    from defensegan_tpu.eval import tie_aware_disagreement
    from defensegan_tpu.gan import DefenseGAN

    cfg = load_config(args.cfg)
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
        print("weights: trained ckpt", flush=True)
    else:
        print("weights: random init (throughput-equivalent)", flush=True)
    rr = args.rec_rr or cfg.rec_rr
    iters = args.rec_iters or cfg.rec_iters

    run_v4 = make_v4_reconstructor(gan, rec_rr=rr, rec_iters=iters,
                                   rec_lr=cfg.rec_lr,
                                   momentum=cfg.rec_momentum,
                                   tile=args.tile,
                                   interpret=args.interpret)

    # ---- quality gate vs the XLA path, shared z0 (int8_validate pattern)
    gb = args.gate_batch
    x = jax.random.uniform(jax.random.key(7), (gb,) + cfg.image_shape,
                           jnp.float32)
    key = jax.random.key(11)
    cfg.projection_kernel = "xla"
    t0 = time.perf_counter()
    ref = gan.reconstruct(x, key)
    print(f"xla gate pass: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    got = run_v4(x, key)
    print(f"v4 gate pass (incl compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    ref_l = np.asarray(ref.all_losses)
    got_l = np.asarray(got.all_losses)
    tie = tie_aware_disagreement(ref_l, got_l)
    gate = {
        "metric": "v4_gate", "cfg": cfg.type,
        "gen_arch": cfg.gen_arch,
        "argmin_agreement": float(
            (ref_l.argmin(1) == got_l.argmin(1)).mean()),
        "material_disagreement": tie["material_disagreement"],
        "mean_regret": tie["mean_regret"],
        "best_loss_mean_xla": float(np.asarray(ref.loss).mean()),
        "best_loss_mean_v4": float(np.asarray(got.loss).mean()),
        "best_loss_absdiff_p95": float(np.percentile(
            np.abs(np.asarray(got.loss) - np.asarray(ref.loss)), 95)),
    }
    print(json.dumps(gate), flush=True)

    # ---- throughput A/B
    def bench(run, label):
        xb = jax.random.uniform(jax.random.key(0),
                                (args.batch,) + cfg.image_shape,
                                jnp.float32)
        kb = jax.random.key(1)
        t0 = time.perf_counter()
        float(jnp.sum(run(xb, kb).x_hat))
        print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            float(jnp.sum(run(xb, jax.random.fold_in(kb, i)).x_hat))
            ts.append(time.perf_counter() - t0)
        v = args.batch / min(ts)
        print(json.dumps({"metric": label,
                          "recon_per_sec": round(v, 2)}), flush=True)
        return v

    v_v4 = bench(run_v4, f"v4_{cfg.type}_{cfg.gen_arch}")
    def run_xla(xb, kb):
        return gan.reconstruct(xb, kb, rec_rr=rr, rec_iters=iters,
                               kernel="xla")
    v_xla = bench(run_xla, f"xla_{cfg.type}_{cfg.gen_arch}")
    rec = dict(gate, metric="v4_ab", batch=args.batch, tile=args.tile,
               rec_rr=rr, rec_iters=iters,
               v4_recon_per_sec=round(v_v4, 2),
               xla_recon_per_sec=round(v_xla, 2),
               speedup=round(v_v4 / v_xla, 3))
    print(json.dumps(rec), flush=True)
    if not args.interpret:
        from defensegan_tpu.utils.misc import append_jsonl, ensure_dir
        ensure_dir(args.results_dir)
        append_jsonl(os.path.join(args.results_dir, "v4_exp.jsonl"), rec)


if __name__ == "__main__":
    main()
