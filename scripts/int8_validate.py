#!/usr/bin/env python
"""On-chip validation + bench of the int8 fused projection (v2i).

Checks, with TRAINED mnist_fast weights when available:
  1. argmin-restart agreement vs the XLA path on shared z0 draws;
  2. best-restart loss deltas (int8 must not degrade reconstructions);
  3. throughput vs the bf16 v2 kernel at the swept-optimal batch.

Run:  python scripts/int8_validate.py 2>&1 | tee /tmp/int8_validate.log
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

from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.kernels import (  # noqa: E402
    make_pallas_dense_int8_reconstructor, make_pallas_dense_reconstructor)


def gate_ok(mat8, mat16, p95_int8, p95_bf16):
    """The int8 promotion criterion, control-relative on BOTH axes.

    - restart choice: int8's tie-aware material disagreement may not
      exceed the bf16 control's own f32-noise floor (+0.5pt slack) nor
      3% absolute;
    - best-restart loss: int8's p95 |loss - xla| may not exceed 2x the
      bf16 control's own p95 vs XLA (abs floor 1e-3 for near-exact
      controls).  Round 4 measured why this leg must be control-relative
      too: a retrained flagship ckpt put int8 at p95=1.58e-3 against the
      old absolute 1e-3 bar while every material metric matched bf16 —
      the bar was measuring the checkpoint's loss scale, not int8 error.
    """
    return (mat8 <= max(0.03, mat16 + 0.005)
            and p95_int8 <= max(1e-3, 2.0 * p95_bf16))


def bench(run, batch, image_shape, label, repeats=3):
    x = jax.random.uniform(jax.random.key(0), (batch,) + tuple(image_shape),
                           jnp.float32)
    k = jax.random.key(1)
    float(jnp.sum(run(x, k).x_hat))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run(x, jax.random.fold_in(k, i)).x_hat))
        times.append(time.perf_counter() - t0)
    v = batch / min(times)
    print(json.dumps({"metric": label, "recon_per_sec": round(v, 2)}),
          flush=True)
    return v


def main():
    cfg = load_config(os.path.join(ROOT, "defensegan_tpu", "configs",
                                   "gans", "mnist_fast.yml"))
    gan = DefenseGAN(cfg)
    trained = gan.can_load()
    if trained:
        gan.load()
    print(f"weights: {'trained ckpt' if trained else 'random init'}",
          flush=True)

    kw = dict(rec_rr=cfg.rec_rr, rec_iters=cfg.rec_iters, rec_lr=cfg.rec_lr,
              momentum=cfg.rec_momentum, tile=256)
    run_bf16 = make_pallas_dense_reconstructor(gan, **kw)
    run_int8 = make_pallas_dense_int8_reconstructor(gan, **kw)

    # ---- numerics vs the XLA path (and vs bf16 kernel), shared key
    batch = 256
    x = jax.random.uniform(jax.random.key(7), (batch,) + cfg.image_shape,
                           jnp.float32)
    key = jax.random.key(11)
    cfg.projection_kernel = "xla"
    ref = gan.reconstruct(x, key)
    got8 = run_int8(x, key)
    got16 = run_bf16(x, key)

    from defensegan_tpu.eval import tie_aware_disagreement

    ref_l = np.asarray(ref.all_losses)
    l8 = np.asarray(got8.all_losses)
    l16 = np.asarray(got16.all_losses)
    agree8 = float((ref_l.argmin(1) == l8.argmin(1)).mean())
    agree16 = float((ref_l.argmin(1) == l16.argmin(1)).mean())
    # tie-aware metric (VERDICT round-2 item 6): raw argmin disagreement
    # counts harmless ties between equal-loss restarts; material
    # disagreement charges only picks that are worse under the reference
    # losses by more than bf16 noise
    tie8 = tie_aware_disagreement(ref_l, l8)
    tie16 = tie_aware_disagreement(ref_l, l16)
    p95 = float(np.percentile(
        np.abs(np.asarray(got8.loss) - np.asarray(ref.loss)), 95))
    # the bf16 control's own loss p95 vs XLA: the noise floor a non-XLA
    # kernel pays on this checkpoint regardless of int8 quantization
    # (gate_ok's second leg compares int8 against it)
    p95_16 = float(np.percentile(
        np.abs(np.asarray(got16.loss) - np.asarray(ref.loss)), 95))
    # recon-space diagnostic (reported, not gated): how far the chosen
    # reconstruction moves, relative to the recon residual that the
    # defense itself leaves — the scale at which classifier inputs shift
    xr = np.asarray(ref.x_hat, np.float32)
    resid = float(np.mean((xr - np.asarray(x, np.float32)) ** 2))
    shift8 = float(np.mean((np.asarray(got8.x_hat, np.float32) - xr) ** 2))
    shift16 = float(np.mean((np.asarray(got16.x_hat, np.float32) - xr) ** 2))
    # --- per-checkpoint gate stamp (VERDICT round-3 item 4): persist the
    # verdict NEXT TO the checkpoint it was measured on; bench.py's auto
    # int8 promotion checks stamp.pass AND stamp.step == latest on disk,
    # so a wiped/retrained flagship degrades to bf16 until re-gated.
    # Criterion = the round-3 acceptance reasoning (RESULTS.md): int8's
    # tie-aware material disagreement must not exceed the bf16 control's
    # own f32-noise floor (+0.5pt slack) nor 3% absolute, and the
    # best-restart loss p95 delta must stay in kernel-noise range.
    if trained:
        from defensegan_tpu.ckpt import latest_step

        step = latest_step(cfg.output_dir)
        ok = gate_ok(tie8["material_disagreement"],
                     tie16["material_disagreement"], p95, p95_16)
        stamp = {
            "step": step,
            "pass": bool(ok),
            "material_disagreement_int8": tie8["material_disagreement"],
            "material_disagreement_bf16": tie16["material_disagreement"],
            "best_loss_absdiff_p95": p95,
            "best_loss_absdiff_p95_bf16_control": p95_16,
            "recon_shift_mse_int8": shift8,
            "recon_shift_mse_bf16": shift16,
            "recon_residual_mse_xla": resid,
            "criterion": ("int8 material disagreement <= max(0.03, bf16 + "
                          "0.005) and best-loss p95 delta <= max(1e-3, "
                          "2x the bf16 control's own p95 vs XLA)"),
        }
        path = os.path.join(cfg.output_dir, "checkpoints",
                            "int8_gate.json")
        with open(path, "w") as f:
            json.dump(stamp, f, indent=1)
        print(f"gate stamp ({'PASS' if ok else 'FAIL'}) -> {path}",
              flush=True)
    else:
        print("random init: NOT writing a gate stamp (gate is "
              "per-checkpoint)", flush=True)
    print(json.dumps({
        "argmin_agreement_int8_vs_xla": agree8,
        "argmin_agreement_bf16_vs_xla": agree16,
        "material_disagreement_int8_vs_xla": tie8["material_disagreement"],
        "material_disagreement_bf16_vs_xla": tie16["material_disagreement"],
        "mean_regret_int8": tie8["mean_regret"],
        "mean_regret_bf16": tie16["mean_regret"],
        "tie_tau": tie8["tau"],
        "best_loss_mean_xla": float(np.asarray(ref.loss).mean()),
        "best_loss_mean_int8": float(np.asarray(got8.loss).mean()),
        "best_loss_mean_bf16": float(np.asarray(got16.loss).mean()),
        "best_loss_absdiff_p95_int8": p95,
        "best_loss_absdiff_p95_bf16": p95_16,
        "recon_shift_mse_int8": shift8,
        "recon_shift_mse_bf16": shift16,
        "recon_residual_mse_xla": resid,
    }), flush=True)

    # ---- throughput at the swept-optimal batch
    for b in (4096, 16384):
        bench(run_bf16, b, cfg.image_shape, f"v2_bf16_batch{b}")
        bench(run_int8, b, cfg.image_shape, f"v2i_int8_batch{b}")


if __name__ == "__main__":
    main()
