#!/usr/bin/env python
"""64x64 XLA-projection experiment: bf16 residual chain + unroll sweep.

Trace evidence (output/traces/p64/celeba, scripts/trace_summary.py): the
celeba projection's convolutions run near MXU peak WHILE executing, but
~40% of device time goes to bandwidth-bound elementwise/convert fusions
over [N, 64, 64, C] float32 activations (the tanh/residual/loss-grad
chain materializes f32 between conv fusions). The fused MNIST Pallas
kernels already compute exactly this chain in bf16 with f32 accumulation
— quality gated equal to f32 (int8_validate). This experiment applies the
same mixed precision at the XLA level:

  lean loss:  d = bf16(G(z)) - bf16(x); per-image loss = einsum(d, d)
              accumulated in f32. Autodiff then keeps the backward
              elementwise chain in bf16 too.

Also sweeps rec_unroll (the round-1 wide win was unroll 50) since the
elementwise/convert fusion count scales with the unrolled body.

A/B + argmin-agreement gate vs the standard path; if lean wins and gates
clean it ships as the 64x64 XLA path next.
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
from defensegan_tpu.models.generator import (from_image_space,  # noqa: E402
                                             to_image_space)


def make_lean_reconstructor(gan, *, rec_rr, rec_iters, rec_lr, momentum,
                            unroll=8):
    """XLA projection with the per-step residual/loss chain in bf16.

    Same semantics as defense/project.py::reconstruct (momentum SGD on z,
    final-loss argmin over restarts) — only the in-loop arithmetic dtype
    differs; the FINAL restart-selection losses stay f32 like the Pallas
    kernels' epilogue.
    """
    cfg = gan.cfg

    def gen_apply(z):
        return gan.generator.apply(
            {"params": gan.state.gen_params,
             "batch_stats": gan.state.gen_stats}, z, train=False)

    @jax.jit
    def run(x, key):
        from defensegan_tpu.defense.project import (ReconstructionResult,
                                                    sample_z0)
        batch = x.shape[0]
        x_tanh = from_image_space(x)
        x_flat = jnp.broadcast_to(x_tanh[:, None],
                                  (batch, rec_rr) + x_tanh.shape[1:])
        x_flat = x_flat.reshape((batch * rec_rr,) + x_tanh.shape[1:])
        x_b16 = x_flat.astype(jnp.bfloat16)
        z0 = sample_z0(key, batch, rec_rr, cfg.latent_dim)
        z_flat = z0.reshape(batch * rec_rr, cfg.latent_dim)

        def sum_loss(z):
            g16 = gen_apply(z).astype(jnp.bfloat16)
            d = (g16 - x_b16).reshape(z.shape[0], -1)
            per = jnp.einsum("nd,nd->n", d, d,
                             preferred_element_type=jnp.float32)
            return jnp.sum(per) / d.shape[1]

        grad_z = jax.grad(sum_loss)

        def step(carry, _):
            z, v = carry
            g = grad_z(z)
            v = momentum * v + g
            z = z - rec_lr * v
            return (z, v), None

        (z_fin, _), _ = jax.lax.scan(step, (z_flat,
                                            jnp.zeros_like(z_flat)),
                                     None, length=rec_iters,
                                     unroll=min(unroll, max(rec_iters, 1)))
        # f32 selection epilogue, identical to defense/project.py
        gfin = gen_apply(z_fin)
        d = (gfin - x_flat).astype(jnp.float32)
        losses = jnp.mean(jnp.square(d),
                          axis=tuple(range(1, d.ndim)))
        losses = losses.reshape(batch, rec_rr)
        best = jnp.argmin(losses, axis=1)
        z_star = z_fin.reshape(batch, rec_rr, -1)[jnp.arange(batch), best]
        x_hat = to_image_space(gen_apply(z_star))
        res = ReconstructionResult(x_hat=x_hat, z_star=z_star,
                                   loss=losses[jnp.arange(batch), best],
                                   all_losses=losses)
        return jax.tree.map(jax.lax.stop_gradient, res)

    return run


sys.path.insert(0, os.path.join(ROOT, "scripts"))
from queue_lib import bench_recon as bench  # noqa: E402  (shared timing)


def main():
    results = {}
    for name in ("celeba", "celeba_wide", "imagenet64"):
        path = os.path.join("output", "gans", name)
        if not os.path.isdir(path):
            print(f"[lean64] no {path}; skipping", flush=True)
            continue
        cfg = load_config(path)
        cfg.projection_kernel = "xla"
        gan = DefenseGAN(cfg)
        gan.load()
        kw = dict(rec_rr=cfg.rec_rr, rec_iters=cfg.rec_iters,
                  rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum)

        # quality gate: shared key, lean vs standard
        xs = jax.random.uniform(jax.random.key(7),
                                (64,) + cfg.image_shape, jnp.float32)
        key = jax.random.key(11)
        ref = gan.reconstruct(xs, key)
        lean = make_lean_reconstructor(gan, unroll=cfg.rec_unroll, **kw)
        got = lean(xs, key)
        rl = np.asarray(ref.all_losses)
        gl = np.asarray(got.all_losses)
        from defensegan_tpu.eval import tie_aware_disagreement
        m = tie_aware_disagreement(rl, gl)
        print(json.dumps({f"{name}_lean_vs_xla": {
            "argmin_agreement": float((rl.argmin(1) == gl.argmin(1))
                                      .mean()), **m,
            "best_loss_mean_xla": float(np.asarray(ref.loss).mean()),
            "best_loss_mean_lean": float(np.asarray(got.loss).mean()),
        }}), flush=True)

        batch = 256
        results[f"{name}_xla_u{cfg.rec_unroll}"] = bench(
            lambda x, k: gan.reconstruct(x, k), batch, cfg.image_shape,
            f"{name}_xla_unroll{cfg.rec_unroll}")
        for unroll in (8, 25):
            lean_u = (lean if unroll == cfg.rec_unroll
                      else make_lean_reconstructor(gan, unroll=unroll,
                                                   **kw))
            results[f"{name}_lean_u{unroll}"] = bench(
                lean_u, batch, cfg.image_shape,
                f"{name}_lean_unroll{unroll}")
    print(json.dumps({"summary": results}), flush=True)
    os.makedirs("output/results", exist_ok=True)
    with open("output/results/lean64.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
