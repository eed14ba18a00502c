#!/usr/bin/env python
"""64x64 projection cost decomposition (VERDICT round-2 item 4).

Question to settle with evidence: the 64x64 (CelebA / ImageNet-64) configs
run the XLA projection path — the Pallas-kernel rejection (TODO.md #2)
rests on a VMEM-sizing argument. Measure what fraction of the v5e's peaks
XLA actually reaches there: if it leaves >20% on the table, a
double-buffered streaming kernel is worth building; if not, the rejection
becomes a measured fact.

Method (same as round 1's deep-config analysis): time N projection steps
inside ONE lax.scan program (no dispatch overhead), pull FLOPs /
bytes-accessed for the single-step program from XLA's own cost model
(compiled.cost_analysis()), and report achieved TF/s and HBM GB/s against
peaks. Also times the generator forward alone (the fwd:bwd split).

v5e peaks: 197 TF/s bf16 MXU, 819 GB/s HBM (public spec).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.models.generator import from_image_space  # noqa: E402

PEAK_TFLOPS_BF16 = 197e12
PEAK_HBM_BPS = 819e9
CFG_DIR = os.path.join("defensegan_tpu", "configs", "gans")


def analyze(cfg_path, batch, rec_rr, steps, repeats=3, trace_dir=None):
    cfg = load_config(cfg_path)
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()
    n = batch * rec_rr
    print(f"== {cfg.type}: gen {cfg.gen_arch}/dim{cfg.gen_dim}, "
          f"latent {cfg.latent_dim}, batch {batch} x R={rec_rr} "
          f"=> N={n}", flush=True)

    gen_params, gen_stats = gan.state.gen_params, gan.state.gen_stats

    def gen_apply(z):
        return gan.generator.apply(
            {"params": gen_params, "batch_stats": gen_stats}, z,
            train=False)

    x = jax.random.uniform(jax.random.key(0),
                           (n,) + cfg.image_shape, jnp.float32)
    x_tanh = from_image_space(x)
    z0 = jax.random.normal(jax.random.key(1), (n, cfg.latent_dim))

    def loss(z):
        d = (gen_apply(z) - x_tanh).astype(jnp.float32)
        return jnp.sum(jnp.mean(jnp.square(d),
                                axis=tuple(range(1, d.ndim))))

    grad = jax.grad(loss)

    def one_step(carry, _):
        z, v = carry
        g = grad(z)
        v = cfg.rec_momentum * v + g
        z = z - cfg.rec_lr * v
        return (z, v), None

    def scan_prog(z0):
        (z, _), _ = jax.lax.scan(one_step, (z0, jnp.zeros_like(z0)), None,
                                 length=steps, unroll=cfg.rec_unroll)
        return z

    # XLA's own cost model for ONE step (flops + bytes accessed)
    single = jax.jit(lambda z: one_step((z, jnp.zeros_like(z)), None)[0][0])
    comp = single.lower(z0).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    fwd = jax.jit(lambda z: jnp.sum(gen_apply(z)))
    fwd_comp = fwd.lower(z0).compile()
    fca = fwd_comp.cost_analysis()
    fca = fca[0] if isinstance(fca, (list, tuple)) else fca
    fwd_flops = float(fca.get("flops", 0.0))

    run = jax.jit(scan_prog)
    float(jnp.sum(run(z0)))  # compile + warm
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run(z0)))
        times.append(time.perf_counter() - t0)
    dt = min(times) / steps  # seconds per projection step (all N latents)
    if trace_dir:
        from defensegan_tpu.utils.profiling import trace
        with trace(trace_dir):
            float(jnp.sum(run(z0)))
        print(f"trace written under {trace_dir}", flush=True)

    # forward alone, timed the same way. The carry must DEPEND on each
    # iteration's generator output or XLA legally hoists the
    # loop-invariant forward out of the loop (and 0.0*x folds away): feed
    # an epsilon-scaled reduction back into z — numerically negligible,
    # but a real data dependence the compiler cannot elide.
    def fwd_scan(z0):
        def body(z, _):
            g = gen_apply(z)
            return z + 1e-30 * jnp.sum(g), None
        out, _ = jax.lax.scan(body, z0, None, length=steps)
        return jnp.sum(out)

    frun = jax.jit(fwd_scan)
    float(frun(z0))  # compile + warm
    t0 = time.perf_counter()
    float(frun(z0))
    fdt = (time.perf_counter() - t0) / steps

    tfs = flops / dt
    gbs = bytes_acc / dt
    rec_s = batch / (dt * cfg.rec_iters)
    row = {
        "config": os.path.basename(cfg_path),
        "gen": f"{cfg.gen_arch}/dim{cfg.gen_dim}",
        "batch": batch, "rec_rr": rec_rr,
        "step_ms": round(dt * 1e3, 3),
        "fwd_ms": round(fdt * 1e3, 3),
        "flops_per_step": flops,
        "bytes_per_step": bytes_acc,
        "achieved_tflops": round(tfs / 1e12, 1),
        "mxu_peak_frac": round(tfs / PEAK_TFLOPS_BF16, 3),
        "achieved_hbm_gbps": round(gbs / 1e9, 1),
        "hbm_peak_frac": round(gbs / PEAK_HBM_BPS, 3),
        "fwd_flops_frac": round(fwd_flops / max(flops, 1), 3),
        "implied_recon_per_s_at_cfg_iters": round(rec_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", nargs="+",
                    default=["celeba.yml", "imagenet64.yml"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rec_rr", type=int, default=2)
    ap.add_argument("--steps", type=int, default=50,
                    help="projection steps per timed program (keep the "
                    "program under ~60 s of device time — TPU watchdog)")
    ap.add_argument("--out", default="output/results/profile64.json")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed scan "
                    "per config into DIR/<config>")
    args = ap.parse_args()

    rows = []
    for c in args.configs:
        path = c if os.path.exists(c) else os.path.join(CFG_DIR, c)
        tdir = (os.path.join(args.trace, os.path.basename(path)
                             .replace(".yml", "")) if args.trace else None)
        rows.append(analyze(path, args.batch, args.rec_rr, args.steps,
                            trace_dir=tdir))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")
    for r in rows:
        limiter = ("MXU" if r["mxu_peak_frac"] >= r["hbm_peak_frac"]
                   else "HBM")
        frac = max(r["mxu_peak_frac"], r["hbm_peak_frac"])
        print(f"{r['config']}: {limiter}-limited at {frac:.0%} of peak -> "
              + ("XLA near peak; Pallas rejection is a measured fact"
                 if frac >= 0.8 else
                 ">20% left on the table; a streaming kernel is worth "
                 "building"))


if __name__ == "__main__":
    main()
