#!/usr/bin/env python
"""North-star benchmark: MNIST Defense-GAN reconstructions/sec/chip.

Measures the projection defense (R=10 restarts x L=200 momentum-SGD steps on
z, argmin-restart selection — reference defaults of kabkabm/defensegan
models/gan.py::reconstruct) on the real TPU chip.

Two configs are measured in ONE run (VERDICT round-2 item 2):
  - headline: configs/gans/mnist_fast.yml — the TPU-first flagship
    generator (GEN_ARCH=wide, GEN_DIM=16; validated defense-quality-
    equivalent to the deep reference topology, RESULTS.md). Runs the int8
    v2i Pallas kernel — int8 is opt-in in the library (auto = bf16 v2;
    round-2 advisor), but the bench requests it explicitly because its
    defense-quality gate ran on exactly this checkpoint
    (scripts/int8_validate.py).
  - deep: configs/gans/mnist.yml — the reference-faithful deep/dim64
    topology (latent 128, two-deconv DCGAN stack), bf16 v3 Pallas kernel.
    Emitted as deep_value/deep_kernel/deep_vs_baseline fields so the
    driver artifact carries BOTH >=1000 numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "gen_arch",
"gen_dim", "kernel", "deep_value", "deep_kernel", "deep_vs_baseline"} where
vs_baseline is value / 1000 (the BASELINE.json target of >=1000
recon/s/chip on TPU v5e; the reference publishes no throughput numbers).

--trace <dir>: additionally capture a jax.profiler (Perfetto/XProf) trace
of one timed headline repeat (SURVEY.md section 5 tracing row).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from defensegan_tpu.ckpt import latest_step  # noqa: E402
from defensegan_tpu.configs import load_config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.gan.defense_gan import resolve_projection_kernel  # noqa: E402

BASELINE_TARGET = 1000.0  # recon/s/chip, BASELINE.json rebuild target
CFG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "defensegan_tpu", "configs", "gans")


def wait_for_backend(max_wait_s=1800, probe_timeout_s=600,
                     retry_interval_s=120):
    """Bounded probe-and-retry for the TPU backend (VERDICT round-3 item
    1b).

    The axon transport's failure mode during a service outage is a
    ~25-minute in-process hang followed by UNAVAILABLE — unrecoverable
    once THIS process has claimed the backend. So probe from a SUBPROCESS
    under `timeout` (the builder's chip_plan.sh pattern), retry every few
    minutes, and only let the main process touch the backend once a probe
    has returned healthy. Returns True when healthy; on give-up prints a
    diagnostic JSON line (so the driver artifact is parseable even in an
    outage) and returns False.
    """
    probe = ("import jax, jax.numpy as jnp; "
             "print(jax.default_backend()); "
             "print(float(jnp.sum(jnp.ones((4, 4)))))")
    deadline = time.monotonic() + max_wait_s
    attempts = 0
    while True:
        attempts += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=probe_timeout_s)
            if r.returncode == 0:
                backend = (r.stdout.splitlines() or ["?"])[0].strip()
                if attempts > 1:
                    print(f"backend {backend} healthy after {attempts} "
                          "probes", file=sys.stderr)
                return True
            err = (r.stderr or "").strip().splitlines()
            reason = err[-1][:200] if err else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"probe timed out after {probe_timeout_s}s"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(json.dumps({
                "metric": "mnist_reconstructions_per_sec_per_chip",
                "value": 0.0, "unit": "recon/s",
                "vs_baseline": 0.0,
                "error": (f"backend unavailable after {attempts} probes "
                          f"over {max_wait_s}s; last: {reason}"),
            }))
            return False
        print(f"backend probe {attempts} failed ({reason}); retrying in "
              f"{retry_interval_s}s ({remaining:.0f}s left)",
              file=sys.stderr)
        time.sleep(min(retry_interval_s, remaining))


def int8_gate_stamp(output_dir):
    """Read the per-checkpoint int8 quality-gate verdict
    (scripts/int8_validate.py writes it next to the checkpoints).

    Returns the stamp dict when it exists, passed, and was measured on
    the checkpoint step currently on disk; else None (VERDICT round-3
    item 4: a wiped-then-retrained flagship must not silently inherit
    the gated pallas_int8 request)."""
    path = os.path.join(output_dir, "checkpoints", "int8_gate.json")
    try:
        with open(path) as f:
            stamp = json.load(f)
    except (OSError, ValueError):
        return None
    if not stamp.get("pass"):
        return None
    if stamp.get("step") != latest_step(output_dir):
        return None
    return stamp


def measure(cfg_path, batch, rec_rr, rec_iters, repeats, kernel,
            trace_dir=None, fallback_to_auto=False):
    """Measure one config. Returns (recon/s, resolved_kernel, cfg).

    fallback_to_auto: degrade an explicitly requested kernel to the auto
    resolution (with a stderr note) instead of exiting — used for the
    deep side-leg so e.g. `--kernel pallas_int8` (valid for the wide
    headline, unrunnable on deep) cannot discard the whole record after
    the headline was already measured (round-3 advisor)."""
    overrides = {"rec_rr": rec_rr, "rec_iters": rec_iters}
    cfg = load_config(cfg_path, overrides)
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()  # use trained weights when available; random init is
        # throughput-equivalent (same FLOPs) otherwise

    user_explicit = kernel != "auto"
    if kernel == "auto" and jax.default_backend() in ("tpu", "axon"):
        # bench-specific default: int8 v2i for the wide flagship, but ONLY
        # when its per-checkpoint quality gate (scripts/int8_validate.py)
        # was measured on exactly the checkpoint on disk — a wiped-then-
        # retrained flagship must not inherit the int8 request without its
        # gate (VERDICT round-3 item 4). Deep stays bf16 v3 (int8 v3
        # measured slower — RESULTS.md).
        if cfg.gen_arch == "wide":
            if int8_gate_stamp(cfg.output_dir):
                kernel = "pallas_int8"
            else:
                print("note: no passing int8 gate stamp for the checkpoint "
                      f"under {cfg.output_dir} (run scripts/int8_validate.py"
                      "); measuring bf16 pallas", file=sys.stderr)
                kernel = "pallas"
        else:
            kernel = "pallas"
    # single source of truth with DefenseGAN.reconstruct — report what
    # ACTUALLY runs rather than mislabeling a silently-degraded path.
    # (auto resolving to an XLA path off-TPU is designed behavior, not a
    # degradation; the bench-default promotion above degrading is a warned
    # note — the record's `kernel` field carries what ran. But a USER-
    # requested kernel that can't run is a refusal: exiting nonzero beats
    # a headline number measured on the wrong path.)
    resolved = resolve_projection_kernel(gan, n=batch * cfg.rec_rr,
                                         requested=kernel)
    if resolved != kernel:
        if user_explicit and fallback_to_auto:
            resolved = resolve_projection_kernel(gan, n=batch * cfg.rec_rr,
                                                 requested="auto")
            print(f"note: --kernel {kernel} not runnable for this "
                  f"topology/batch; deep leg measuring auto resolution "
                  f"{resolved}", file=sys.stderr)
        elif user_explicit:
            sys.exit(f"error: --kernel {kernel} is not runnable for this "
                     f"topology/batch (would degrade to {resolved}); "
                     "change --batch/--cfg or drop --kernel")
        else:
            print(f"note: kernel={kernel} not runnable for this "
                  f"topology/batch; measuring {resolved}", file=sys.stderr)
    cfg.projection_kernel = resolved  # dataclass field, reconstruct reads it

    key = jax.random.key(0)
    kx, kz = jax.random.split(key)
    x = jax.random.uniform(kx, (batch,) + cfg.image_shape, jnp.float32)

    def bench_fn(x, k):
        return gan.reconstruct(x, k).x_hat

    # Time with an honest barrier: fetch a scalar reduction of the output to
    # the host each repeat. (On some PJRT transports Array.block_until_ready
    # returns at enqueue time; a host fetch always waits for completion.)
    float(jnp.sum(bench_fn(x, kz)))  # warmup / compile

    times = []
    for i in range(repeats):
        k = jax.random.fold_in(kz, i)
        t0 = time.perf_counter()
        float(jnp.sum(bench_fn(x, k)))
        times.append(time.perf_counter() - t0)
    if trace_dir:
        from defensegan_tpu.utils.profiling import trace
        with trace(trace_dir):
            float(jnp.sum(bench_fn(x, jax.random.fold_in(kz, 999))))
        print(f"profiler trace written under {trace_dir}", file=sys.stderr)
    return batch / min(times), resolved, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None,
                    help="config YAML or trained-run dir (default: the "
                    "shipped MNIST fast config, mnist_fast.yml)")
    ap.add_argument("--deep_cfg",
                    default=os.path.join(CFG_DIR, "mnist.yml"),
                    help="reference-faithful deep config measured alongside "
                    "the headline (emitted as deep_* fields); pass '' to "
                    "skip")
    ap.add_argument("--batch", type=int, default=16384,
                    help="16384 is the measured throughput-optimal batch "
                    "for the v2 kernels (scripts/round2_queue_d.py "
                    "occupancy sweep)")
    ap.add_argument("--deep_batch", type=int, default=4096,
                    help="v3 throughput is flat in batch (1116/1130/1135 "
                    "at 2048/4096/8192); 4096 keeps the deep leg short")
    ap.add_argument("--rec_rr", type=int, default=10)
    ap.add_argument("--rec_iters", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--kernel",
                    choices=["auto", "xla", "packed", "pallas",
                             "pallas_int8", "pallas_v4"],
                    default="auto")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one headline "
                    "repeat into DIR (view with xprof/Perfetto)")
    ap.add_argument("--max_wait", type=int, default=1800,
                    help="max seconds to probe-and-retry for a healthy "
                    "backend before emitting a diagnostic record (0 = "
                    "no probe)")
    args = ap.parse_args()

    # outage resilience BEFORE this process claims the backend (round 3's
    # BENCH artifact died on its single attempt during a service outage)
    if args.max_wait and not wait_for_backend(max_wait_s=args.max_wait):
        sys.exit(1)

    cfg_path = args.cfg or os.path.join(CFG_DIR, "mnist_fast.yml")
    value, kernel, cfg = measure(cfg_path, args.batch, args.rec_rr,
                                 args.rec_iters, args.repeats, args.kernel,
                                 trace_dir=args.trace)
    # vs_baseline is computed FROM the rounded emitted value so consumers
    # recomputing it from the record reproduce it exactly (round-3 advisor)
    v2 = round(value, 2)
    record = {
        "metric": "mnist_reconstructions_per_sec_per_chip",
        "value": v2,
        "unit": f"recon/s (R={args.rec_rr}, L={args.rec_iters}, "
                f"batch={args.batch}, {kernel}, gen={cfg.gen_arch}/"
                f"dim{cfg.gen_dim})",
        "vs_baseline": round(v2 / BASELINE_TARGET, 4),
        "gen_arch": cfg.gen_arch,
        "gen_dim": cfg.gen_dim,
        "kernel": kernel,
    }
    if args.deep_cfg:
        dv, dk, dcfg = measure(args.deep_cfg, args.deep_batch, args.rec_rr,
                               args.rec_iters, args.repeats, args.kernel,
                               fallback_to_auto=True)
        dv2 = round(dv, 2)
        record.update({
            "deep_value": dv2,
            "deep_kernel": dk,
            "deep_vs_baseline": round(dv2 / BASELINE_TARGET, 4),
            "deep_unit": f"recon/s (R={args.rec_rr}, L={args.rec_iters}, "
                         f"batch={args.deep_batch}, {dk}, "
                         f"gen={dcfg.gen_arch}/dim{dcfg.gen_dim})",
        })
    print(json.dumps(record))


if __name__ == "__main__":
    main()
