#!/usr/bin/env python
"""North-star benchmark: MNIST Defense-GAN reconstructions/sec/chip.

Measures the projection defense (R=10 restarts x L=200 momentum-SGD steps
on z, argmin-restart selection — reference defaults of kabkabm/defensegan
models/gan.py::reconstruct) on the real TPU chip.

Emission contract (round-5 redesign; driver parses the LAST stdout line):
  - A SUPERVISOR process (no jax import, cannot hang on the backend)
    spawns one measurement WORKER subprocess and relays every record line
    the worker prints. An internal --deadline (default 480 s) is enforced
    by the supervisor with SIGKILL — a wedged backend claim or a slow
    Mosaic compile can no longer zero the artifact (BENCH_r03 rc=1,
    BENCH_r04 rc=124: two rounds lost to exactly that).
  - The worker measures CHEAP-FIRST and prints a cumulative JSON record
    after EVERY leg: headline XLA (seconds to compile, always lands a
    nonzero value) -> headline Pallas bf16 -> headline Pallas int8 (only
    with a passing per-checkpoint gate stamp) -> deep Pallas v3. Each
    later line strictly upgrades the record, so whatever line is last
    when time runs out is the best measurement that fit the budget.
  - If the worker dies before printing anything (backend outage), the
    supervisor retries while deadline budget remains, then emits a
    parseable diagnostic record (value 0.0) — rc stays 0. The diagnostic
    carries the worker's last stderr progress line ("last_progress"), so
    a silent kill names its stage — e.g. a worker stuck in the exclusive
    axon session claim because another process held the chip (measured
    round 5: a concurrent run zeroed a fresh bench exactly this way; the
    chip-free rerun landed the full record in 315 s).

Two configs are measured in ONE record (VERDICT round-2 item 2):
  - headline: configs/gans/mnist_fast.yml — the TPU-first flagship
    generator (GEN_ARCH=wide, GEN_DIM=16; validated defense-quality-
    equivalent to the deep reference topology, RESULTS.md). Best kernel:
    int8 v2i — int8 is opt-in in the library (auto = bf16 v2; round-2
    advisor), but the bench requests it when its per-checkpoint quality
    gate stamp (scripts/int8_validate.py -> checkpoints/int8_gate.json)
    matches the checkpoint step on disk. The gated flagship checkpoint
    (step 20000) + stamp are COMMITTED to the repo, so a fresh machine
    reproduces the int8 headline with zero manual steps (VERDICT round-4
    item 7).
  - deep: configs/gans/mnist.yml — the reference-faithful deep/dim64
    topology (latent 128, two-deconv DCGAN stack), bf16 v3 Pallas kernel,
    emitted as deep_* fields. Throughput is weight-independent (same
    FLOPs), so this leg runs random-init when no checkpoint is present.

Record schema: {"metric", "value", "unit", "vs_baseline", "gen_arch",
"gen_dim", "kernel", "deep_value", "deep_kernel", "deep_vs_baseline"}
with vs_baseline = value / 1000 (BASELINE.json: >=1000 recon/s/chip on
TPU v5e; the reference publishes no throughput numbers). Lines printed
before every leg finished carry "partial": true.

--trace <dir>: additionally capture a jax.profiler (Perfetto/XProf) trace
of one timed headline repeat (SURVEY.md section 5 tracing row).
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BASELINE_TARGET = 1000.0  # recon/s/chip, BASELINE.json rebuild target
CFG_DIR = os.path.join(ROOT, "defensegan_tpu", "configs", "gans")

# conservative wall-clock estimates (s) used by the worker to decide
# whether a leg still fits the deadline: session-warm compile + 1 warmup
# + `repeats` timed runs, measured on the round-5 machine and padded ~2x.
# First-ever Mosaic compiles go through a remote compiler and can take
# minutes; the estimates assume the kernels have compiled on this machine
# at least once before (the driver runs after a full builder session), and
# the deadline kill covers the cold case.
LEG_EST_S = {"headline_xla": 90.0, "headline_pallas": 120.0,
             "headline_int8": 120.0, "deep_pallas": 150.0}


# --------------------------------------------------------------- worker


def int8_gate_stamp(output_dir):
    """Read the per-checkpoint int8 quality-gate verdict
    (scripts/int8_validate.py writes it next to the checkpoints).

    Returns the stamp dict when it exists, passed, and was measured on
    the checkpoint step currently on disk; else None (VERDICT round-3
    item 4: a wiped-then-retrained flagship must not silently inherit
    the gated pallas_int8 request)."""
    from defensegan_tpu.ckpt import latest_step

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
    """Measure one (config, kernel) leg. Returns (recon/s, kernel, cfg).

    kernel is an EXPLICIT kernel name here (the worker's leg plan decides
    the order; there is no in-measure auto promotion any more).
    fallback_to_auto: degrade an unrunnable requested kernel to the auto
    resolution with a stderr note instead of failing the leg — used for
    the deep leg (round-3 advisor)."""
    import jax
    import jax.numpy as jnp

    from defensegan_tpu.configs import load_config
    from defensegan_tpu.gan import DefenseGAN
    from defensegan_tpu.gan.defense_gan import resolve_projection_kernel

    cfg = load_config(cfg_path, {"rec_rr": rec_rr, "rec_iters": rec_iters})
    gan = DefenseGAN(cfg)
    if gan.can_load():
        gan.load()  # trained weights when available; random init is
        # throughput-equivalent (same FLOPs) otherwise

    resolved = resolve_projection_kernel(gan, n=batch * cfg.rec_rr,
                                         requested=kernel)
    if resolved != kernel:
        if fallback_to_auto:
            resolved = resolve_projection_kernel(gan, n=batch * cfg.rec_rr,
                                                 requested="auto")
            print(f"note: kernel {kernel} not runnable for this topology/"
                  f"batch; measuring auto resolution {resolved}",
                  file=sys.stderr)
        else:
            raise RuntimeError(
                f"kernel {kernel} is not runnable for this topology/batch "
                f"(would degrade to {resolved})")
    cfg.projection_kernel = resolved  # dataclass field, reconstruct reads it

    key = jax.random.key(0)
    kx, kz = jax.random.split(key)
    x = jax.random.uniform(kx, (batch,) + cfg.image_shape, jnp.float32)

    def bench_fn(x, k):
        return gan.reconstruct(x, k).x_hat

    # Time with an honest barrier: fetch a scalar reduction of the output
    # to the host each repeat. (On some PJRT transports
    # Array.block_until_ready returns at enqueue time; a host fetch always
    # waits for completion.)
    t0 = time.perf_counter()
    float(jnp.sum(bench_fn(x, kz)))  # warmup / compile
    print(f"  [{os.path.basename(cfg_path)} {resolved}] compile+first "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

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


def run_worker(args):
    """Measure legs cheap-first; print a cumulative record after each.

    stdout carries ONLY record lines (the supervisor relays them); all
    progress goes to stderr. The deadline here is advisory (skip legs that
    can't fit); the supervisor's kill is the hard enforcement."""
    from defensegan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # Claim the backend EXPLICITLY with stage prints around it: the claim
    # blocks for minutes when another process holds the chip (the axon
    # session is exclusive), and round 5 measured exactly that failure —
    # a 480 s worker kill with no output. With these lines the
    # supervisor's diagnostic record names the stuck stage.
    deadline = (time.monotonic() + args.deadline) if args.deadline else None

    print("worker: claiming backend (blocks if another process holds "
          "the TPU)...", file=sys.stderr, flush=True)
    t0 = time.monotonic()
    import jax
    n_dev = len(jax.devices())
    print(f"worker: backend {jax.default_backend()} ({n_dev} device(s)) "
          f"claimed in {time.monotonic() - t0:.0f}s",
          file=sys.stderr, flush=True)

    def remaining():
        return float("inf") if deadline is None else deadline - time.monotonic()

    cfg_path = args.cfg or os.path.join(CFG_DIR, "mnist_fast.yml")
    record = {}
    emitted_legs = []

    def emit(partial=True):
        rec = dict(record)
        if partial:
            rec["partial"] = True
        print(json.dumps(rec), flush=True)

    def headline(value, kernel, cfg):
        v2 = round(value, 2)
        # vs_baseline recomputes exactly from the rounded emitted value
        # (round-3 advisor)
        record.update({
            "metric": "mnist_reconstructions_per_sec_per_chip",
            "value": v2,
            "unit": f"recon/s (R={args.rec_rr}, L={args.rec_iters}, "
                    f"batch={args.batch}, {kernel}, gen={cfg.gen_arch}/"
                    f"dim{cfg.gen_dim})",
            "vs_baseline": round(v2 / BASELINE_TARGET, 4),
            "gen_arch": cfg.gen_arch,
            "gen_dim": cfg.gen_dim,
            "kernel": kernel,
        })

    def deep(value, kernel, cfg):
        v2 = round(value, 2)
        record.update({
            "deep_value": v2,
            "deep_kernel": kernel,
            "deep_vs_baseline": round(v2 / BASELINE_TARGET, 4),
            "deep_unit": f"recon/s (R={args.rec_rr}, L={args.rec_iters}, "
                         f"batch={args.deep_batch}, {kernel}, "
                         f"gen={cfg.gen_arch}/dim{cfg.gen_dim})",
        })

    # leg plan, cheap-first. A leg only ever UPGRADES the record: the
    # headline legs overwrite value/kernel (xla -> pallas -> int8), the
    # deep leg adds deep_* fields. --kernel overrides the headline plan
    # with exactly one explicit leg (and the deep leg keeps auto).
    from defensegan_tpu.configs import load_config
    want_int8 = False
    if args.kernel == "auto":
        hcfg = load_config(cfg_path)
        want_int8 = (hcfg.gen_arch == "wide"
                     and int8_gate_stamp(hcfg.output_dir) is not None)
        if hcfg.gen_arch == "wide" and not want_int8:
            print("note: no passing int8 gate stamp for the checkpoint "
                  f"under {hcfg.output_dir} (run scripts/int8_validate.py); "
                  "topping out at bf16 pallas", file=sys.stderr)
        plan = [("headline_xla", "xla"), ("headline_pallas", "pallas")]
        if want_int8:
            plan.append(("headline_int8", "pallas_int8"))
    else:
        plan = [("headline_" + args.kernel, args.kernel)]
    if args.deep_cfg:
        plan.append(("deep_pallas", None))  # deep leg, auto kernel

    last_headline = [l for l, _ in plan if l.startswith("headline")][-1]
    for i, (leg, kernel) in enumerate(plan):
        est = LEG_EST_S.get(leg, 150.0)
        if i > 0 and remaining() < est:
            print(f"deadline: skipping leg {leg} (need ~{est:.0f}s, "
                  f"{remaining():.0f}s left)", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        try:
            if leg.startswith("headline"):
                v, k, cfg = measure(cfg_path, args.batch, args.rec_rr,
                                    args.rec_iters, args.repeats, kernel,
                                    trace_dir=(args.trace
                                               if leg == last_headline
                                               else None),
                                    fallback_to_auto=(args.kernel == "auto"))
                headline(v, k, cfg)
            else:
                v, k, cfg = measure(args.deep_cfg, args.deep_batch,
                                    args.rec_rr, args.rec_iters,
                                    args.repeats, "pallas",
                                    fallback_to_auto=True)
                deep(v, k, cfg)
            emitted_legs.append(leg)
        except Exception as e:  # a failed leg must not void earlier legs
            print(f"leg {leg} failed after {time.perf_counter()-t0:.0f}s: "
                  f"{e}", file=sys.stderr)
            continue
        if "value" in record and leg != plan[-1][0]:
            emit(partial=True)  # a later line strictly upgrades this one
        print(f"  leg {leg} done in {time.perf_counter()-t0:.0f}s "
              f"({remaining():.0f}s budget left)", file=sys.stderr)

    if "value" not in record:
        sys.exit(3)  # supervisor emits the diagnostic record
    emit(partial=False)  # the final, best record — the driver's line
    return 0


# ----------------------------------------------------------- supervisor


def supervise(args, argv):
    """Spawn the worker, relay its record lines, enforce the deadline.

    The supervisor never imports jax — a wedged PJRT session claim or a
    multi-minute remote Mosaic compile can only stall the WORKER, which
    gets SIGKILLed at the deadline; whatever record lines were already
    relayed stand (the driver parses the last line)."""
    deadline = time.monotonic() + args.deadline

    def remaining():
        return deadline - time.monotonic()

    last_record = None
    last_progress = [None]  # worker's last stderr line: names the stage a
    # dead-silent worker was stuck in (e.g. the exclusive-session backend
    # claim under chip contention — round 5's measured 0.0 failure mode)
    attempts = 0
    while attempts == 0 or remaining() > 5.0:
        attempts += 1
        budget = remaining()
        cmd = [sys.executable, os.path.abspath(__file__), "--_worker",
               "--deadline", f"{max(budget - 10.0, 5.0):.0f}"] + argv
        t0 = time.monotonic()
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True,
                                bufsize=1)

        def _watchdog():
            while proc.poll() is None:
                if deadline - time.monotonic() <= 0:
                    proc.kill()
                    return
                time.sleep(1.0)

        def _tee_stderr():
            for eline in proc.stderr:
                s = eline.rstrip()
                if s:
                    last_progress[0] = s
                print(eline, end="", file=sys.stderr)

        wd = threading.Thread(target=_watchdog, daemon=True)
        wd.start()
        tee = threading.Thread(target=_tee_stderr, daemon=True)
        tee.start()
        for line in proc.stdout:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                print(line, file=sys.stderr)
                continue
            last_record = rec
            print(line, flush=True)
        rc = proc.wait()
        tee.join(timeout=2.0)  # drain the final stderr lines
        killed = rc in (-9, -15)
        if last_record is not None:
            return 0
        took = time.monotonic() - t0
        if killed:
            print(f"worker killed at deadline after {took:.0f}s with no "
                  "record", file=sys.stderr)
            break
        print(f"worker attempt {attempts} exited rc={rc} after {took:.0f}s "
              "with no record; "
              + (f"retrying ({remaining():.0f}s left)" if remaining() > 60
                 else "giving up"), file=sys.stderr)
        if remaining() > 60:
            time.sleep(min(30.0, max(0.0, remaining() - 60)))
        else:
            break
    if last_record is None:
        print(json.dumps({
            "metric": "mnist_reconstructions_per_sec_per_chip",
            "value": 0.0, "unit": "recon/s", "vs_baseline": 0.0,
            "error": (f"no measurement within the {args.deadline:.0f}s "
                      f"deadline ({attempts} worker attempts)"),
            "last_progress": last_progress[0],
        }), flush=True)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
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
                    default="auto",
                    help="auto = the cheap-first upgrade ladder (xla -> "
                    "pallas -> gated int8); an explicit kernel measures "
                    "only that headline leg")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one headline "
                    "repeat into DIR (view with xprof/Perfetto)")
    ap.add_argument("--deadline", type=float,
                    default=float(os.environ.get("BENCH_DEADLINE_S", 480)),
                    help="hard wall-clock budget (s): the supervisor kills "
                    "the measurement at this point and the best record "
                    "already printed stands (0 = no deadline, worker runs "
                    "in-process)")
    args, _ = ap.parse_known_args()

    if args._worker or args.deadline == 0:
        sys.exit(run_worker(args))
    # strip --deadline/--_worker from the argv passed through to the worker
    argv = []
    skip = False
    for a in sys.argv[1:]:
        if skip:
            skip = False
            continue
        if a == "--deadline":
            skip = True
            continue
        if a.startswith("--deadline="):
            continue
        argv.append(a)
    sys.exit(supervise(args, argv))


if __name__ == "__main__":
    main()
