"""Shared runner for the chip-queue scripts (round3_queue*.py).

Chip discipline (CLAUDE.md): one process owns the TPU; steps run
sequentially in-process (each new process pays a multi-minute session
claim); every step is crash-isolated and marked done on disk
(output/round3_queue/<name>.done), so a TPU worker crash costs one step
and a rerun resumes. Passing step names as argv runs exactly those steps,
ignoring markers.
"""

import os
import runpy
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = os.path.join("output", "round3_queue")


def run_script(path, argv):
    """Execute a repo script in-process with the given argv."""
    sys.argv = [os.path.basename(path)] + argv
    try:
        runpy.run_path(os.path.join(ROOT, path), run_name="__main__")
    except SystemExit as e:  # argparse / sys.exit(0) are fine
        if e.code not in (0, None):
            raise


def bench_recon(run_fn, batch, image_shape, label=None, repeats=3,
                print_compile=False):
    """Canonical recon/s timing for run_fn(x, key) -> ReconstructionResult.

    One warm-up call (compile), then min-of-`repeats`, each synchronized
    with a host fetch (float(jnp.sum(...))) — CLAUDE.md: on the axon
    transport block_until_ready is not an honest barrier. Shared by the
    experiment/queue scripts so the timing methodology lives in ONE place.
    """
    import jax
    import jax.numpy as jnp

    x = jax.random.uniform(jax.random.key(0), (batch,) + tuple(image_shape),
                           jnp.float32)
    k = jax.random.key(1)
    t0 = time.perf_counter()
    float(jnp.sum(run_fn(x, k).x_hat))  # compile + warm
    if print_compile:
        print(f"  [{label}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(run_fn(x, jax.random.fold_in(k, i)).x_hat))
        times.append(time.perf_counter() - t0)
    v = batch / min(times)
    if label is not None:
        import json
        print(json.dumps({"metric": label, "recon_per_sec": round(v, 2)}),
              flush=True)
    return v


def run_spec(legs, runners, only=(), label="queue", qdir=None):
    """Data-driven queue: legs are rows of a table, not one function per
    step (VERDICT round-3 weak #7 — queue files were accreting ~25
    one-shot scripts).

    legs:    iterable of dicts {"name": ..., "run": <runner key>,
             **params}; params pass to the runner as kwargs.
    runners: dict runner-key -> callable(**params).
    qdir:    override the .done-marker directory (default QDIR).
    Delegates to run_steps for markers/crash isolation/resume.
    """
    if qdir is not None:
        global QDIR
        QDIR = qdir
    steps = []
    for leg in legs:
        leg = dict(leg)
        name = leg.pop("name")
        runner = runners[leg.pop("run")]
        steps.append((name, lambda r=runner, kw=leg: r(**kw)))
    run_steps(steps, only=only, label=label)


def run_steps(steps, only=(), label="queue"):
    """Run (name, fn) steps with .done markers + per-step crash isolation;
    exits 1 if any step failed (so a retry loop can resume)."""
    os.makedirs(QDIR, exist_ok=True)
    only = set(only)
    known = {name for name, _ in steps}
    unknown = only - known
    if unknown:
        # a typo'd step name must not report a clean no-op run
        print(f"unknown step(s) {sorted(unknown)}; "
              f"available: {sorted(known)}", flush=True)
        sys.exit(2)
    failures = []
    for name, fn in steps:
        if only and name not in only:
            continue
        marker = os.path.join(QDIR, f"{name}.done")
        if os.path.exists(marker) and not only:
            print(f"== [{name}] already done, skipping", flush=True)
            continue
        print(f"\n== [{name}] start {time.strftime('%H:%M:%S')}",
              flush=True)
        t0 = time.time()
        try:
            fn()
        except KeyboardInterrupt:
            raise
        except BaseException:
            traceback.print_exc()
            failures.append(name)
            print(f"== [{name}] FAILED after {time.time()-t0:.0f}s — "
                  "continuing", flush=True)
            continue
        with open(marker, "w") as f:
            f.write(f"{time.time()-t0:.0f}s\n")
        print(f"== [{name}] done in {time.time()-t0:.0f}s", flush=True)
    print(f"\n{label} complete; failures: {failures or 'none'}", flush=True)
    sys.exit(1 if failures else 0)
