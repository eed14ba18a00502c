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


def run_steps(steps, only=(), label="queue"):
    """Run (name, fn) steps with .done markers + per-step crash isolation;
    exits 1 if any step failed (so a retry loop can resume)."""
    os.makedirs(QDIR, exist_ok=True)
    only = set(only)
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
