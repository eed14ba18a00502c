#!/usr/bin/env python
"""Round-2 chip queue, phase C — recovery + remainder after the phase-A
TPU-worker crash (deep-arch CW chunks of 100 iterations ran ~2 min of
device time and tripped the runtime watchdog; chunks are now 25).

  1. parity resume: f-mnist models A+B (everything else is already in
     parity_rows.jsonl — the report covers the union). Includes the
     f-mnist full-strength CW through the defense (BASELINE config 3),
     with cleverhans' abort_early.
  2. ImageNet-64 train 3000 steps + 64x64 recon bench (re-run; phase A's
     attempt died with the crashed TPU client).
  3. Phase-B steps: digits train_on_recs, 64x64 packed-vs-xla, mnist CW
     abort_early wall-clock, bench records.

Run:  python scripts/round2_queue_c.py 2>&1 | tee /tmp/round2_queue_c.log
"""

import importlib.util
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

FAILURES = []


def guarded(name, fn):
    print(f"\n{'#' * 72}\n# QUEUE-C STEP: {name}  "
          f"[{time.strftime('%H:%M:%S')}]\n{'#' * 72}", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"# DONE {name} in {time.time() - t0:.0f}s", flush=True)
    except SystemExit as e:
        code = e.code if isinstance(e.code, int) else 0
        print(f"# DONE {name} (exit {code}) in {time.time() - t0:.0f}s",
              flush=True)
        if code not in (0, None):
            FAILURES.append(name)
    except Exception:
        traceback.print_exc()
        print(f"# FAILED {name} after {time.time() - t0:.0f}s — continuing",
              flush=True)
        FAILURES.append(name)


def load_script(name):
    path = os.path.join(ROOT, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_parity_resume():
    sys.argv = ["parity.py", "--datasets", "f-mnist", "--models", "A", "B",
                "--num_tests", "512", "--cw_full_models", "A",
                "--cw_light_iterations", "200", "--cw_light_bs_steps", "4"]
    load_script("parity").main()


def main():
    qa = load_script("round2_queue")
    qb = load_script("round2_queue_b")
    guarded("parity resume: f-mnist A+B (full CW on A, chunk=25)",
            run_parity_resume)
    guarded("imagenet64 train 3000 steps + 64x64 recon bench",
            qa.run_imagenet64)
    guarded("digits train_on_recs convergence (real handwriting)",
            qb.run_digits_train_on_recs)
    guarded("64x64 projection throughput: packed vs xla",
            qb.run_64x64_throughput)
    guarded("full-strength CW + abort_early wall-clock (mnist)",
            qb.run_cw_abort_early)
    guarded("bench records (flagship + reference-depth)", qb.run_bench)
    print(f"\nQUEUE-C COMPLETE; failures: {FAILURES or 'none'}", flush=True)


if __name__ == "__main__":
    main()
