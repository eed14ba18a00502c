#!/usr/bin/env python
"""Round-4 chip queue — ONE data-driven spec (VERDICT round-3 weak #7:
queue files were accreting one script per letter; from round 4 on, a
round's chip work is rows in a LEGS table on queue_lib.run_spec).

Legs, in priority order (each crash-isolated and resumable via .done
markers in output/round3_queue/ — the single marker namespace shared
with the nested round-3 queues):

  int8_gate     scripts/int8_validate.py — re-validates the int8 kernel
                on the current flagship checkpoint AND writes the
                per-checkpoint gate stamp (checkpoints/int8_gate.json)
                that bench.py's auto int8 promotion now requires.
  bench_line    python bench.py --max_wait 0 (the queue only starts when
                the backend is healthy; the probe subprocess would fight
                this process for the chip) — builder-run capture of the
                headline + deep JSON line.
  queue_t/u/v/w the four round-3 queues the 2026-08-17 TPU outage
                stranded (VERDICT item 2): two-sided detection frontier,
                paper-era grid stats, centered-penalty counter-attack,
                serving-latency curves. Committed + CPU-verified; each
                manages its own sub-step markers, so reruns resume.
  serving_ab    ShardedDefenseGAN over mesh(1) vs bare DefenseGAN at
                equal batches (VERDICT item 5): the shard_map wrapper
                overhead an operator pays on one chip. Bare control rows
                come from the same serving_bench so the pair shares a
                process/compile environment.
  stream64      the 64x64 single-level HBM-streaming fused-block probe
                (VERDICT item 6): confirm or kill the priced ~1.5x over
                deep celeba before deciding TODO #1.

Run: python scripts/round4_queue.py [only_leg ...]   (cwd=/root/repo)
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(1, os.path.join(ROOT, "scripts"))

from defensegan_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import queue_lib  # noqa: E402


def _script(path, argv=()):
    queue_lib.run_script(path, list(argv))


def _train(cfg_yml, iters, extra=()):
    queue_lib.run_script("train.py", [
        "--cfg", f"defensegan_tpu/configs/gans/{cfg_yml}", "--is_train",
        "--train_iters", str(iters),
        "--override", "SAVE_EVERY=5000", "--override", "SAMPLE_EVERY=5000",
        *extra])


RUNNERS = {"script": _script, "train": lambda **kw: _train(**kw)}

SERVING_AB = ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--batches", "256", "4096", "16384", "--repeats", "3"]

LEGS = [
    # -- retrain: output/**/checkpoints/ is gitignored, so every fresh
    # session machine starts with the GAN weights WIPED (this bit round 2
    # and again at round-4 queue start: the int8 leg came up "random
    # init").  All measurement legs below need trained weights; configs
    # are seed-0 deterministic, so retraining reproduces the wiped
    # checkpoints up to hardware reduction noise.  Iteration counts are
    # the round-2/3 measurement protocols, not the YAML maxima.
    {"name": "train_mnist_fast", "run": "train",
     "cfg_yml": "mnist_fast.yml", "iters": 20000},
    {"name": "train_mnist_deep", "run": "train",
     "cfg_yml": "mnist.yml", "iters": 20000},
    {"name": "train_digits", "run": "train",
     "cfg_yml": "digits.yml", "iters": 10000},
    {"name": "train_fmnist", "run": "train",
     "cfg_yml": "fmnist.yml", "iters": 20000},
    {"name": "train_celeba", "run": "train",
     "cfg_yml": "celeba.yml", "iters": 10000},
    {"name": "train_celeba_wide", "run": "train",
     "cfg_yml": "celeba_wide.yml", "iters": 10000},
    {"name": "train_imagenet64", "run": "train",
     "cfg_yml": "imagenet64.yml", "iters": 5000},
    {"name": "int8_gate", "run": "script",
     "path": "scripts/int8_validate.py"},
    {"name": "bench_line", "run": "script", "path": "bench.py",
     "argv": ["--max_wait", "0"]},
    {"name": "queue_t", "run": "script",
     "path": "scripts/records/round3_queue_t.py"},
    {"name": "queue_u", "run": "script",
     "path": "scripts/records/round3_queue_u.py"},
    {"name": "queue_v", "run": "script",
     "path": "scripts/records/round3_queue_v.py"},
    {"name": "queue_w", "run": "script",
     "path": "scripts/records/round3_queue_w.py"},
    {"name": "serving_ab_bare", "run": "script",
     "path": "scripts/serving_bench.py", "argv": SERVING_AB},
    {"name": "serving_ab_sharded", "run": "script",
     "path": "scripts/serving_bench.py", "argv": SERVING_AB + ["--sharded"]},
    # the R=1/L=200 fresh-z0 operating point (RESULTS.md: matches R=10 CW
    # robustness at ~10x throughput) — what a latency-bound operator runs
    {"name": "serving_r1_flagship", "run": "script",
     "path": "scripts/serving_bench.py",
     "argv": SERVING_AB + ["--rec_rr", "1"]},
    # SPSA (gradient-free, Uesato et al. 2018) through the deployed
    # non-differentiable defense — the adaptive-attack family the round-4
    # resume added. Pre-registered questions: (a) does a gradient-FREE
    # attacker beat the defense where BPDA/EOT gradients fail? (b) do its
    # adversarial examples evade the rec-error detector? Budgets sized to
    # the kernel throughput (flagship rides pallas bf16, digits xla).
    {"name": "spsa_flagship", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "256",
              "--attack_batch", "64", "--spsa_iters", "80",
              "--spsa_samples", "64", "--spsa_chunk", "8", "--detect"]},
    {"name": "spsa_digits", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "128",
              "--attack_batch", "64", "--spsa_iters", "40",
              "--spsa_samples", "32", "--spsa_chunk", "8", "--detect"]},
    # Detection-aware SPSA: the gradient-free attacker optimizes the TRUE
    # two-sided detector statistic (margin - lam*|rec_err - clean_median|)
    # with no BPDA surrogate. Pre-registered question: plain SPSA broke
    # purification (0.023) but was 100% detected; centered BPDA-PGD evaded
    # the detector but surrendered the attack (acc 1.0). Can gradient-free
    # optimization of the exact deployed statistic find the joint win
    # neither could? Centers = the clean medians the queue-V counter used.
    {"name": "spsa_da_flagship_l30", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "128",
              "--attack_batch", "64", "--spsa_iters", "80",
              "--spsa_samples", "64", "--spsa_chunk", "8",
              "--spsa_rec_penalty", "30", "--spsa_rec_center", "0.033",
              "--detect"]},
    {"name": "spsa_da_flagship_l300", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "128",
              "--attack_batch", "64", "--spsa_iters", "80",
              "--spsa_samples", "64", "--spsa_chunk", "8",
              "--spsa_rec_penalty", "300", "--spsa_rec_center", "0.033",
              "--detect"]},
    {"name": "spsa_da_digits_l30", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "128",
              "--attack_batch", "64", "--spsa_iters", "40",
              "--spsa_samples", "32", "--spsa_chunk", "8",
              "--spsa_rec_penalty", "30", "--spsa_rec_center", "0.0017",
              "--detect"]},
    # Two-feature detector (rec err + purified margin) measurement legs.
    # Pre-registered: (a) CW-on-digits is the one material joint leak
    # (10.9% two-sided) and CW's signature is exactly the low-purified-
    # margin regime — does the combined statistic close it? (b) does the
    # margin feature hold against the strongest adaptive counter (the
    # centered penalty, which beats the two-sided rec-err statistic)?
    # Whitebox legs use queue-U/V attack settings verbatim so the rows
    # are comparable cells (dedup key includes num_tests etc.).
    {"name": "cw_digits_2f", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "cw", "--num_tests", "256",
              "--classifier_epochs", "10", "--attack_rec_iters", "200",
              "--attack_batch", "128", "--cw_max_iterations", "200",
              "--cw_binary_search_steps", "4", "--cw_abort_early",
              "--cw_chunk_iters", "25", "--detect",
              "--detect_save", "output/detstats/digits_cw_2f.npz"]},
    {"name": "cw_flagship_2f", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "cw", "--num_tests", "256",
              "--classifier_epochs", "10", "--attack_rec_iters", "200",
              "--attack_batch", "128", "--cw_max_iterations", "200",
              "--cw_binary_search_steps", "4", "--cw_abort_early",
              "--cw_chunk_iters", "25", "--detect",
              "--detect_save", "output/detstats/flagship_cw_2f.npz"]},
    {"name": "pgd_cen_digits_2f", "run": "script", "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "pgd", "--num_tests", "256",
              "--classifier_epochs", "10", "--attack_rec_iters", "200",
              "--attack_batch", "128", "--fgsm_eps", "0.1",
              "--pgd_iters", "40", "--pgd_eps_iter", "0.01",
              "--attack_grad", "bpda", "--pgd_rec_penalty", "10000",
              "--pgd_rec_center", "0.0017", "--detect"]},
    # THE capstone cell: spsa_da_flagship_l300 beat BOTH rec-err layers
    # (defended 0.039, two-sided AUC 0.136, joint undetected 96.1%) — the
    # first such attack in the arms race. Re-run under the two-feature
    # code: does the purified-margin feature catch what rec-err cannot?
    # Saves the advset + detstats so the answer is re-analyzable.
    {"name": "spsa_da_flagship_l300_2f", "run": "script",
     "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/mnist_fast", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "128",
              "--attack_batch", "64", "--spsa_iters", "80",
              "--spsa_samples", "64", "--spsa_chunk", "8",
              "--spsa_rec_penalty", "300", "--spsa_rec_center", "0.033",
              "--detect",
              "--save_adv", "output/advsets/flagship_spsa_l300.npz",
              "--detect_save", "output/detstats/flagship_spsa_l300.npz"]},
    # Same centering pressure scaled to digits' ~20x smaller rec-err
    # scale (clean median 0.0017 vs flagship 0.033): does the joint
    # break generalize to the weaker GAN? (digits lam=30 left adv err 8x
    # above clean — underpowered, detector held at 0.98.)
    {"name": "spsa_da_digits_l6000_2f", "run": "script",
     "path": "whitebox.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--attack_type", "spsa", "--num_tests", "128",
              "--attack_batch", "64", "--spsa_iters", "40",
              "--spsa_samples", "32", "--spsa_chunk", "8",
              "--spsa_rec_penalty", "6000", "--spsa_rec_center", "0.0017",
              "--detect",
              "--detect_save", "output/detstats/digits_spsa_l6000.npz"]},
    {"name": "pipeline_combined_digits", "run": "script",
     "path": "scripts/pipeline_exp.py",
     "argv": ["--cfg", "output/gans/digits", "--model", "A",
              "--detector", "combined",
              "--sets", "output/advsets/digits_fgsm.npz",
              "output/advsets/digits_cw.npz",
              "output/advsets/digits_pgd.npz",
              "output/advsets/digits_pgd_pen30.npz",
              "output/advsets/digits_pgd_cen.npz"]},
    {"name": "stream64", "run": "script",
     "path": "scripts/stream64_probe.py"},
    # the full fused 64x64 projection kernel built on the probe's
    # machinery (CPU-numerics-validated, tests/test_fused_v4.py): quality
    # gate + A/B vs the XLA path on both 64x64 archs. Run AFTER stream64:
    # if the probe kills the 1.5x, these two stay pending and TODO #1
    # closes with the probe's number alone.
    {"name": "v4_celeba_deep", "run": "script",
     "path": "scripts/fused_projection_v4_exp.py",
     "argv": ["--cfg", "output/gans/celeba"]},
    {"name": "v4_celeba_wide", "run": "script",
     "path": "scripts/fused_projection_v4_exp.py",
     "argv": ["--cfg", "output/gans/celeba_wide"]},
    # imagenet64 widths (channels[0]=768) run at tile 16; only reached if
    # the celeba legs already proved v4 out
    {"name": "v4_imagenet64", "run": "script",
     "path": "scripts/fused_projection_v4_exp.py",
     "argv": ["--cfg", "output/gans/imagenet64", "--tile", "16",
              "--batch", "256"]},
]

if __name__ == "__main__":
    queue_lib.run_spec(LEGS, RUNNERS, only=sys.argv[1:],
                       label="round4 queue")
