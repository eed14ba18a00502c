"""Defense-in-depth serving pipeline: purify -> classify -> flag.

The round-3 measurements (RESULTS.md, queues O-T) show the two defense
layers are complementary: PGD-class attacks zero the purifier but are
perfectly detected (AUC 1.000); CW-class attacks evade detection
(0.69-0.83 AUC) but are purified (0.87-1.00 defended); and a
detection-aware attacker who ducks under the detector gives back most of
the classification damage. Deployment therefore wants BOTH layers on
every input — this module is that object.

The reference (kabkabm/defensegan) has no serving surface at all: its
whitebox.py evaluates accuracy and the paper's section-5.1 detector was
never shipped. Here the two layers share ONE projection pass per input
(the reconstruction that purifies is the same computation whose final
loss is the detection statistic), so detection is free at serving time —
whereas the eval CLIs, which keep clean/adv scoring paired, pay it
separately.

Usage:
    pipe = DefendedPipeline(gan, logits_fn, fpr=0.05)
    pipe.calibrate(x_clean_heldout, key)      # clean rec-err quantiles
    out = pipe.predict(x, key)                # PipelineResult
    out.pred     # [N] int class predictions (on purified inputs)
    out.flagged  # [N] bool — rec error atypical vs the clean calibration
    out.rec_err  # [N] float32 detection statistic

Detector choices: "two_sided" (default; |err - clean median| — robust to
rec-penalty attacks that push errors BELOW clean, eval/detect.py),
"one_sided" (the paper's "adversarial = high rec error"), "combined"
(two-feature: max of two-sided rec-err atypicality and low-tail
PURIFIED-margin atypicality, both clean-ECDF-calibrated — targets
minimum-distortion attacks like CW that stay near the manifold but
barely flip the decision; eval/detect.py::combined_scores), or
"combined3" (adds the restart-dispersion feature: two-sided atypicality
of the R restart finals' winner-normalized spread,
eval/detect.py::restart_dispersion — the side channel a detection-aware
attacker does not directly optimize when centering the winning loss),
or "margin" (the purified-margin feature ALONE — the measured detector
floor against center-dispersing attackers, RESULTS.md round-5 learned-
combiner analysis: beats the max combiner on the confident-SPSA cells,
0.141 vs 0.227 joint leak, but surrenders the rec-err layer that closes
the weak-centered and plain-SPSA cells at 0.000; an operator choice for
deployments that expect fully detector-aware attackers).
The margin feature reuses the logits the pipeline computes anyway, and
the dispersion feature reuses the projection's per-restart losses, so
both cost nothing extra at serving time.

Calibrate on held-out clean data FROM THE SERVING DISTRIBUTION: round-4
measured a 23.4% clean flag rate at a 5% FPR target when the margin
ECDF was calibrated on train-tail images (optimistically high purified
margins) — see scripts/pipeline_exp.py --calib_source.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PipelineResult(NamedTuple):
    pred: np.ndarray      # [N] int32 argmax class on the purified input
    flagged: np.ndarray   # [N] bool detection decision (True = reject)
    rec_err: np.ndarray   # [N] float final projection loss (the statistic)
    margin: np.ndarray    # [N] float purified top1-top2 logit margin
    dispersion: np.ndarray  # [N] float restart-dispersion statistic


class DefendedPipeline:
    """Calibrated purify+classify+detect over a trained DefenseGAN.

    gan: DefenseGAN with loaded weights. logits_fn: classifier on [0,1]
    NHWC images. fpr: target false-positive rate the clean calibration
    set is thresholded at. detector: "two_sided" | "one_sided".

    rec_* / kernel overrides pass straight to gan.reconstruct (the full
    override set, same semantics as eval/accuracy.py::model_eval_gan).
    """

    def __init__(self, gan, logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
                 fpr: float = 0.05, detector: str = "two_sided",
                 rec_rr: Optional[int] = None,
                 rec_iters: Optional[int] = None,
                 rec_lr: Optional[float] = None,
                 rec_kernel: Optional[str] = None,
                 rec_init: Optional[str] = None,
                 dispersion_kind: str = "rel_gap",
                 detect_passes: int = 1,
                 vote: bool = False):
        if detector not in ("two_sided", "one_sided", "combined",
                            "combined3", "margin"):
            raise ValueError(f"unknown detector {detector!r}")
        if not 0.0 < fpr < 1.0:
            raise ValueError(f"fpr must be in (0, 1), got {fpr}")
        if detect_passes < 1:
            raise ValueError(f"detect_passes must be >= 1, "
                             f"got {detect_passes}")
        if vote and detect_passes < 2:
            raise ValueError("vote=True needs detect_passes >= 2 "
                             "(majority voting over K projection passes)")
        self.gan = gan
        self.logits_fn = logits_fn
        self.fpr = float(fpr)
        self.detector = detector
        self.dispersion_kind = dispersion_kind
        # K-pass detection (round-5 variance lever): a detection-aware
        # attacker optimizes the EXPECTED detector statistics over
        # projection keys; averaging the features of K independent
        # projection passes shrinks both classes' spread ~sqrt(K) around
        # means the attack could only partially move. Costs K projection
        # passes per input; the class prediction stays pass-0's (the
        # configuration the offline K-sweep measures —
        # scripts/kpass_analysis.py). detect_passes=1 reproduces the
        # single-pass pipeline bit-for-bit.
        self.detect_passes = int(detect_passes)
        # vote=True: class prediction = majority vote of the K passes'
        # purified argmaxes (ties -> pass 0), instead of pass-0 alone.
        # Measured (RESULTS.md round-5 vote analysis): recovers ~21% of
        # CW-on-digits' residual errors (defended acc 0.836 -> 0.871 at
        # K=8) because CW successes are partly key-UNstable; a no-op
        # against the key-stable tailored-SPSA attacks. Opt-in because
        # the accuracy win is attack-dependent and K passes cost Kx.
        self.vote = bool(vote)
        # rec_init="encoder"/"encoder_jitter": amortized-init serving fast
        # path (defense/encoder_init.py) — typically paired with small
        # rec_rr/rec_iters; calibrate() under the SAME settings, so the
        # clean feature distributions match the serving configuration.
        self._rec = dict(rec_rr=rec_rr, rec_iters=rec_iters, rec_lr=rec_lr,
                         rec_kernel=rec_kernel, rec_init=rec_init)
        self._center: Optional[float] = None      # clean rec-err median
        self._threshold: Optional[float] = None   # detector score cutoff
        self._errs_calib: Optional[np.ndarray] = None    # combined: ECDFs
        self._margins_calib: Optional[np.ndarray] = None
        self._disp_calib: Optional[np.ndarray] = None    # combined3

        @jax.jit
        def _pred(x_hat):
            logits = logits_fn(x_hat)
            top2 = jax.lax.top_k(logits, 2)[0]
            return jnp.argmax(logits, axis=-1), top2[:, 0] - top2[:, 1]

        self._pred = _pred

    # ------------------------------------------------------------ internals
    def _scores(self, errs: np.ndarray,
                margins: Optional[np.ndarray] = None,
                dispersion: Optional[np.ndarray] = None) -> np.ndarray:
        if self.detector in ("combined", "combined3"):
            from defensegan_tpu.eval.detect import multi_feature_scores
            features = [(errs, self._errs_calib, "two_sided"),
                        (margins, self._margins_calib, "low")]
            if self.detector == "combined3":
                features.append((dispersion, self._disp_calib, "two_sided"))
            return multi_feature_scores(features)
        if self.detector == "margin":
            from defensegan_tpu.eval.detect import ecdf_atypicality
            return ecdf_atypicality(margins, self._margins_calib, "low")
        if self.detector == "two_sided":
            return np.abs(errs - self._center)
        return errs

    def _run_once(self, x: np.ndarray, key: jax.Array,
                  batch_size: Optional[int]):
        """One shared projection pass: (preds, rec_errs, margins,
        dispersion).

        Batching/padding/keys ride eval/accuracy.py::batched_reconstruct
        — the same loop the offline eval and detector use."""
        from defensegan_tpu.eval.accuracy import batched_reconstruct
        from defensegan_tpu.eval.detect import restart_dispersion

        preds, errs, margins, disps = [], [], [], []
        for res, lo, hi in batched_reconstruct(self.gan, x, key=key,
                                               batch_size=batch_size,
                                               **self._rec):
            pb, mb = self._pred(res.x_hat)
            preds.append(np.asarray(pb)[:hi - lo])
            margins.append(np.asarray(mb, np.float64)[:hi - lo])
            errs.append(np.asarray(res.loss, np.float64)[:hi - lo])
            al = np.asarray(res.all_losses, np.float64)[:hi - lo]
            disps.append(restart_dispersion(al, self.dispersion_kind))
        return (np.concatenate(preds), np.concatenate(errs),
                np.concatenate(margins), np.concatenate(disps))

    def _run(self, x: np.ndarray, key: jax.Array,
             batch_size: Optional[int]):
        """detect_passes independent projection passes; detection
        features averaged across passes, class prediction from pass 0
        (whose key is `key` itself, so detect_passes=1 is the historical
        single-pass pipeline exactly) — or the K-pass majority vote when
        vote=True (ties break toward pass 0)."""
        preds, errs, margins, disps = self._run_once(x, key, batch_size)
        if self.detect_passes == 1:
            return preds, errs, margins, disps
        preds_acc = [preds]
        errs_acc, marg_acc, disp_acc = [errs], [margins], [disps]
        for p in range(1, self.detect_passes):
            pp, e, m, d = self._run_once(x, jax.random.fold_in(key, p),
                                         batch_size)
            preds_acc.append(pp)
            errs_acc.append(e)
            marg_acc.append(m)
            disp_acc.append(d)
        if self.vote:
            from defensegan_tpu.eval.detect import majority_vote
            preds, _ = majority_vote(np.stack(preds_acc))
        return (preds, np.mean(errs_acc, axis=0),
                np.mean(marg_acc, axis=0), np.mean(disp_acc, axis=0))

    # ------------------------------------------------------------ public
    def calibrate(self, x_clean: np.ndarray,
                  key: Optional[jax.Array] = None,
                  batch_size: Optional[int] = None) -> "DefendedPipeline":
        """Fit the detection threshold on held-out CLEAN data.

        Stores the clean rec-err median (two-sided center) and the
        (1 - fpr) quantile of the detector scores — everything an
        operator can measure at deployment without any attack data.
        Returns self (chainable).
        """
        key = key if key is not None else jax.random.key(0)
        _, errs, margins, disps = self._run(np.asarray(x_clean), key,
                                            batch_size)
        self._center = float(np.median(errs))
        if self.detector in ("combined", "combined3", "margin"):
            # the ECDF calibration tables ARE the detector (sorted clean
            # feature samples); the threshold is the (1-fpr) quantile of
            # the clean combined score — all clean-data-only statistics
            self._errs_calib = np.sort(errs)
            self._margins_calib = np.sort(margins)
            if self.detector == "combined3":
                self._disp_calib = np.sort(disps)
        self._threshold = float(np.quantile(
            self._scores(errs, margins, disps), 1.0 - self.fpr))
        return self

    @property
    def calibrated(self) -> bool:
        return self._threshold is not None

    def predict(self, x: np.ndarray, key: Optional[jax.Array] = None,
                batch_size: Optional[int] = None) -> PipelineResult:
        """Purify, classify, and flag — one projection pass per input."""
        if not self.calibrated:
            raise RuntimeError("call calibrate(x_clean) before predict() — "
                               "the detector threshold is fit on clean data")
        key = key if key is not None else jax.random.key(1)
        preds, errs, margins, disps = self._run(np.asarray(x), key,
                                                batch_size)
        flagged = self._scores(errs, margins, disps) > self._threshold
        return PipelineResult(pred=preds.astype(np.int32), flagged=flagged,
                              rec_err=errs.astype(np.float32),
                              margin=margins.astype(np.float32),
                              dispersion=disps.astype(np.float32))
