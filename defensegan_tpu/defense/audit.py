"""Random-audit serving: serve at a cheap operating point, audit a
random subset at the security configuration.

Why this exists (RESULTS.md round 5c): the amortized-init operating
point (rec_init=encoder, R=2, L=50) serves 2.4x faster at iso-quality,
but the round-5c measurement showed it is NOT iso-security — the
"confidently wrong" detector-aware SPSA leaks 89.8% past classifier +
combined detector there, versus 22.7-26.6% at the reference (10,200)
point, because the margin feature feeds on the purifier's active
resistance to confident misclassification and that resistance is an
R*L-budget effect. The framework-level mitigation is the classic
cascade: serve every input at the cheap point, and independently
re-run a random p-fraction through the full-budget pipeline. An
attacker who tailors to the cheap config is exposed to the expensive
config's detector on every audited query; one that constrains itself
to beat BOTH configs inherits the expensive config's measured ceiling
on the audited fraction. Expected undetected-success per query:

    (1 - p) * leak_serve(attack) + p * leak_audit(attack)

where leak_audit for a cheap-tailored attack is measured by replaying
its advset at the audit config (whitebox --load_adv; round-5e leg
``r5e_escalate_flagship``). Throughput cost is serve + p * audit
(~2.1x of the full-budget pipeline at p=0.1 on the round-5b numbers)
rather than the full-budget cost on every input.

MEASURED VERDICT (round 5e, RESULTS.md): against the confident SPSA
set tailored to encoder (2,50), the (10,200) audit config's combined
detector FAILS — the replayed set keeps defended acc 0.000 and leaks
0.813 joint undetected at the audit point (vs 0.266 for an attack
crafted against (10,200) directly), so leak_per_query ~ 0.89 at
p=0.1. The cascade as-built does NOT restore the direct-attack
ceiling for that attacker; it remains useful against attackers that
only beat the serve config (e.g. plain/centered SPSA), and the
measured mitigations for the confident transfer set are tracked in
RESULTS.md round 5f (dispersion third feature at the audit;
random-init serving at the cheap budget).

No reference equivalent: kabkabm/defensegan ships no serving surface
at all (SURVEY.md section 2); this composes two DefendedPipeline
objects (defense/pipeline.py), which are themselves new machinery.

Usage:
    serve = DefendedPipeline(gan, logits_fn, detector="combined",
                             rec_rr=2, rec_iters=50, rec_init="encoder")
    audit = DefendedPipeline(gan, logits_fn, detector="combined")
    pipe = AuditedPipeline(serve, audit, audit_prob=0.1)
    pipe.calibrate(x_clean_heldout, key)   # calibrates BOTH pipelines
    out = pipe.predict(x, key)
    out.pred      # audit-config prediction on audited rows, serve's else
    out.flagged   # serve flag OR (audited AND audit flag)
    out.audited   # [N] bool — which rows took the expensive pass
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np

from defensegan_tpu.defense.pipeline import DefendedPipeline, PipelineResult


class AuditResult(NamedTuple):
    pred: np.ndarray        # [N] int32 (audit pred where audited)
    flagged: np.ndarray     # [N] bool (serve OR audit flag)
    audited: np.ndarray     # [N] bool audit-selection mask
    serve: PipelineResult   # the cheap pass on all N inputs
    audit: Optional[PipelineResult]  # the expensive pass on the subset


class AuditedPipeline:
    """Cheap-serve / random-expensive-audit cascade over two calibrated
    DefendedPipelines.

    serve / audit: DefendedPipeline instances (typically the same gan +
    logits_fn at different rec_rr/rec_iters/rec_init operating points;
    nothing requires that — detector choice may differ too).
    audit_prob: per-image probability of the expensive pass, in (0, 1].

    Audited rows report the AUDIT config's class prediction (the
    security configuration of record — this also restores its defended
    accuracy on the audited fraction) and are flagged if EITHER
    detector fires. Selection is a deterministic function of the
    predict() key, so runs reproduce.
    """

    def __init__(self, serve: DefendedPipeline, audit: DefendedPipeline,
                 audit_prob: float = 0.1):
        if not 0.0 < audit_prob <= 1.0:
            raise ValueError(f"audit_prob must be in (0, 1], "
                             f"got {audit_prob}")
        self.serve = serve
        self.audit = audit
        self.audit_prob = float(audit_prob)

    # ------------------------------------------------------------ public
    def calibrate(self, x_clean: np.ndarray,
                  key: Optional[jax.Array] = None,
                  batch_size: Optional[int] = None) -> "AuditedPipeline":
        """Calibrate both pipelines on the same held-out clean data.

        Each pipeline fits its own clean feature ECDFs/threshold under
        its own projection configuration (the serve and audit configs
        have different clean rec-err/margin distributions — RESULTS.md
        round 5b frontier)."""
        key = key if key is not None else jax.random.key(0)
        ks, ka = jax.random.split(key)
        self.serve.calibrate(x_clean, key=ks, batch_size=batch_size)
        self.audit.calibrate(x_clean, key=ka, batch_size=batch_size)
        return self

    @property
    def calibrated(self) -> bool:
        return self.serve.calibrated and self.audit.calibrated

    def predict(self, x: np.ndarray, key: Optional[jax.Array] = None,
                batch_size: Optional[int] = None) -> AuditResult:
        """Cheap pass on everything; expensive pass on a random subset."""
        if not self.calibrated:
            raise RuntimeError("call calibrate(x_clean) before predict()")
        key = key if key is not None else jax.random.key(1)
        x = np.asarray(x)
        out = self.serve.predict(x, key=key, batch_size=batch_size)
        k_sel, k_audit = jax.random.split(jax.random.fold_in(key, 0xA0D17))
        audited = np.asarray(jax.random.bernoulli(
            k_sel, self.audit_prob, (x.shape[0],)))
        pred = out.pred.copy()
        flagged = out.flagged.copy()
        audit_out = None
        if audited.any():
            audit_out = self.audit.predict(x[audited], key=k_audit,
                                           batch_size=batch_size)
            pred[audited] = audit_out.pred
            flagged[audited] |= audit_out.flagged
        return AuditResult(pred=pred, flagged=flagged, audited=audited,
                           serve=out, audit=audit_out)
