"""SPSA: gradient-FREE adversarial attack (Uesato et al. 2018,
arXiv:1802.05666 "Adversarial Risk and the Dangers of Evaluating Against
Weak Attacks"), pure JAX.

NOT in the reference repo — kabkabm/defensegan's whitebox.py stops at
FGSM / RAND+FGSM / CW, all gradient-based. SPSA is here because it is
the canonical attack for defenses suspected of gradient masking: it
estimates the loss gradient from finite differences of the FORWARD pass
only, so it attacks the defense exactly as deployed — the stochastic,
non-differentiable R-restart projection on its fast inference kernels —
with no BPDA surrogate, no unrolled backward, and no differentiability
requirement at all. Together with BPDA+EOT PGD (attacks/{pgd,compose}.py)
and the detection-aware/centered penalties this completes the
adaptive-attack families of the obfuscated-gradients literature:
gradient-based, transfer-based (attacks/blackbox.py), and gradient-free.

Semantics (untargeted, cleverhans SPSA lineage):
    p_0 = 0
    repeat nb_iter times, with v_k ~ Rademacher(x.shape), k = 1..n:
      ghat = mean_k [ (f(clip(x+p+delta*v_k)) - f(clip(x+p-delta*v_k)))
                      / (2*delta) * v_k ]
      p <- p + Adam(ghat)                      (ascend f)
      p <- clip(p, -eps, eps);  p <- clip(x+p, 0, 1) - x
with f a per-example scalar loss to MAXIMIZE — by default the margin
max_{i != y} z_i - z_y, whose sign is success (> 0 <=> misclassified).

Variance reduction against the STOCHASTIC defense: the +v and -v probes
of a pair are evaluated under the SAME defense PRNG key (common random
numbers — the pair's restart inits z0 are identical), so the finite
difference measures the perturbation's effect, not restart luck. Fresh
keys are drawn per (iteration, chunk), so across iterations the estimate
averages over the defense's randomness (the EOT analogue).

TPU-first design, same host-chunked shape as attacks/{cw,pgd}.py: the
loss is a HOST-level callable (it may internally dispatch the cached
projection program — DefenseGAN.reconstruct — plus a classifier program),
and each device dispatch evaluates one chunk of probe pairs as a single
big flat batch (chunk * B images), which is exactly the large-batch
regime the Pallas projection kernels are fastest in. No device program
runs longer than one chunk's projections, so the TPU watchdog is never
at risk; probe batch shapes are constant across chunks and iterations,
so each program compiles once.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

# fold_in offsets separating the three key streams (Rademacher draws,
# defense keys, the current-point eval key); chunk indices stay far below
_FOLD_RADEMACHER = 2 ** 20
_FOLD_DEFENSE = 2 ** 21
_FOLD_CURRENT = 2 ** 22

LossFn = Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray]


def margin_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-example untargeted attack objective: max_{i!=y} z_i - z_y.

    Positive iff the (defended) classifier is wrong — so it doubles as
    the SPSA success statistic (freeze_on_success).
    """
    b = logits.shape[0]
    true_logit = logits[jnp.arange(b), labels]
    masked = logits.at[jnp.arange(b), labels].set(-jnp.inf)
    return jnp.max(masked, axis=-1) - true_logit


def confident_margin_loss(logits: jnp.ndarray,
                          labels: jnp.ndarray) -> jnp.ndarray:
    """"Confidently wrong" objective: z_w - max_{j != w} z_j, where
    w = argmax_{i != y} z_i is the best WRONG class.

    The counter-attack to the two-feature detector (eval/detect.py
    combined_scores): that detector flags inputs whose PURIFIED top1-top2
    logit margin sits in the clean distribution's low tail — exactly
    where plain margin_loss leaves successful attacks (barely-flipped
    decisions). This statistic is positive iff the classifier is wrong
    AND, when positive, EQUALS the detector's own top1-top2 margin (top1
    is then w), so maximizing it drives the attack out of the low-margin
    tail while keeping it misclassified. Forward-only — SPSA needs no
    gradients through the purification.
    """
    b = logits.shape[0]
    masked = logits.at[jnp.arange(b), labels].set(-jnp.inf)
    w = jnp.argmax(masked, axis=-1)
    z_w = jnp.max(masked, axis=-1)
    rest = logits.at[jnp.arange(b), w].set(-jnp.inf)
    return z_w - jnp.max(rest, axis=-1)


def make_spsa(loss_fn: LossFn, eps: float, nb_iter: int = 40,
              n_samples: int = 32, delta: float = 0.01, lr: float = 0.01,
              chunk_samples: int = 8, clip_min: float = 0.0,
              clip_max: float = 1.0, freeze_on_success: bool = True,
              verbose: bool = False):
    """Build an SPSA attacker: returns attack(x, labels, key) -> x_adv.

    Args:
      loss_fn: per-example loss to MAXIMIZE, called as
        loss_fn(x_flat [N,H,W,C], labels_flat [N], key) -> [N]. A defended
        loss runs the real (non-differentiable) purification inside — see
        cli/whitebox.py's spsa target. Probe batches arrive pre-clipped to
        [clip_min, clip_max].
      eps: L_inf ball radius around x.
      nb_iter: SPSA iterations (Adam steps).
      n_samples: Rademacher PAIRS averaged per gradient estimate (each
        pair costs two loss evals).
      delta: finite-difference probe radius.
      lr: Adam learning rate on the perturbation.
      chunk_samples: pairs per device dispatch; each dispatch evaluates
        chunk_samples * B images per sign. When it does not divide
        n_samples, n_samples is rounded UP to the next multiple (with a
        note) so every probe batch has the SAME shape and each device
        program compiles exactly once — on this TPU stack an extra shape
        means another multi-minute remote Pallas/projection compile
        (round-4 advisor).
      freeze_on_success: stop updating examples whose current loss is
        already > 0 (margin semantics: misclassified under the attack's
        defense key). Their perturbation is kept as-is; probe cost is
        unchanged (the batch stays dense — TPU-friendly), only the update
        is masked.
      verbose: per-iteration progress + mean loss / success rate.
    """
    if n_samples < 1 or nb_iter < 1:
        raise ValueError("spsa needs n_samples >= 1 and nb_iter >= 1")
    chunk = max(1, min(chunk_samples, n_samples))
    if n_samples % chunk:
        rounded = ((n_samples + chunk - 1) // chunk) * chunk
        print(f"spsa: rounding n_samples {n_samples} up to {rounded} "
              f"(multiple of chunk_samples={chunk}; constant probe-batch "
              "shapes => one compile)", flush=True)
        n_samples = rounded

    # Adam on the perturbation, ascending the loss. Hand-rolled (three
    # jnp updates) rather than optax so the whole optimizer state is a
    # plain (m, v) pair the host loop can carry.
    b1, b2, eps_adam = 0.9, 0.999, 1e-7

    @jax.jit
    def _probes(x, p, v):
        """clip(x+p+delta*v), clip(x+p-delta*v), flattened to [S*B,...]."""
        base = x[None] + p[None]
        xp = jnp.clip(base + delta * v, clip_min, clip_max)
        xm = jnp.clip(base - delta * v, clip_min, clip_max)
        flat = (-1,) + x.shape[1:]
        return xp.reshape(flat), xm.reshape(flat)

    @jax.jit
    def _ghat_chunk(lp, lm, v):
        """Average pair estimate over this chunk: [S,B] losses -> [B,...]."""
        d = (lp - lm) / (2.0 * delta)
        return jnp.mean(d.reshape(d.shape + (1,) * (v.ndim - 2)) * v, axis=0)

    @jax.jit
    def _update(x, p, m, vv, t, ghat, frozen):
        g = -ghat  # Adam MINIMIZES; we ascend the loss
        m = b1 * m + (1 - b1) * g
        vv = b2 * vv + (1 - b2) * g * g
        mhat = m / (1 - b1 ** t)
        vhat = vv / (1 - b2 ** t)
        step = lr * mhat / (jnp.sqrt(vhat) + eps_adam)
        p_new = p - step
        p_new = jnp.clip(p_new, -eps, eps)
        p_new = jnp.clip(x + p_new, clip_min, clip_max) - x
        mask = frozen.reshape((-1,) + (1,) * (p.ndim - 1))
        return jnp.where(mask, p, p_new), m, vv

    def attack(x: jnp.ndarray, labels: jnp.ndarray,
               key: jax.Array) -> jnp.ndarray:
        if key is None:
            raise ValueError("spsa needs a PRNG key (Rademacher draws + "
                             "defense keys)")
        x = jnp.asarray(x)
        labels = jnp.asarray(labels)
        bsz = x.shape[0]
        p = jnp.zeros_like(x)
        m = jnp.zeros_like(x)
        vv = jnp.zeros_like(x)
        frozen = jnp.zeros((bsz,), bool)

        for t in range(nb_iter):
            kt = jax.random.fold_in(key, t)
            # current-point eval: success mask (freeze) + progress signal
            k_cur = jax.random.fold_in(kt, _FOLD_CURRENT)
            cur = loss_fn(jnp.clip(x + p, clip_min, clip_max), labels,
                          k_cur)
            if freeze_on_success:
                frozen = cur > 0.0
            ghat = jnp.zeros_like(x)
            done = 0
            ci = 0
            while done < n_samples:
                s = min(chunk, n_samples - done)
                kv = jax.random.fold_in(kt, _FOLD_RADEMACHER + ci)
                kd = jax.random.fold_in(kt, _FOLD_DEFENSE + ci)
                v = jax.random.rademacher(
                    kv, (s,) + x.shape, jnp.float32).astype(x.dtype)
                xp, xm = _probes(x, p, v)
                yrep = jnp.tile(labels, s)
                # SAME defense key for both signs of the pair: common
                # random numbers — identical restart z0 per position
                lp = loss_fn(xp, yrep, kd).reshape(s, bsz)
                lm = loss_fn(xm, yrep, kd).reshape(s, bsz)
                ghat = ghat + (s / n_samples) * _ghat_chunk(lp, lm, v)
                done += s
                ci += 1
            p, m, vv = _update(x, p, m, vv, jnp.float32(t + 1), ghat,
                               frozen)
            # honest barrier (CLAUDE.md): at most one iteration in flight
            float(jnp.sum(p))
            if verbose:
                print(f"  spsa iter {t + 1}/{nb_iter}: mean loss "
                      f"{float(jnp.mean(cur)):+.4f}, success "
                      f"{float(jnp.mean(cur > 0)):.3f}", flush=True)
        return jnp.clip(x + p, clip_min, clip_max)

    return attack
