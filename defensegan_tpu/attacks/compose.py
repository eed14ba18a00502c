"""Attack-through-defense composition + per-batch key derivation.

Single source of truth for the white-box "attack the unrolled defense"
graph (reference: whitebox.py composing the classifier with
gan.reconstruct(back_prop=True), kabkabm/defensegan whitebox.py ~L60-350)
and for the per-attack-batch RNG keys. Three call sites build this
composition (cli/whitebox.py, scripts/margin_experiment.py,
scripts/restore_exp.py), and the --eval_z0 both replay leg must reproduce
the attack graph's restart inits EXACTLY — so both the graph and the key
derivation live here, in one place, instead of being re-derived by hand
at each site.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_attack_target(gan, logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
                       cfg, rec_iters: Optional[int] = None,
                       grad_mode: str = "exact",
                       ) -> Callable[[jnp.ndarray, jax.Array], jnp.ndarray]:
    """logits(x, key) through the defense, differentiable w.r.t. x.

    grad_mode="exact" (the reference's white-box): classifier(G(z*))
    where z* comes from the R x L momentum-GD projection seeded by `key`,
    built with back_prop=True so gradients flow to x through all L
    unrolled steps. Uses cfg.rec_unroll — the same scan-unroll factor
    DefenseGAN.reconstruct uses — so the --eval_z0 both replay leg
    (pinned to rec_kernel="xla") follows the attack graph's numeric path
    exactly.

    grad_mode="bpda" (Athalye, Carlini & Wagner 2018, arXiv:1802.00420 —
    the canonical adaptive attack on obfuscated/expensive gradients; NOT
    in the reference): forward pass is the real projection, backward
    pass approximates it as the identity (straight-through:
    x + stop_grad(G(z*) − x)). The attack sees the true defended logits
    but pays no 200-step backward — crafting is ~L times cheaper, and
    for purification defenses whose output stays close to the input,
    BPDA gradients are nearly as useful as exact ones.

    Args:
      gan: a DefenseGAN (duck-typed: .generator, .state.gen_params/.gen_stats).
      logits_fn: classifier logits closure.
      cfg: Config providing rec_rr / rec_lr / rec_momentum / rec_unroll /
        latent_dim (and rec_iters when not overridden).
      rec_iters: L inside the attack graph (default cfg.rec_iters).
      grad_mode: "exact" | "bpda".
    """
    fwd = _defended_forward(gan, cfg, rec_iters, grad_mode)

    def attack_target(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        x_hat, _ = fwd(x, key)
        return logits_fn(x_hat)

    return attack_target


def _defended_forward(gan, cfg, rec_iters, grad_mode):
    """(x, key) -> (x_hat, ReconstructionResult) through the defense.

    x_hat is differentiable w.r.t. x per grad_mode (exact: unrolled
    back_prop; bpda: straight-through identity). Shared by
    make_attack_target and make_attack_loss so the two attack surfaces
    cannot drift.

    Honors cfg.rec_init: when the deployed defense initializes the
    projection from the amortized-inversion encoder
    (defense/encoder_init.py), the fully-informed attacker's graph does
    too — z0 = encoder_z0(E, x, ...) is differentiable w.r.t. x through
    E, so exact-mode gradients flow through BOTH the encoder and the
    unrolled projection (bpda mode is unchanged: forward real, backward
    identity)."""
    from defensegan_tpu.defense import reconstruct, sample_z0

    if grad_mode not in ("exact", "bpda"):
        raise ValueError(f"grad_mode must be 'exact' or 'bpda', "
                         f"got {grad_mode!r}")
    L = cfg.rec_iters if rec_iters is None else rec_iters

    rec_init = getattr(cfg, "rec_init", "random")
    if rec_init != "random":
        from defensegan_tpu.defense import encoder_z0
        if gan.enc_params is None:
            gan.load_encoder()          # eager host IO, outside the trace
        encoder = gan._build_encoder()
        enc_params = gan.enc_params

    def fwd(x: jnp.ndarray, key: jax.Array):
        def gen_apply(z):
            return gan.generator.apply(
                {"params": gan.state.gen_params,
                 "batch_stats": gan.state.gen_stats}, z, train=False)

        if rec_init == "random":
            z0 = sample_z0(key, x.shape[0], cfg.rec_rr, cfg.latent_dim)
        else:
            def enc_apply(x_tanh):
                return encoder.apply({"params": enc_params}, x_tanh)
            z0 = encoder_z0(enc_apply, x, key, rec_rr=cfg.rec_rr,
                            mode=rec_init, sigma=cfg.encoder_sigma)
        res = reconstruct(gen_apply, x, z0, rec_iters=L,
                          rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum,
                          back_prop=(grad_mode == "exact"),
                          unroll=cfg.rec_unroll)
        x_hat = res.x_hat
        if grad_mode == "bpda":
            # straight-through identity: value = G(z*), d/dx = I
            x_hat = x + jax.lax.stop_gradient(x_hat - x)
        return x_hat, res

    return fwd


def make_attack_loss(gan, logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
                     cfg, rec_iters: Optional[int] = None,
                     grad_mode: str = "exact", rec_penalty: float = 0.0,
                     rec_center: Optional[float] = None,
                     ) -> Callable[[jnp.ndarray, jnp.ndarray, jax.Array],
                                   jnp.ndarray]:
    """Per-example attack loss through the defense, for loss-driven
    attackers (PGD's loss_fn hook):

        loss(x, labels, key) = xent(classifier(G(z*)), labels)
                               - rec_penalty * penalty(rec_loss(x))  [B]

    rec_penalty > 0 is the DETECTION-AWARE adaptive attack (the
    Carlini-Wagner adaptive-evaluation move; far beyond the reference):
    the rec-error detector (eval/detect.py) thresholds the final
    projection loss, so a detection-aware attacker must maximize
    classification damage while keeping that statistic at clean levels.
    rec_loss is the detector's exact statistic (tanh-space best-restart
    MSE, defense/project.py::ReconstructionResult.loss).

    rec_center=None targets the ONE-SIDED detector: penalty = rec (push
    rec error down). But queue S showed that over-shooting makes rec err
    drop 100x BELOW clean — itself a signature the two-sided detector
    (|rec - clean median|) catches. rec_center=c is the attacker's
    counter to THAT: penalty = (rec - c)^2 steers the statistic TO the
    clean median instead of past it (the attacker knows the detector,
    so c = the published calibration center).

    Gradient of the penalty: exact mode differentiates res.loss through
    the unrolled projection; bpda mode uses the BPDA of the statistic
    itself — G(z*) held constant, d rec/dx = 2(x_tanh - G(z*))/D (the
    same straight-through logic as the logits path).
    """
    from defensegan_tpu.attacks.fgsm import _xent
    from defensegan_tpu.models.generator import from_image_space

    fwd = _defended_forward(gan, cfg, rec_iters, grad_mode)

    def attack_loss(x: jnp.ndarray, labels: jnp.ndarray,
                    key: jax.Array) -> jnp.ndarray:
        x_hat, res = fwd(x, key)
        loss = _xent(logits_fn(x_hat), labels)
        if rec_penalty:
            if grad_mode == "exact":
                rec = res.loss
            else:
                t_x = from_image_space(x)
                t_hat = jax.lax.stop_gradient(from_image_space(res.x_hat))
                d = (t_x - t_hat).astype(jnp.float32)
                rec = jnp.mean(jnp.square(d),
                               axis=tuple(range(1, d.ndim)))
            pen = rec if rec_center is None else jnp.square(rec - rec_center)
            loss = loss - rec_penalty * pen
        return loss

    return attack_loss


def eot_over_keys(attack_target: Callable[[jnp.ndarray, jax.Array],
                                          jnp.ndarray],
                  k_eot: int) -> Callable[[jnp.ndarray, jax.Array],
                                          jnp.ndarray]:
    """EOT over projection keys: mean defended logits across k_eot keys.

    The counter-attack to K-pass serving (DefendedPipeline detect_passes /
    vote=True). A single-key through-defense attack optimizes ONE draw of
    the restart lottery, so its successes can be key-UNstable — on digits
    CW, majority vote across 8 projection keys recovers ~21% of the
    residual errors (RESULTS.md round 5). This wrapper is the
    expectation-over-transformation move (Athalye et al. 2018,
    arXiv:1707.07397) with the projection key as the transformation: each
    attack evaluation differentiates through k_eot independent unrolled
    projections and averages the LOGITS, so a found adversary must beat
    the restart lottery in expectation — exactly the quantity
    majority-vote serving measures.

    Costs k_eot x the single-key graph per evaluation; the k_eot
    projections run batched (vmap), not sequential, so the attacker pays
    memory rather than latency where the batch still fits.
    """
    if k_eot <= 1:
        return attack_target

    def eot_target(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        keys = jax.random.split(key, k_eot)
        logits = jax.vmap(lambda kk: attack_target(x, kk))(keys)
        return jnp.mean(logits, axis=0)

    return eot_target


def attack_batch_key(k_att: jax.Array, lo: int) -> jax.Array:
    """Key handed to the attack for the batch starting at element offset lo."""
    return jax.random.fold_in(k_att, lo)


def split_rand_fgsm_key(k: jax.Array):
    """rand_fgsm consumes two keys per batch: (z0-restart key, noise key).

    The split lives HERE so the craft path and the replay leg cannot
    drift: rand_fgsm crafting uses both halves, `attack_z0_key` replays
    the first.
    """
    kz, kn = jax.random.split(k)
    return kz, kn


def attack_z0_key(k_att: jax.Array, lo: int, attack_type: str) -> jax.Array:
    """The restart-init key the attack graph consumed for batch offset lo.

    The --eval_z0 both replay leg feeds this to model_eval_gan's key_fn so
    the defended eval reuses the attacker's exact z0.
    """
    k = attack_batch_key(k_att, lo)
    if attack_type == "rand_fgsm":
        k, _ = split_rand_fgsm_key(k)
    return k
