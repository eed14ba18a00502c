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
    from defensegan_tpu.defense import reconstruct, sample_z0

    if grad_mode not in ("exact", "bpda"):
        raise ValueError(f"grad_mode must be 'exact' or 'bpda', "
                         f"got {grad_mode!r}")
    L = cfg.rec_iters if rec_iters is None else rec_iters

    def attack_target(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        def gen_apply(z):
            return gan.generator.apply(
                {"params": gan.state.gen_params,
                 "batch_stats": gan.state.gen_stats}, z, train=False)

        z0 = sample_z0(key, x.shape[0], cfg.rec_rr, cfg.latent_dim)
        res = reconstruct(gen_apply, x, z0, rec_iters=L,
                          rec_lr=cfg.rec_lr, momentum=cfg.rec_momentum,
                          back_prop=(grad_mode == "exact"),
                          unroll=cfg.rec_unroll)
        x_hat = res.x_hat
        if grad_mode == "bpda":
            # straight-through identity: value = G(z*), d/dx = I
            x_hat = x + jax.lax.stop_gradient(x_hat - x)
        return logits_fn(x_hat)

    return attack_target


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
