"""Projected Gradient Descent (Madry et al., arXiv:1706.06083), pure JAX.

NOT in the reference repo — kabkabm/defensegan's whitebox.py stops at
FGSM / RAND+FGSM / CW. PGD is here because it is the attack that
BPDA (attacks/compose.py grad_mode="bpda") exists to power: Athalye,
Carlini & Wagner's evaluation of purification defenses (arXiv:1802.00420)
is BPDA gradients inside an iterated PGD loop, with EOT (expectation over
transformation) when the defense is randomized. A Defense-GAN serving
stack has to be able to run its OWN strongest known attack.

Semantics (untargeted):
    x_0   = clip(x + U(-eps, eps))              (rand_init, Madry)
    x_t+1 = Pi_{||.-x||_inf <= eps} clip(x_t + eps_iter * sign(g_t))
with g_t the gradient of mean cross-entropy through `logits_fn`.

Randomized-defense handling: when `keyed_logits=True`, logits_fn takes
(x, key) (the attack-through-defense target from make_attack_target) and
each PGD step evaluates it at key_i = fold_in(key, i)
(`per_step_keys=True`, the default) — every step samples fresh restart
inits, so the sign-average across steps estimates the EOT gradient with
one sample per step. `per_step_keys=False` pins one key for all steps:
the attacker optimizes a single deterministic defense instance, which the
--eval_z0 both replay leg can then reproduce exactly.

TPU-first design, same two-driver split as attacks/cw.py:
  - `pgd`: the whole attack is ONE fused lax.scan program — right when
    logits_fn is cheap (bare classifier).
  - `make_chunked_pgd`: identical math, iteration loop split into
    host-dispatched scan chunks with a host fetch between them — required
    through the defense, where one fused program of nb_iter gradients
    through the L-step projection runs for minutes and the TPU runtime
    watchdog kills it (CLAUDE.md). Batch data are ARGUMENTS of the jitted
    chunk, so one compile serves every same-shape batch.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from defensegan_tpu.attacks.fgsm import _xent

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]

# fold_in index for the rand_init noise key — far above any step index so
# the init draw can never collide with a per-step logits key
_INIT_FOLD = 2 ** 31 - 1


def _pgd_machinery(logits_fn: LogitsFn, eps: float, eps_iter: float,
                   clip_min: float, clip_max: float, targeted: bool,
                   keyed: bool, per_step_keys: bool, loss_fn=None):
    """Shared step math for the fused and chunked drivers.

    loss_fn (optional): per-example loss (x_adv, labels, key) -> [B] that
    REPLACES the default cross-entropy through logits_fn — e.g. the
    detection-aware attack loss (attacks/compose.py::make_attack_loss).
    The ascent direction maximizes its mean.

    Returns (init, step):
      init(x, key)                     rand_init start point
      step(x_adv, i, x, labels, key)   one signed-gradient step at index i
    """
    if loss_fn is not None and not keyed:
        # a caller-supplied loss receives the per-step PRNG key (defended
        # forwards sample z0 from it — attacks/compose.py); without
        # keyed_logits it would be silently called with key=None and fail
        # deep inside the trace with an opaque TypeError (round-3 advisor)
        raise ValueError(
            "loss_fn requires keyed_logits=True (the custom loss is "
            "called as loss_fn(x_adv, labels, key)); pass keyed_logits="
            "True and a PRNG key — a deterministic loss_fn may simply "
            "ignore the key")

    def loss(x_adv, labels, key):
        if loss_fn is not None:
            return jnp.mean(loss_fn(x_adv, labels, key))
        logits = logits_fn(x_adv, key) if keyed else logits_fn(x_adv)
        return jnp.mean(_xent(logits, labels))

    grad_fn = jax.grad(loss)

    def init(x, key):
        noise = jax.random.uniform(
            jax.random.fold_in(key, _INIT_FOLD), x.shape, x.dtype,
            minval=-eps, maxval=eps)
        return jnp.clip(x + noise, clip_min, clip_max)

    def step(x_adv, i, x, labels, key):
        k = None
        if keyed:
            k = jax.random.fold_in(key, i) if per_step_keys else key
        g = grad_fn(x_adv, labels, k)
        direction = -jnp.sign(g) if targeted else jnp.sign(g)
        x_adv = x_adv + eps_iter * direction
        x_adv = jnp.clip(x_adv, x - eps, x + eps)  # L_inf projection
        return jnp.clip(x_adv, clip_min, clip_max)

    return init, step


def pgd(logits_fn: LogitsFn, x: jnp.ndarray, labels: jnp.ndarray,
        eps: float, eps_iter: float, nb_iter: int,
        key: jax.Array = None, clip_min: float = 0.0,
        clip_max: float = 1.0, targeted: bool = False,
        rand_init: bool = True, keyed_logits: bool = False,
        per_step_keys: bool = True, loss_fn=None) -> jnp.ndarray:
    """PGD as one fused program. Jit-compatible; call under jax.jit.

    labels: true labels (untargeted, default) or target labels
    (targeted=True). key is required when rand_init or keyed_logits.
    loss_fn: optional per-example loss override (see _pgd_machinery) —
    the key is threaded to it per per_step_keys when keyed_logits.
    """
    if (rand_init or keyed_logits) and key is None:
        raise ValueError("pgd needs a PRNG key when rand_init=True or "
                         "keyed_logits=True")
    init, step = _pgd_machinery(logits_fn, eps, eps_iter, clip_min,
                                clip_max, targeted, keyed_logits,
                                per_step_keys, loss_fn=loss_fn)
    x_adv = init(x, key) if rand_init else x

    def body(xa, i):
        return step(xa, i, x, labels, key), None

    x_adv, _ = jax.lax.scan(body, x_adv, jnp.arange(nb_iter))
    return x_adv


def make_chunked_pgd(logits_fn: LogitsFn, eps: float, eps_iter: float,
                     nb_iter: int, targeted: bool = False,
                     rand_init: bool = True, chunk_iters: int = 10,
                     clip_min: float = 0.0, clip_max: float = 1.0,
                     keyed_logits: bool = False,
                     per_step_keys: bool = True,
                     verbose: bool = False, loss_fn=None):
    """Build a chunked PGD attacker: returns attack(x, labels[, key]) -> adv.

    Identical math to `pgd` (incl. the loss_fn override), executed as a
    host-driven sequence of scan(chunk_iters) device programs, each
    synchronized with a host fetch so no device program runs unboundedly
    long (the TPU watchdog kills multi-minute kernels). The chunk's start
    index is a traced argument, so ONE compile serves all chunks of all
    same-shape batches.
    """
    init, step = _pgd_machinery(logits_fn, eps, eps_iter, clip_min,
                                clip_max, targeted, keyed_logits,
                                per_step_keys, loss_fn=loss_fn)
    chunk = max(1, min(chunk_iters, nb_iter))

    @partial(jax.jit, static_argnames="n")
    def run_chunk(x_adv, start, x, labels, key, n):
        def body(xa, i):
            return step(xa, i, x, labels, key), None

        x_adv, _ = jax.lax.scan(body, x_adv, start + jnp.arange(n))
        return x_adv

    def attack(x: jnp.ndarray, labels: jnp.ndarray,
               key: jax.Array = None) -> jnp.ndarray:
        if (rand_init or keyed_logits) and key is None:
            raise ValueError("chunked pgd: attack(x, labels, key) needs a "
                             "PRNG key (rand_init or keyed_logits)")
        if key is None:  # unused by the traced step; jit needs a value
            key = jax.random.key(0)
        x_adv = init(x, key) if rand_init else x
        done = 0
        while done < nb_iter:
            n = min(chunk, nb_iter - done)
            x_adv = run_chunk(x_adv, jnp.int32(done), x, labels, key, n)
            # honest barrier for this tunnel (see CLAUDE.md): fetch so at
            # most one chunk is ever in flight
            float(jnp.sum(x_adv))
            done += n
            if verbose:
                print(f"  pgd iter {done}/{nb_iter}", flush=True)
        return x_adv

    return attack
