"""Carlini-Wagner L2 attack, pure JAX.

Reference parity: cleverhans v2.x CarliniWagnerL2 as used by whitebox.py of
kabkabm/defensegan (--attack_type cw). Semantics follow Carlini & Wagner,
"Towards Evaluating the Robustness of Neural Networks" (arXiv:1608.04644):

  - change of variables: x' = (tanh(w) + 1)/2 scaled to [clip_min, clip_max],
    optimizing w = modifier + arctanh-image so box constraints are implicit;
  - objective: ||x' - x||_2^2 + c * f(x'), with the hinge
    f(x') = max(Z_y - max_{i != y} Z_i + confidence, 0)   (untargeted)
  - Adam on the modifier, `max_iterations` inner steps;
  - outer binary search (`binary_search_steps`) over the constant c with
    per-example bounds, keeping the successful adversary of minimum L2.

Defaults mirror cleverhans v2.x (binary_search_steps=5, max_iterations=1000,
learning_rate=5e-3, initial_const=1e-2, confidence=0); exact reference values
are [M-lo] in SURVEY.md — all knobs are explicit here.

TPU-first design: both loops are on-device (`lax.scan` over iterations inside
a scan over binary-search steps), vectorized across the batch with
per-example constants — the whole attack is ONE compiled XLA program, vs
cleverhans' per-iteration sess.run round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


class CWConfig(NamedTuple):
    binary_search_steps: int = 5
    max_iterations: int = 1000
    learning_rate: float = 5e-3
    initial_const: float = 1e-2
    confidence: float = 0.0
    clip_min: float = 0.0
    clip_max: float = 1.0
    # cleverhans repeats the last bs step with c = upper bound; covered by
    # the standard bounds-update below.


def _to_tanh_space(x, cfg: CWConfig):
    x01 = (x - cfg.clip_min) / (cfg.clip_max - cfg.clip_min)
    x01 = jnp.clip(x01, 1e-6, 1.0 - 1e-6)
    return jnp.arctanh(x01 * 2.0 - 1.0)


def _from_tanh_space(w, cfg: CWConfig):
    x01 = (jnp.tanh(w) + 1.0) * 0.5
    return x01 * (cfg.clip_max - cfg.clip_min) + cfg.clip_min


def carlini_wagner_l2(logits_fn: LogitsFn, x: jnp.ndarray,
                      labels: jnp.ndarray,
                      cfg: CWConfig = CWConfig(),
                      targeted: bool = False) -> jnp.ndarray:
    """CW-L2. Returns adversarial examples (x where none found).

    labels: true labels (untargeted, default — the paper's setting) or
    target labels (targeted=True, cleverhans CarliniWagnerL2 y_target).
    """
    batch = x.shape[0]
    num_classes_probe = logits_fn(x[:1])
    num_classes = num_classes_probe.shape[-1]
    y_onehot = jax.nn.one_hot(labels, num_classes)

    w0 = _to_tanh_space(x, cfg)
    sum_axes = tuple(range(1, x.ndim))

    def _margins(logits):
        z_lab = jnp.sum(logits * y_onehot, axis=-1)
        z_other = jnp.max(logits - y_onehot * 1e9, axis=-1)
        return z_lab, z_other

    def attack_succeeds(logits):
        z_lab, z_other = _margins(logits)
        if targeted:   # reach the target label with margin
            return z_lab - z_other > cfg.confidence
        return z_other - z_lab > cfg.confidence

    def hinge(logits):
        z_lab, z_other = _margins(logits)
        if targeted:
            return jnp.maximum(z_other - z_lab + cfg.confidence, 0.0)
        return jnp.maximum(z_lab - z_other + cfg.confidence, 0.0)

    opt = optax.adam(cfg.learning_rate)

    def inner_opt(c):
        """Run max_iterations Adam steps at per-example constants c [B]."""
        modifier0 = jnp.zeros_like(w0)

        def loss_fn(modifier):
            x_adv = _from_tanh_space(w0 + modifier, cfg)
            logits = logits_fn(x_adv)
            l2 = jnp.sum(jnp.square(x_adv - x), axis=sum_axes)
            per_ex = l2 + c * hinge(logits)
            return jnp.sum(per_ex), (x_adv, logits, l2)

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def step(carry, _):
            modifier, opt_state, best_l2, best_adv, found = carry
            g, (x_adv, logits, l2) = grad_fn(modifier)
            ok = attack_succeeds(logits)
            better = ok & (l2 < best_l2)
            best_l2 = jnp.where(better, l2, best_l2)
            mask = better.reshape((-1,) + (1,) * (x.ndim - 1))
            best_adv = jnp.where(mask, x_adv, best_adv)
            found = found | ok
            updates, opt_state = opt.update(g, opt_state, modifier)
            modifier = optax.apply_updates(modifier, updates)
            return (modifier, opt_state, best_l2, best_adv, found), None

        init = (modifier0, opt.init(modifier0),
                jnp.full((batch,), jnp.inf), x, jnp.zeros((batch,), bool))
        (modifier, _, best_l2, best_adv, found), _ = jax.lax.scan(
            step, init, None, length=cfg.max_iterations)
        return best_l2, best_adv, found

    def bs_step(carry, _):
        c, lower, upper, global_l2, global_adv = carry
        l2, adv, found = inner_opt(c)
        better = found & (l2 < global_l2)
        global_l2 = jnp.where(better, l2, global_l2)
        mask = better.reshape((-1,) + (1,) * (x.ndim - 1))
        global_adv = jnp.where(mask, adv, global_adv)
        # per-example bounds update (cleverhans semantics)
        upper = jnp.where(found, jnp.minimum(upper, c), upper)
        lower = jnp.where(found, lower, jnp.maximum(lower, c))
        has_upper = jnp.isfinite(upper)
        c = jnp.where(found,
                      (lower + upper) / 2.0,
                      jnp.where(has_upper, (lower + upper) / 2.0, c * 10.0))
        return (c, lower, upper, global_l2, global_adv), None

    c0 = jnp.full((batch,), cfg.initial_const)
    init = (c0, jnp.zeros((batch,)), jnp.full((batch,), jnp.inf),
            jnp.full((batch,), jnp.inf), x)
    (_, _, _, _, adv), _ = jax.lax.scan(bs_step, init, None,
                                        length=cfg.binary_search_steps)
    return adv
