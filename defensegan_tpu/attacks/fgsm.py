"""FGSM and RAND+FGSM.

Reference parity: cleverhans FastGradientMethod as used by whitebox.py of
kabkabm/defensegan (attack_type fgsm / rand_fgsm); RAND+FGSM per the
Defense-GAN paper (arXiv:1805.06605): x' = x + alpha*sign(noise), then FGSM
with eps - alpha.

One jax.grad through `logits_fn` replaces the TF attack graph; when
`logits_fn` includes reconstruct(back_prop=True), gradients flow through the
full unrolled projection (the paper's strongest white-box setting).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


def _xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def fgsm(logits_fn: LogitsFn, x: jnp.ndarray, labels: jnp.ndarray,
         eps: float, clip_min: float = 0.0, clip_max: float = 1.0,
         targeted: bool = False) -> jnp.ndarray:
    """Fast Gradient (Sign) Method: x + eps * sign(grad_x xent).

    labels: true labels (untargeted) or target labels (targeted).
    """

    def loss(xx):
        return jnp.mean(_xent(logits_fn(xx), labels))

    g = jax.grad(loss)(x)
    direction = -jnp.sign(g) if targeted else jnp.sign(g)
    return jnp.clip(x + eps * direction, clip_min, clip_max)


def rand_fgsm(logits_fn: LogitsFn, x: jnp.ndarray, labels: jnp.ndarray,
              eps: float, alpha: float, key: jax.Array,
              clip_min: float = 0.0, clip_max: float = 1.0) -> jnp.ndarray:
    """RAND+FGSM (paper section 4): random step alpha, then FGSM with
    eps - alpha (defeats gradient masking at the decision boundary)."""
    if alpha >= eps:
        raise ValueError(
            f"rand_fgsm needs alpha < eps (got alpha={alpha}, eps={eps}); "
            f"eps - alpha would be a non-positive FGSM step")
    noise = jax.random.normal(key, x.shape, x.dtype)
    x_rand = jnp.clip(x + alpha * jnp.sign(noise), clip_min, clip_max)
    return fgsm(logits_fn, x_rand, labels, eps - alpha, clip_min, clip_max)
