"""WGAN-GP losses.

Reference parity: the WGAN training objective built in models/gan.py of
kabkabm/defensegan (~L200-350), with the gradient penalty of Gulrajani et al.,
"Improved Training of Wasserstein GANs" (arXiv:1704.00028): canonical
lambda=10, n_critic=5, Adam(1e-4, b1=0.5, b2=0.9).

All functions operate in the generator's [-1, 1] tanh space.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# critic: images [N,H,W,C] -> scores [N]
CriticApply = Callable[[jnp.ndarray], jnp.ndarray]


def gradient_penalty(critic_apply: CriticApply, real: jnp.ndarray,
                     fake: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """E[(||grad_xhat D(xhat)||_2 - 1)^2], xhat = eps*real + (1-eps)*fake.

    eps: [N] per-sample U[0,1]. Computed in f32 regardless of critic compute
    dtype (the penalty is a second-order quantity; bf16 is too coarse).
    """
    eps = eps.reshape((-1,) + (1,) * (real.ndim - 1)).astype(jnp.float32)
    x_hat = eps * real.astype(jnp.float32) + (1.0 - eps) * fake.astype(jnp.float32)

    grads = jax.grad(lambda xh: jnp.sum(critic_apply(xh)))(x_hat)
    norms = jnp.sqrt(
        jnp.sum(jnp.square(grads.astype(jnp.float32)),
                axis=tuple(range(1, grads.ndim))) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def critic_loss_fn(critic_apply: CriticApply, real: jnp.ndarray,
                   fake: jnp.ndarray, eps: jnp.ndarray,
                   gp_lambda: float = 10.0):
    """WGAN-GP critic loss: E[D(fake)] - E[D(real)] + lambda*GP."""
    d_real = jnp.mean(critic_apply(real))
    d_fake = jnp.mean(critic_apply(fake))
    gp = gradient_penalty(critic_apply, real, fake, eps)
    loss = d_fake - d_real + gp_lambda * gp
    return loss, {"d_real": d_real, "d_fake": d_fake, "gp": gp,
                  "wasserstein": d_real - d_fake}


def generator_loss_fn(critic_apply: CriticApply,
                      fake: jnp.ndarray) -> jnp.ndarray:
    """WGAN generator loss: -E[D(G(z))]."""
    return -jnp.mean(critic_apply(fake))
