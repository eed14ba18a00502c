"""Encoder-initialized projection: training + z0 policies.

NOT in the reference (see models/encoder.py) — an amortized-inversion
extension: the encoder E maps an input image to a latent near its
projection onto the generator manifold, so the R x L momentum-GD loop
(defense/project.py) can start at E(x) instead of z ~ N(0, I) and reach
reference-quality reconstructions with far fewer serial steps.

Training (frozen generator G, only E's params move):

    L(E) = mean ||G(E(x)) - x||^2                       (image term, tanh space)
         + beta_z * mean (E(G(z)) - z)^2                (latent-cycle term)
         [x drawn from the real training set, optionally noise-augmented;
          z ~ N(0, I) fresh each step]

The image term teaches E to invert G *around the data distribution*
(including off-manifold inputs when noise_aug > 0 — adversarial inputs are
off-manifold by construction); the latent-cycle term anchors E to the
exact inverse on the manifold and regularizes E's output scale to the
z ~ N(0, I) prior the projection's basin structure assumes.

TPU-first: the dataset is device-resident, minibatches are drawn on-device
inside the jitted step (same idiom as gan/train.py::make_data_train_step),
and the train loop runs in lax.scan chunks — the host sends one PRNG key
per chunk.

z0 policies (consumed by DefenseGAN.reconstruct via rec_init):

    "random"          z0 ~ N(0, I)                      (reference semantics)
    "encoder"         restart 0 = E(x); restarts 1..R-1 ~ N(0, I).
                      Strictly-better-start hybrid: keeps the full random
                      restart lottery (the stochasticity round-3 measured as
                      load-bearing for CW robustness) and adds one amortized
                      restart that usually wins the argmin.
    "encoder_jitter"  restart 0 = E(x); restarts 1..R-1 = E(x) + sigma * N.
                      All restarts search the encoder's basin — fastest
                      convergence, least diversity; the serving fast path
                      at small (R, L).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from defensegan_tpu.models.generator import from_image_space

Z0_MODES = ("random", "encoder", "encoder_jitter")


def encoder_z0(enc_apply: Callable[[jnp.ndarray], jnp.ndarray],
               x: jnp.ndarray, key: jax.Array, *, rec_rr: int,
               mode: str = "encoder", sigma: float = 0.5) -> jnp.ndarray:
    """Build [B, R, k] initial latents from an encoder.

    enc_apply: tanh-space images -> z [B, k] (frozen encoder closure).
    x: [B, H, W, C] images in [0, 1] (the public API space).
    mode/sigma: see module docstring. Differentiable w.r.t. x (through
    E), so attack graphs that differentiate through the encoder-init
    defense work unchanged.
    """
    if mode not in ("encoder", "encoder_jitter"):
        raise ValueError(f"encoder_z0 mode must be 'encoder' or "
                         f"'encoder_jitter', got {mode!r}")
    z_enc = enc_apply(from_image_space(x))                    # [B, k]
    batch, z_dim = z_enc.shape
    noise = jax.random.normal(key, (batch, rec_rr - 1, z_dim), jnp.float32) \
        if rec_rr > 1 else jnp.zeros((batch, 0, z_dim), jnp.float32)
    if mode == "encoder":
        rest = noise                                          # fresh restarts
    else:
        rest = z_enc[:, None, :] + sigma * noise              # basin jitter
    return jnp.concatenate([z_enc[:, None, :], rest], axis=1)


def make_encoder_train_step(encoder, gen_apply_tanh, *, batch_size: int,
                            lr: float, beta_z: float, noise_aug: float):
    """(enc_params, opt_state, data, key) -> (params, opt_state, metrics).

    gen_apply_tanh: FROZEN generator closure z -> tanh images (inference
    mode, running BN stats — the same generator the projection uses).
    data: device-resident [N, H, W, C], float32 [0,1] or uint8.
    """
    tx = optax.adam(lr)

    def loss_fn(enc_params, x_tanh, z, key_n):
        x_in = x_tanh
        if noise_aug > 0.0:
            # uniform L-inf noise: the cheap stand-in for the off-manifold
            # inputs (adversarial or corrupted) the init must cope with
            eps = jax.random.uniform(key_n, x_tanh.shape, jnp.float32,
                                     -noise_aug, noise_aug)
            x_in = jnp.clip(x_tanh + 2.0 * eps, -1.0, 1.0)  # tanh-space scale
        z_hat = encoder.apply({"params": enc_params}, x_in)
        g = gen_apply_tanh(z_hat)
        img = jnp.mean(jnp.square((g - x_tanh).astype(jnp.float32)))
        z_from_g = encoder.apply({"params": enc_params}, gen_apply_tanh(z))
        cyc = jnp.mean(jnp.square(z_from_g - z))
        return img + beta_z * cyc, {"img_mse": img, "z_cycle": cyc}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(enc_params, opt_state, data, key):
        k_idx, k_z, k_n = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, data.shape[0])
        x = data[idx]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        x_tanh = from_image_space(x)
        z_dim = encoder.z_dim
        z = jax.random.normal(k_z, (batch_size, z_dim), jnp.float32)
        (loss, aux), grads = grad_fn(enc_params, x_tanh, z, k_n)
        updates, opt_state = tx.update(grads, opt_state, enc_params)
        enc_params = optax.apply_updates(enc_params, updates)
        return enc_params, opt_state, dict(aux, loss=loss)

    return train_step, tx


def train_encoder(encoder, gen_apply_tanh, images: np.ndarray,
                  key: jax.Array, *, iters: int = 3000,
                  batch_size: int = 128, lr: float = 1e-3,
                  beta_z: float = 0.5, noise_aug: float = 0.0,
                  chunk: int = 100, quiet: bool = False,
                  init_params: Optional[Any] = None
                  ) -> tuple[Any, Dict[str, float]]:
    """Train E against a frozen generator; returns (enc_params, metrics).

    images: [N, H, W, C] in [0, 1] float32 (or uint8). The loop runs in
    lax.scan chunks of `chunk` steps — one host round-trip per chunk.
    """
    k_init, key = jax.random.split(key)
    data = jnp.asarray(images) if images.dtype == np.uint8 \
        else jnp.asarray(images, jnp.float32)
    if init_params is None:
        probe_img = data[:1].astype(jnp.float32)
        if data.dtype == jnp.uint8:
            probe_img = probe_img / 255.0
        enc_params = encoder.init(k_init, from_image_space(probe_img))[
            "params"]
    else:
        enc_params = init_params
    step, tx = make_encoder_train_step(encoder, gen_apply_tanh,
                                       batch_size=batch_size, lr=lr,
                                       beta_z=beta_z, noise_aug=noise_aug)
    opt_state = tx.init(enc_params)

    def run_chunk(enc_params, opt_state, key, n):
        keys = jax.random.split(key, n)

        def body(carry, k):
            p, s = carry
            p, s, m = step(p, s, data, k)
            return (p, s), m

        (enc_params, opt_state), ms = jax.lax.scan(body,
                                                   (enc_params, opt_state),
                                                   keys)
        return enc_params, opt_state, {k: v[-1] for k, v in ms.items()}

    run_chunk = jax.jit(run_chunk, static_argnums=3)
    t0 = time.time()
    metrics: Dict[str, float] = {}
    done = 0
    while done < iters:
        n = min(chunk, iters - done)
        key, k = jax.random.split(key)
        enc_params, opt_state, m = run_chunk(enc_params, opt_state, k, n)
        done += n
        metrics = {k_: float(v) for k_, v in m.items()}
        if not quiet:
            print(f"[encoder] step {done}/{iters} "
                  f"img_mse={metrics['img_mse']:.5f} "
                  f"z_cycle={metrics['z_cycle']:.4f}")
    metrics["wall_s"] = round(time.time() - t0, 2)
    return enc_params, metrics
