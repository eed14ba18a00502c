"""Classifier training (cross-entropy + Adam), jitted.

Reference parity: cleverhans model_train as used by whitebox.py (~L60-150)
and blackbox.py (prep_bbox / train_sub) of kabkabm/defensegan. The reference
trains with per-batch sess.run; here the update is one jitted step, with
on-device dropout RNG.

Also covers the reference's `--train_on_recs` mode: pass the purified
reconstructions as `x` (whitebox.py trains the classifier on
gan.reconstruct(x_train) outputs in that mode).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class ClassifierState(NamedTuple):
    params: dict
    model: nn.Module

    def logits_fn(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        return make_logits_fn(self.model, self.params)


def make_logits_fn(model: nn.Module, params) -> Callable:
    """Eval-mode logits closure (dropout off) for attacks/eval."""

    def logits_fn(x):
        return model.apply({"params": params}, x, train=False)

    return logits_fn


def load_cached_classifier(tag: str, model: nn.Module,
                           image_shape) -> Optional[ClassifierState]:
    """Restore the classifier cached under output/classifiers/<tag>, or
    None when absent. SINGLE source of the cache layout — shared by
    cli/whitebox.py::get_classifier (which writes it) and downstream
    consumers (scripts/pipeline_exp.py), so the tag scheme and restore
    plumbing cannot drift."""
    import os

    from defensegan_tpu.ckpt import latest_step, restore_checkpoint

    clf_dir = os.path.join("output", "classifiers", tag)
    if latest_step(clf_dir) is None:
        return None
    params0 = model.init(jax.random.key(0),
                         jnp.zeros((1,) + tuple(image_shape)),
                         train=False)["params"]
    return ClassifierState(params=restore_checkpoint(clf_dir, params0),
                           model=model)


def _xent_loss(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def train_classifier(model: nn.Module, x: np.ndarray, y: np.ndarray, *,
                     key: jax.Array, epochs: int = 10, batch_size: int = 128,
                     learning_rate: float = 1e-3,
                     params: Optional[dict] = None,
                     adv_eps: Optional[float] = None,
                     quiet: bool = True) -> ClassifierState:
    """Train `model` on (x [N,H,W,C] in [0,1], y [N]) with Adam + xent.

    Matches cleverhans model_train defaults in spirit (Adam 1e-3, shuffled
    minibatches per epoch). Pass `params` to continue training (used by the
    black-box substitute loop, which re-trains each augmentation round).

    adv_eps: if set, FGSM adversarial training (the reference's adv_tr
    baseline, cleverhans model_train with adversarial loss): per batch, craft
    FGSM at the current params and train on 0.5*clean + 0.5*adv loss.
    """
    tx = optax.adam(learning_rate)
    if params is None:
        params = model.init(key, jnp.zeros((1,) + x.shape[1:]),
                            train=False)["params"]
    opt_state = tx.init(params)

    # label-range guard: out-of-range labels would be silently clamped by
    # take_along_axis under XLA, corrupting training with no error
    n_out = int(model.apply({"params": params},
                            jnp.zeros((1,) + x.shape[1:]),
                            train=False).shape[-1])
    y_arr = np.asarray(y)
    if y_arr.size and (int(y_arr.min()) < 0 or int(y_arr.max()) >= n_out):
        raise ValueError(
            f"labels out of range for a {n_out}-way classifier: "
            f"min={int(y_arr.min())} max={int(y_arr.max())}")

    @jax.jit
    def step(params, opt_state, xb, yb, dropout_key):
        if adv_eps is not None:
            def craft_loss(xx):
                logits = model.apply({"params": params}, xx, train=False)
                return _xent_loss(logits, yb)

            g = jax.grad(craft_loss)(xb)
            xb_adv = jax.lax.stop_gradient(
                jnp.clip(xb + adv_eps * jnp.sign(g), 0.0, 1.0))

        def loss_fn(p):
            logits = model.apply({"params": p}, xb, train=True,
                                 rngs={"dropout": dropout_key})
            loss = _xent_loss(logits, yb)
            if adv_eps is not None:
                logits_adv = model.apply({"params": p}, xb_adv, train=True,
                                         rngs={"dropout": dropout_key})
                loss = 0.5 * loss + 0.5 * _xent_loss(logits_adv, yb)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = x.shape[0]
    steps_per_epoch = max(n // batch_size, 1)
    rng = np.random.RandomState(
        np.asarray(jax.random.key_data(key)).ravel()[-1] % (2**31 - 1))
    loss = jnp.zeros(())
    for epoch in range(epochs):
        perm = rng.permutation(n)
        for i in range(steps_per_epoch):
            idx = perm[i * batch_size:(i + 1) * batch_size]
            key, dk = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(x[idx]),
                                           jnp.asarray(y[idx]), dk)
        if not quiet:
            print(f"  classifier epoch {epoch + 1}/{epochs} "
                  f"loss={float(loss):.4f}")
    return ClassifierState(params=params, model=model)
