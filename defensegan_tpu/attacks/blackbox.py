"""Black-box attack pipeline: Jacobian-augmentation substitute training.

Reference parity: blackbox.py of kabkabm/defensegan (~L50-600), which follows
the cleverhans mnist_blackbox tutorial (Papernot et al., "Practical Black-Box
Attacks", arXiv:1602.02697):

  - the adversary holds a small seed set (150 test images in the paper);
  - each of `data_aug` rounds (rho): label the current set by QUERYING the
    black-box target (oracle), train the substitute on those labels, then
    double the set via Jacobian augmentation
        x' = x + lmbda_rho * sign(d[Z_sub(x)]_{oracle label} / dx)
    with lmbda_rho = lmbda * (-1 if rho // 3 == 0 else +1) (the tutorial's
    periodic sign rule, lmbda_coef = 2*int(int(rho/3) != 0) - 1);
  - FGSM crafted on the substitute transfers to the target.

TPU-first: oracle queries, substitute training steps, and the augmentation
gradient are all jitted device code; only the dataset-growth loop (inherently
sequential, tiny) runs on the host.
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.eval.classifier import ClassifierState, train_classifier

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


def jacobian_augmentation(sub_logits_fn: LogitsFn, x: jnp.ndarray,
                          oracle_labels: jnp.ndarray,
                          lmbda: float) -> jnp.ndarray:
    """x' = x + lmbda * sign(d Z[oracle_label] / dx), clipped to [0, 1].

    Reference: cleverhans jacobian_graph/jacobian_augmentation as called by
    blackbox.py::train_sub.
    """

    def label_logit_sum(xx):
        logits = sub_logits_fn(xx)
        return jnp.sum(
            jnp.take_along_axis(logits, oracle_labels[:, None], axis=1))

    g = jax.grad(label_logit_sum)(x)
    return jnp.clip(x + lmbda * jnp.sign(g), 0.0, 1.0)


def train_substitute(sub_model: nn.Module, oracle_fn: LogitsFn,
                     x_seed: np.ndarray, *, key: jax.Array,
                     data_aug: int = 6, lmbda: float = 0.1,
                     epochs_per_round: int = 10, batch_size: int = 128,
                     learning_rate: float = 1e-3, max_set_size: int = 12800,
                     persistent: bool = True,
                     quiet: bool = True) -> Tuple[ClassifierState, np.ndarray]:
    """The train_sub loop of blackbox.py: rho rounds of oracle-label,
    train, Jacobian-augment. Returns (substitute state, final sub set).

    persistent=True matches the reference/cleverhans train_sub, which keeps
    the SAME substitute variables across the rho rounds (each round continues
    training on the grown set). persistent=False retrains from scratch every
    round (kept as an ablation flag).
    """

    @jax.jit
    def oracle_labels_of(xb):
        return jnp.argmax(oracle_fn(xb), axis=-1)

    x_sub = np.asarray(x_seed, np.float32)
    state = None
    for rho in range(data_aug):
        key, k_train = jax.random.split(key)
        y_sub = np.asarray(oracle_labels_of(jnp.asarray(x_sub)))
        params0 = state.params if (persistent and state is not None) else None
        state = train_classifier(sub_model, x_sub, y_sub, key=k_train,
                                 epochs=epochs_per_round,
                                 batch_size=batch_size,
                                 learning_rate=learning_rate, params=params0,
                                 quiet=quiet)
        if rho == data_aug - 1:
            break
        if x_sub.shape[0] >= max_set_size:
            continue  # cap reached: keep refining on oracle labels only
        if 2 * x_sub.shape[0] > max_set_size:
            # cleverhans caps growth by augmenting a random subset
            sel = np.random.RandomState(rho).choice(
                x_sub.shape[0], max_set_size - x_sub.shape[0], replace=False)
            base = x_sub[sel]
            base_y = y_sub[sel]
        else:
            base, base_y = x_sub, y_sub
        lmbda_rho = lmbda * (2 * int(int(rho / 3) != 0) - 1)
        x_new = np.asarray(jacobian_augmentation(
            state.logits_fn(), jnp.asarray(base), jnp.asarray(base_y),
            lmbda_rho))
        x_sub = np.concatenate([x_sub, x_new], axis=0)
        if not quiet:
            print(f"  substitute round {rho + 1}/{data_aug}: "
                  f"set size {x_sub.shape[0]}")
    return state, x_sub
