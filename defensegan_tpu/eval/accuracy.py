"""(Defended) accuracy evaluation.

Reference parity: cleverhans model_eval and
utils/gan_defense.py::model_eval_gan (~L10-120) of kabkabm/defensegan — the
latter pushes each test batch through the reconstruction op before the
classifier. Here purify+classify is one jitted program per batch; only the
per-batch correct-count scalar returns to the host.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

LogitsFn = Callable[[jnp.ndarray], jnp.ndarray]


def _batches(n: int, batch_size: int):
    for i in range(0, n, batch_size):
        yield i, min(i + batch_size, n)


def batched_reconstruct(gan, x: np.ndarray,
                        key: Optional[jax.Array] = None,
                        batch_size: Optional[int] = None,
                        rec_rr: Optional[int] = None,
                        rec_iters: Optional[int] = None,
                        rec_lr: Optional[float] = None,
                        rec_kernel: Optional[str] = None,
                        rec_init: Optional[str] = None,
                        key_fn: Optional[Callable[[int], jax.Array]] = None):
    """Yield (res, lo, hi) reconstruction batches over x — THE
    batching/padding/key semantics for every defended consumer
    (model_eval_gan here, eval/detect.py::reconstruction_errors,
    defense/pipeline.py::DefendedPipeline), factored so they cannot
    drift:

    - batch_size None picks min(1024, n rounded up to 256): wide
      batch x restarts for full MXU tiles / Pallas grids, few dispatches;
    - the last partial batch is zero-padded to the compiled static shape
      — slice per-example fields of `res` with [: hi - lo] to drop the
      padding;
    - the restart-init key for the batch at offset lo is key_fn(lo) when
      given (exact attack-z0 replay) else a fresh split of `key`;
    - rec_* / rec_kernel / rec_init pass through to gan.reconstruct (full
      override set; rec_init="encoder"/"encoder_jitter" is the
      amortized-init extension, defense/encoder_init.py).
    """
    key = key if key is not None else jax.random.key(0)
    n = x.shape[0]
    if batch_size is None:
        batch_size = min(1024, ((n + 255) // 256) * 256)
    for lo, hi in _batches(n, batch_size):
        xb = x[lo:hi]
        pad = batch_size - xb.shape[0]
        if pad:
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:],
                                              xb.dtype)])
        if key_fn is not None:
            k = key_fn(lo)
        else:
            key, k = jax.random.split(key)
        res = gan.reconstruct(jnp.asarray(xb), k, rec_rr=rec_rr,
                              rec_iters=rec_iters, rec_lr=rec_lr,
                              kernel=rec_kernel, init=rec_init)
        yield res, lo, hi


def model_eval(logits_fn: LogitsFn, x: np.ndarray, y: np.ndarray,
               batch_size: int = 256) -> float:
    """Plain accuracy (reference: cleverhans model_eval)."""

    @jax.jit
    def correct_count(xb, yb):
        return jnp.sum(jnp.argmax(logits_fn(xb), axis=-1) == yb)

    total = 0
    for lo, hi in _batches(x.shape[0], batch_size):
        total += int(correct_count(jnp.asarray(x[lo:hi]),
                                   jnp.asarray(y[lo:hi])))
    return total / x.shape[0]


def model_eval_gan(gan, logits_fn: LogitsFn, x: np.ndarray, y: np.ndarray,
                   key: Optional[jax.Array] = None,
                   batch_size: Optional[int] = None,
                   rec_rr: Optional[int] = None,
                   rec_iters: Optional[int] = None,
                   rec_lr: Optional[float] = None,
                   rec_kernel: Optional[str] = None,
                   rec_init: Optional[str] = None,
                   key_fn: Optional[Callable[[int], jax.Array]] = None,
                   return_correct: bool = False):
    """Defended accuracy: purify each batch via gan.reconstruct, classify.

    Reference: utils/gan_defense.py::model_eval_gan. The last partial batch
    is padded to the compiled batch shape (static shapes for XLA) and the
    padding is excluded from the count.

    batch_size None (default) picks min(1024, n rounded up to 256): large
    batches keep the projection's batch x restarts axis wide enough for
    full MXU tiles / the fused Pallas kernels' grids, and fewer dispatches
    matter on transports with per-call overhead.

    rec_rr/rec_iters/rec_lr/rec_kernel override the cfg defaults — the
    full override set of DefenseGAN.reconstruct, so e.g. a rec_lr sweep
    can run through this eval path. rec_kernel="xla" pins the eval to the
    generic differentiable path (same numerics as an attack graph built on
    defense.reconstruct — required for an exact attack-z0 replay).

    key_fn: when given, the restart-init key for the batch starting at
    index lo is key_fn(lo) instead of a fresh split of `key` — with
    batch_size equal to the attack batch and key_fn reproducing the
    attack's per-batch keys, the eval reuses the attack graph's z0
    EXACTLY, separating restart stochasticity from attack resistance
    (whitebox --eval_z0 both; VERDICT round-2 item 3).

    return_correct: when True, returns (accuracy, correct) where correct
    is the per-example bool array [N] — needed to join classification
    outcomes with per-example detection flags (whitebox --detect joint
    two-layer metric).
    """
    @jax.jit
    def batch_correct(x_hat, yb):
        return jnp.argmax(logits_fn(x_hat), axis=-1) == yb

    correct = []
    for res, lo, hi in batched_reconstruct(gan, x, key=key,
                                           batch_size=batch_size,
                                           rec_rr=rec_rr,
                                           rec_iters=rec_iters,
                                           rec_lr=rec_lr,
                                           rec_kernel=rec_kernel,
                                           rec_init=rec_init,
                                           key_fn=key_fn):
        yb = y[lo:hi]
        pad = res.x_hat.shape[0] - yb.shape[0]
        if pad:
            yb = np.concatenate([yb, np.zeros(pad, yb.dtype)])
        correct.append(np.asarray(batch_correct(res.x_hat,
                                                jnp.asarray(yb)))[:hi - lo])
    correct = np.concatenate(correct)
    acc = float(correct.mean())
    return (acc, correct) if return_correct else acc
