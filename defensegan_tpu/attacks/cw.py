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

TPU-first design: two drivers over the SAME step math.

  - `carlini_wagner_l2`: both loops on-device (`lax.scan` over iterations
    inside a scan over binary-search steps) — the whole attack is ONE
    compiled XLA program, vs cleverhans' per-iteration sess.run round-trips.
    Right whenever logits_fn is cheap (bare classifier).
  - `make_chunked_cw` / `carlini_wagner_l2_chunked`: identical math, but the
    iteration loop is split into host-dispatched scan chunks. Required when
    logits_fn is very expensive — e.g. the paper's strongest white-box,
    where every CW step differentiates through the L=200 unrolled
    Defense-GAN reconstruction: 5x1000 such steps fused into one program
    executes for many minutes, which the TPU runtime kills as a stuck
    kernel. Chunking bounds each device call while keeping all math
    on-device. The per-batch data (x, w0, y_onehot) are ARGUMENTS of the
    jitted chunk, so one compile is reused across all same-shape batches —
    use the `make_chunked_cw` factory when attacking in a batch loop.
"""

from __future__ import annotations

from functools import partial
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


def _cw_machinery(logits_fn: LogitsFn, ndim: int, cfg: CWConfig,
                  targeted: bool, keyed: bool = False):
    """Shared pieces of the one-program and chunked drivers.

    All per-batch data (x, w0, y_onehot, and — when keyed — a PRNG key) are
    explicit arguments — nothing batch-specific is baked into closures, so
    jits built over these functions are reused across same-shape batches.

    keyed=True: logits_fn takes (x, key) instead of (x) — used when the
    attack target is stochastic (classifier composed with the
    random-restart Defense-GAN reconstruction) so each attack batch can
    differentiate through reconstructions seeded with ITS OWN key instead
    of a fixed constant (VERDICT round-2 weak item 5).

    Returns (step, inner_init, bs_init, bs_update):
      step(inner_carry, c, x, w0, y_onehot, key) -> (inner_carry, objective)
        one Adam step at constants c [B]; objective =
        sum_b(l2_b + c_b * hinge_b), the scalar cleverhans' abort_early
        watches; key is None for unkeyed logits_fn
      inner_init(x, w0)                     fresh inner state for a bs step
      bs_init(x)                            binary-search carry
      bs_update(bs_carry, l2, adv, found)   bounds + global-best update
    """
    sum_axes = tuple(range(1, ndim))

    def _margins(logits, y_onehot):
        z_lab = jnp.sum(logits * y_onehot, axis=-1)
        z_other = jnp.max(logits - y_onehot * 1e9, axis=-1)
        return z_lab, z_other

    def attack_succeeds(logits, y_onehot):
        z_lab, z_other = _margins(logits, y_onehot)
        if targeted:   # reach the target label with margin
            return z_lab - z_other > cfg.confidence
        return z_other - z_lab > cfg.confidence

    def hinge(logits, y_onehot):
        z_lab, z_other = _margins(logits, y_onehot)
        if targeted:
            return jnp.maximum(z_other - z_lab + cfg.confidence, 0.0)
        return jnp.maximum(z_lab - z_other + cfg.confidence, 0.0)

    opt = optax.adam(cfg.learning_rate)

    def loss_fn(modifier, c, x, w0, y_onehot, key):
        x_adv = _from_tanh_space(w0 + modifier, cfg)
        logits = logits_fn(x_adv, key) if keyed else logits_fn(x_adv)
        l2 = jnp.sum(jnp.square(x_adv - x), axis=sum_axes)
        per_ex = l2 + c * hinge(logits, y_onehot)
        return jnp.sum(per_ex), (x_adv, logits, l2)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(carry, c, x, w0, y_onehot, key=None):
        modifier, opt_state, best_l2, best_adv, found = carry
        g, (x_adv, logits, l2) = grad_fn(modifier, c, x, w0, y_onehot, key)
        ok = attack_succeeds(logits, y_onehot)
        better = ok & (l2 < best_l2)
        best_l2 = jnp.where(better, l2, best_l2)
        mask = better.reshape((-1,) + (1,) * (ndim - 1))
        best_adv = jnp.where(mask, x_adv, best_adv)
        found = found | ok
        updates, opt_state = opt.update(g, opt_state, modifier)
        modifier = optax.apply_updates(modifier, updates)
        hinge_val = hinge(logits, y_onehot)
        objective = jnp.sum(l2 + c * hinge_val)
        return (modifier, opt_state, best_l2, best_adv, found), objective

    def inner_init(x, w0):
        batch = x.shape[0]
        modifier0 = jnp.zeros_like(w0)
        return (modifier0, opt.init(modifier0),
                jnp.full((batch,), jnp.inf), x, jnp.zeros((batch,), bool))

    def bs_init(x):
        batch = x.shape[0]
        c0 = jnp.full((batch,), cfg.initial_const)
        return (c0, jnp.zeros((batch,)), jnp.full((batch,), jnp.inf),
                jnp.full((batch,), jnp.inf), x)

    def bs_update(carry, l2, adv, found):
        c, lower, upper, global_l2, global_adv = carry
        better = found & (l2 < global_l2)
        global_l2 = jnp.where(better, l2, global_l2)
        mask = better.reshape((-1,) + (1,) * (ndim - 1))
        global_adv = jnp.where(mask, adv, global_adv)
        # per-example bounds update (cleverhans semantics)
        upper = jnp.where(found, jnp.minimum(upper, c), upper)
        lower = jnp.where(found, lower, jnp.maximum(lower, c))
        has_upper = jnp.isfinite(upper)
        c = jnp.where(found,
                      (lower + upper) / 2.0,
                      jnp.where(has_upper, (lower + upper) / 2.0, c * 10.0))
        return (c, lower, upper, global_l2, global_adv)

    return step, inner_init, bs_init, bs_update


def _onehot_labels(logits_fn, x, labels, key=None, keyed=False):
    # eval_shape: no execution/compile just to read the class count
    # (logits_fn may cost a full reconstruction)
    fn = (lambda xx: logits_fn(xx, key)) if keyed else logits_fn
    num_classes = jax.eval_shape(fn, x[:1]).shape[-1]
    return jax.nn.one_hot(labels, num_classes)


def carlini_wagner_l2(logits_fn: LogitsFn, x: jnp.ndarray,
                      labels: jnp.ndarray,
                      cfg: CWConfig = CWConfig(),
                      targeted: bool = False,
                      key: jnp.ndarray = None) -> jnp.ndarray:
    """CW-L2 as one fused program. Returns adversarial examples (x where
    none found). Jit-compatible; call under jax.jit for best performance.

    labels: true labels (untargeted, default — the paper's setting) or
    target labels (targeted=True, cleverhans CarliniWagnerL2 y_target).
    key: when given, logits_fn is treated as keyed — fn(x, key) — for
    stochastic attack targets (see _cw_machinery).
    """
    keyed = key is not None
    step, inner_init, bs_init, bs_update = _cw_machinery(
        logits_fn, x.ndim, cfg, targeted, keyed=keyed)
    y_onehot = _onehot_labels(logits_fn, x, labels, key, keyed)
    w0 = _to_tanh_space(x, cfg)

    def bs_step(carry, _):
        c = carry[0]
        inner, _ = jax.lax.scan(
            lambda cr, _: (step(cr, c, x, w0, y_onehot, key)[0], None),
            inner_init(x, w0), None, length=cfg.max_iterations)
        _, _, l2, adv, found = inner
        return bs_update(carry, l2, adv, found), None

    (_, _, _, _, adv), _ = jax.lax.scan(bs_step, bs_init(x), None,
                                        length=cfg.binary_search_steps)
    return adv


def effective_cw_chunk(cfg: CWConfig, chunk_iters: int,
                       abort_early: bool) -> int:
    """The chunk size make_chunked_cw will actually dispatch — shared with
    callers that log it (the whitebox CLI printed the pre-cap request and
    under-stated device-program duration when abort_early capped it)."""
    chunk = max(1, min(chunk_iters, cfg.max_iterations))
    if abort_early:
        chunk = min(chunk, max(1, cfg.max_iterations // 10))
    return chunk


def make_chunked_cw(logits_fn: LogitsFn, cfg: CWConfig = CWConfig(),
                    targeted: bool = False, chunk_iters: int = 100,
                    abort_early: bool = False, verbose: bool = False,
                    keyed_logits: bool = False):
    """Build a chunked CW attacker: returns attack(x, labels[, key]) -> adv.

    Identical math to `carlini_wagner_l2`, executed as a host-driven
    sequence of scan(chunk_iters) device programs, each synchronized with
    a host fetch so no device program runs unboundedly long. The jitted
    chunk takes the batch data as arguments, so ONE compile serves every
    same-shape batch — build the attacker once, then loop over batches.

    abort_early: cleverhans CarliniWagnerL2's abort_early (its default is
    True): stop a binary-search step once the objective fails to improve
    to 0.9999x its value at the previous check. Checks happen at
    cleverhans' cadence — every max_iterations//10 steps; the chunk size
    is capped at that cadence so the check can actually fire (with
    chunk >= max_iterations the loop used to end before the first check —
    round-2 advisor). Off by default so the attacker is drop-in equivalent
    to the fused driver; the whitebox CLI exposes --cw_abort_early.

    keyed_logits: logits_fn takes (x, key); attack() then accepts a
    per-batch key (see _cw_machinery).
    """
    chunk = effective_cw_chunk(cfg, chunk_iters, abort_early)
    check_every = max(chunk, cfg.max_iterations // 10 or 1)
    by_ndim = {}  # machinery is rank-dependent (sum axes, where-masks)

    def attack(x: jnp.ndarray, labels: jnp.ndarray,
               key: jnp.ndarray = None) -> jnp.ndarray:
        if keyed_logits and key is None:
            raise ValueError("keyed_logits=True: attack(x, labels, key) "
                             "needs a PRNG key")
        jits = by_ndim.get(x.ndim)
        if jits is None:
            step, inner_init, bs_init, bs_update = _cw_machinery(
                logits_fn, x.ndim, cfg, targeted, keyed=keyed_logits)

            @partial(jax.jit, static_argnames="n")
            def run_chunk(carry, c, x, w0, y_onehot, key, n):
                out, objs = jax.lax.scan(
                    lambda cr, _: step(cr, c, x, w0, y_onehot, key), carry,
                    None, length=n)
                return out, objs[-1]

            jits = {"inner_init": inner_init, "bs_init": bs_init,
                    "bs_update": jax.jit(bs_update),
                    "run_chunk": run_chunk}
            by_ndim[x.ndim] = jits

        y_onehot = _onehot_labels(logits_fn, x, labels, key, keyed_logits)
        w0 = _to_tanh_space(x, cfg)
        carry = jits["bs_init"](x)
        for b in range(cfg.binary_search_steps):
            c = carry[0]
            inner = jits["inner_init"](x, w0)
            done = 0
            prev_obj = float("inf")
            next_check = check_every
            while done < cfg.max_iterations:
                n = min(chunk, cfg.max_iterations - done)
                inner, obj = jits["run_chunk"](inner, c, x, w0, y_onehot,
                                               key, n)
                # honest barrier for this tunnel (see CLAUDE.md): fetch
                # scalars so at most one chunk is ever in flight
                n_found = int(jnp.sum(inner[4]))
                obj = float(obj)
                done += n
                if verbose:
                    print(f"  cw bs {b + 1}/{cfg.binary_search_steps} "
                          f"iter {done}/{cfg.max_iterations} "
                          f"(found {n_found}/{x.shape[0]}, obj {obj:.4f})",
                          flush=True)
                if abort_early and done >= next_check:
                    if obj > prev_obj * 0.9999:
                        if verbose:
                            print(f"  cw bs {b + 1}: abort_early at iter "
                                  f"{done} (objective plateaued)",
                                  flush=True)
                        break
                    prev_obj = obj
                    next_check += check_every
            _, _, l2, adv, found = inner
            carry = jits["bs_update"](carry, l2, adv, found)
        return carry[4]

    return attack


def carlini_wagner_l2_chunked(logits_fn: LogitsFn, x: jnp.ndarray,
                              labels: jnp.ndarray,
                              cfg: CWConfig = CWConfig(),
                              targeted: bool = False,
                              chunk_iters: int = 100,
                              abort_early: bool = False,
                              verbose: bool = False,
                              key: jnp.ndarray = None) -> jnp.ndarray:
    """One-shot convenience wrapper over `make_chunked_cw` (compiles per
    call — prefer the factory when attacking multiple batches)."""
    return make_chunked_cw(logits_fn, cfg, targeted=targeted,
                           chunk_iters=chunk_iters,
                           abort_early=abort_early,
                           verbose=verbose,
                           keyed_logits=key is not None)(x, labels, key)
