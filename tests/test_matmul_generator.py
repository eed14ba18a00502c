"""Equivalence of the MXU-first matmul generator vs the Flax generator
(kernels/matmul_generator.py vs models/generator.py). The packed path must
compute the SAME function (BN folded, conv-transpose as im2col matmul)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensegan_tpu.kernels.matmul_generator import (apply_packed,
                                                     pack_generator)
from defensegan_tpu.models import generator_for


def _trained_like_variables(gen, key):
    """Init + perturb batch_stats so BN folding is actually exercised."""
    variables = gen.init(key, jnp.zeros((1, 32)), train=True)
    variables = jax.device_get(variables)
    rng = np.random.RandomState(0)
    stats = variables["batch_stats"]
    for name in stats:
        stats[name]["mean"] = rng.randn(*stats[name]["mean"].shape).astype(
            np.float32) * 0.3
        stats[name]["var"] = np.abs(rng.randn(
            *stats[name]["var"].shape).astype(np.float32)) + 0.5
    return jax.tree.map(jnp.asarray, variables)


@pytest.mark.parametrize("dataset,dim", [("mnist", 16), ("celeba", 8)])
def test_packed_matches_flax(dataset, dim):
    gen = generator_for(dataset, dim=dim)
    variables = _trained_like_variables(gen, jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (4, 32))

    ref = gen.apply(variables, z, train=False)
    packed = pack_generator(gen, variables, dtype=jnp.float32)
    got = apply_packed(packed, z)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_packed_bf16_close():
    gen = generator_for("mnist", dim=16)
    variables = _trained_like_variables(gen, jax.random.key(2))
    z = jax.random.normal(jax.random.key(3), (4, 32))
    ref = gen.apply(variables, z, train=False)
    packed = pack_generator(gen, variables, dtype=jnp.bfloat16)
    got = apply_packed(packed, z)
    # bf16 matmuls: tanh output agrees to ~1e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_packed_bf16_gradient_works():
    """bf16 compute path must be differentiable (VJP dtype plumbing)."""
    gen = generator_for("mnist", dim=8)
    variables = _trained_like_variables(gen, jax.random.key(7))
    packed = pack_generator(gen, variables, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.key(8), (2, 32))
    x = jax.random.uniform(jax.random.key(9), (2, 28, 28, 1)) * 2 - 1

    g = jax.jit(jax.grad(lambda z: jnp.mean(
        jnp.square(apply_packed(packed, z) - x))))(z)
    assert g.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_packed_gradient_matches():
    """The defense differentiates w.r.t. z; grads must match too."""
    gen = generator_for("mnist", dim=8)
    variables = _trained_like_variables(gen, jax.random.key(4))
    z = jax.random.normal(jax.random.key(5), (2, 32))
    x = jax.random.uniform(jax.random.key(6), (2, 28, 28, 1)) * 2 - 1

    def loss_flax(z):
        return jnp.mean(jnp.square(gen.apply(variables, z, train=False) - x))

    packed = pack_generator(gen, variables, dtype=jnp.float32)

    def loss_packed(z):
        return jnp.mean(jnp.square(apply_packed(packed, z) - x))

    g_ref = jax.grad(loss_flax)(z)
    g_got = jax.grad(loss_packed)(z)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)
