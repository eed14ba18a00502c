"""Shape/dtype tests for the model zoo (reference: models/gan.py,
utils/network_builder.py of kabkabm/defensegan)."""

import jax
import jax.numpy as jnp
import pytest

from defensegan_tpu.models import (CLASSIFIER_ZOO, build_classifier,
                                   critic_for, generator_for)


@pytest.mark.parametrize("dataset,hw,c", [("mnist", 28, 1),
                                          ("f-mnist", 28, 1),
                                          ("celeba", 64, 3)])
def test_generator_shapes(dataset, hw, c):
    gen = generator_for(dataset, dim=16)
    assert gen.output_hw == hw
    z = jnp.zeros((4, 128))
    variables = gen.init(jax.random.key(0), z, train=True)
    out = gen.apply(variables, z, train=False)
    assert out.shape == (4, hw, hw, c)
    assert out.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh range


@pytest.mark.parametrize("dataset,hw,c", [("mnist", 28, 1), ("celeba", 64, 3)])
def test_critic_shapes(dataset, hw, c):
    critic = critic_for(dataset, dim=16)
    x = jnp.zeros((4, hw, hw, c))
    variables = critic.init(jax.random.key(0), x)
    out = critic.apply(variables, x)
    assert out.shape == (4,)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize("name", sorted(CLASSIFIER_ZOO))
def test_classifier_zoo(name):
    model = build_classifier(name)
    x = jnp.zeros((2, 28, 28, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 10)
    # train mode with dropout rng works
    logits_t = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.key(1)})
    assert logits_t.shape == (2, 10)


@pytest.mark.parametrize("dataset,hw,c", [("mnist", 28, 1), ("celeba", 64, 3)])
def test_wide_generator_arch(dataset, hw, c):
    gen = generator_for(dataset, dim=16, arch="wide")
    assert gen.output_hw == hw
    z = jnp.zeros((2, 64))
    variables = gen.init(jax.random.key(0), z, train=True)
    out = gen.apply(variables, z, train=False)
    assert out.shape == (2, hw, hw, c)


def test_generator_bfloat16_compute():
    gen = generator_for("mnist", dim=8, dtype=jnp.bfloat16)
    z = jnp.zeros((2, 128))
    variables = gen.init(jax.random.key(0), z, train=True)
    # params stay f32 even with bf16 compute
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = gen.apply(variables, z, train=False)
    assert out.dtype == jnp.float32
