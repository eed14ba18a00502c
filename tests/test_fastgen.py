"""Packed inference generators (defense/fastgen.py) must match
generator.apply(train=False) exactly in float32, for every variant and
both architectures — they are algebraic rewrites (BN folding, phase
decomposition of conv_transpose, dense materialization), not
approximations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensegan_tpu.defense import reconstruct, sample_z0
from defensegan_tpu.defense.fastgen import (apply_phase_conv,
                                            make_packed_apply,
                                            pack_generator, phase_decompose)
from defensegan_tpu.models import generator_for


def _init_gen(gen, key, n=4):
    variables = gen.init(key, jnp.zeros((1, 16)), train=True)
    # run a couple of train-mode steps so batch_stats are non-trivial
    params, stats = variables["params"], variables["batch_stats"]
    for i in range(2):
        z = jax.random.normal(jax.random.fold_in(key, i), (8, 16))
        _, upd = gen.apply({"params": params, "batch_stats": stats}, z,
                           train=True, mutable=["batch_stats"])
        stats = upd["batch_stats"]
    return params, stats


def test_phase_decompose_matches_conv_transpose():
    rng = np.random.RandomState(0)
    kern = rng.randn(5, 5, 6, 3).astype(np.float32)
    bias = rng.randn(3).astype(np.float32)
    h = jnp.asarray(rng.randn(2, 7, 7, 6).astype(np.float32))
    want = jax.lax.conv_transpose(
        h, jnp.asarray(kern), strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = apply_phase_conv(phase_decompose(kern, bias), h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dataset,arch,variants", [
    ("mnist", "deep", ("conv", "phase", "hybrid", "s2d")),
    ("mnist", "wide", ("conv", "phase", "dense", "hybrid", "s2d")),
    ("celeba", "deep", ("conv", "phase", "hybrid")),
    ("celeba", "wide", ("conv", "phase", "hybrid")),
])
def test_packed_matches_flax(dataset, arch, variants):
    gen = generator_for(dataset, dim=8, dtype=jnp.float32, arch=arch)
    params, stats = _init_gen(gen, jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (4, 16))
    want = gen.apply({"params": params, "batch_stats": stats}, z,
                     train=False)
    want_flat = np.asarray(want).reshape(4, -1)
    for variant in variants:
        packed = pack_generator(gen, params, stats, variant=variant)
        got = np.asarray(make_packed_apply(packed)(z))
        if variant == "s2d":
            got = got[:, np.asarray(packed.perm[1])]  # s2d -> image order
        np.testing.assert_allclose(got, want_flat, atol=2e-5, rtol=1e-4,
                                   err_msg=f"variant={variant}")


def test_s2d_rejects_deep_celeba_stack():
    gen = generator_for("celeba", dim=8, dtype=jnp.float32, arch="deep")
    params, stats = _init_gen(gen, jax.random.key(0))
    with pytest.raises(ValueError, match="s2d"):
        pack_generator(gen, params, stats, variant="s2d")


def test_hybrid_rejects_64x64_dense_probe():
    """The hybrid/dense identity probe is O(feat^2) memory; 64x64 archs
    (final-deconv input 32x32xC) must be rejected with a clear error, not
    a tens-of-GB allocation."""
    gen = generator_for("celeba", dim=64, dtype=jnp.float32, arch="deep")
    params, stats = _init_gen(gen, jax.random.key(0))
    with pytest.raises(ValueError, match="too large"):
        pack_generator(gen, params, stats, variant="hybrid")


def test_s2d_perm_roundtrip():
    gen = generator_for("mnist", dim=8, dtype=jnp.float32, arch="deep")
    params, stats = _init_gen(gen, jax.random.key(0))
    packed = pack_generator(gen, params, stats, variant="s2d")
    perm, inv = (np.asarray(p) for p in packed.perm)
    assert (perm[inv] == np.arange(perm.size)).all()
    assert (inv[perm] == np.arange(perm.size)).all()


def test_dense_rejects_multi_block():
    gen = generator_for("mnist", dim=8, dtype=jnp.float32, arch="deep")
    params, stats = _init_gen(gen, jax.random.key(0))
    with pytest.raises(ValueError, match="dense"):
        pack_generator(gen, params, stats, variant="dense")


def test_projection_through_packed_matches_flax_path():
    """Same z0 => the packed projection must track the flax projection
    step-for-step (identical argmin restarts, near-identical losses)."""
    gen = generator_for("mnist", dim=8, dtype=jnp.float32, arch="wide")
    params, stats = _init_gen(gen, jax.random.key(2))

    def gen_apply(z):
        return gen.apply({"params": params, "batch_stats": stats}, z,
                         train=False)

    x = jax.random.uniform(jax.random.key(3), (3, 28, 28, 1))
    z0 = sample_z0(jax.random.key(4), 3, 2, 16)
    ref = reconstruct(gen_apply, x, z0, rec_iters=12, rec_lr=1.0)

    packed = pack_generator(gen, params, stats, variant="dense")
    apply_flat = make_packed_apply(packed)
    x_flat = x.reshape(3, -1)
    got = reconstruct(apply_flat, x_flat, z0, rec_iters=12, rec_lr=1.0)

    np.testing.assert_allclose(np.asarray(got.all_losses),
                               np.asarray(ref.all_losses), atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got.x_hat).reshape(3, 28, 28, 1),
        np.asarray(ref.x_hat), atol=1e-4, rtol=1e-3)
