"""Correctness of the Pallas fused projection kernel (interpret mode on CPU)
against the reference XLA path (defense/project.py). Exact in f32; the
nested-phase packing is also validated against the flax generator."""

import jax
import jax.numpy as jnp
import numpy as np

from defensegan_tpu.defense import reconstruct
from defensegan_tpu.kernels.fused_projection import (fused_project_z,
                                                     nest_phases,
                                                     pack_for_pallas,
                                                     unnest_phases)
from defensegan_tpu.models import generator_for
from defensegan_tpu.models.generator import from_image_space

Z = 128


def _gen_and_vars(seed=0, dim=16):
    gen = generator_for("mnist", dim=dim)
    variables = gen.init(jax.random.key(seed), jnp.zeros((1, Z)), train=True)
    # non-trivial BN stats so folding is exercised
    variables = jax.device_get(variables)
    rng = np.random.RandomState(seed)
    for name in variables["batch_stats"]:
        st = variables["batch_stats"][name]
        st["mean"] = rng.randn(*st["mean"].shape).astype(np.float32) * 0.2
        st["var"] = np.abs(rng.randn(*st["var"].shape)).astype(
            np.float32) + 0.7
    return gen, jax.tree.map(jnp.asarray, variables)


def test_nest_unnest_roundtrip():
    x = jax.random.normal(jax.random.key(0), (3, 28, 28, 1))
    np.testing.assert_array_equal(np.asarray(unnest_phases(nest_phases(x))),
                                  np.asarray(x))


def test_fused_projection_matches_xla_path_f32():
    gen, variables = _gen_and_vars()

    def gen_apply(z):
        return gen.apply(variables, z, train=False)

    n, rr, L, lr, mom = 4, 2, 7, 1.0, 0.7
    x = jax.random.uniform(jax.random.key(1), (n, 28, 28, 1))
    z0 = jax.random.normal(jax.random.key(2), (n, rr, Z)) * 0.8

    ref = reconstruct(gen_apply, x, z0, rec_iters=L, rec_lr=lr, momentum=mom)

    pack = pack_for_pallas(gen, variables, dtype=jnp.float32)
    x_tanh = from_image_space(x)
    x_flat = jnp.broadcast_to(x_tanh[:, None],
                              (n, rr) + x_tanh.shape[1:]).reshape(
                                  (n * rr,) + x_tanh.shape[1:])
    z_final = fused_project_z(pack, x_flat, z0.reshape(n * rr, Z),
                              rec_iters=L, rec_lr=lr, momentum=mom,
                              tile=4, interpret=True)
    # compare against the XLA scan's final z (all restarts)
    # reconstruct() doesn't expose per-restart z, so check the winner's z
    # and all final losses through the generator
    g_final = gen_apply(z_final)
    losses = jnp.mean(jnp.square(g_final - x_flat),
                      axis=(1, 2, 3)).reshape(n, rr)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(
        ref.all_losses), rtol=2e-3, atol=2e-5)
    best = np.argmin(np.asarray(losses), axis=1)
    z_star = np.asarray(z_final.reshape(n, rr, Z))[np.arange(n), best]
    np.testing.assert_allclose(z_star, np.asarray(ref.z_star), rtol=2e-3,
                               atol=2e-3)


def test_factored_l1_variant_matches_tap_loop():
    """factored_l1=True computes the identical function (interpret, f32)."""
    gen, variables = _gen_and_vars(seed=6)
    pack = pack_for_pallas(gen, variables, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(7), (4, 28, 28, 1)) * 2 - 1
    z0 = jax.random.normal(jax.random.key(8), (4, Z))
    kw = dict(rec_iters=6, rec_lr=1.0, momentum=0.7, tile=4, interpret=True)
    z_tap = fused_project_z(pack, x, z0, factored_l1=False, **kw)
    z_fac = fused_project_z(pack, x, z0, factored_l1=True, **kw)
    np.testing.assert_allclose(np.asarray(z_fac), np.asarray(z_tap),
                               rtol=1e-5, atol=1e-5)


def test_fused_projection_bf16_converges():
    """bf16 pack: same qualitative behavior (loss decreases over steps)."""
    gen, variables = _gen_and_vars(seed=3)

    def gen_apply(z):
        return gen.apply(variables, z, train=False)

    n = 4
    z_true = jax.random.normal(jax.random.key(4), (n, Z))
    x_tanh = gen_apply(z_true)
    z0 = z_true + 3.0 * jax.random.normal(jax.random.key(5), (n, Z))
    loss0 = float(jnp.mean((gen_apply(z0) - x_tanh) ** 2))

    def final_loss(dtype):
        pack = pack_for_pallas(gen, variables, dtype=dtype)
        z_final = fused_project_z(pack, x_tanh, z0, rec_iters=60,
                                  rec_lr=10.0, momentum=0.7, tile=4,
                                  interpret=True)
        return float(jnp.mean((gen_apply(z_final) - x_tanh) ** 2))

    l_f32 = final_loss(jnp.float32)
    l_bf16 = final_loss(jnp.bfloat16)
    assert l_f32 < loss0, (loss0, l_f32)          # it optimizes
    # bf16 compute tracks f32 closely (they share f32 accumulation)
    np.testing.assert_allclose(l_bf16, l_f32, rtol=0.05)
