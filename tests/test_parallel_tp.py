"""Tensor-parallel sharding rules (parallel/tp.py): generate() and the
full projection defense must produce the replicated-run results when
params are channel-split over a ("data", "model") mesh — GSPMD inserts
the collectives, no model-code changes (SURVEY.md section 2: TP is a
perf non-goal at these sizes, but the framework is designed for it)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.defense import reconstruct, sample_z0  # noqa: E402
from defensegan_tpu.models import generator_for  # noqa: E402
from defensegan_tpu.parallel import (MODEL_AXIS, batch_sharding,  # noqa: E402
                                     make_mesh_2d, shard_params_tp, tp_spec)


@pytest.fixture
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def _gen_and_vars(cfg):
    gen = generator_for(cfg.type, cfg.gen_dim)
    variables = gen.init(jax.random.key(0),
                         jnp.zeros((1, cfg.latent_dim)), train=True)
    return gen, variables["params"], variables.get("batch_stats", {})


def test_tp_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert tp_spec(np.zeros((16, 64))) == P(None, MODEL_AXIS)
    assert tp_spec(np.zeros((5, 5, 8, 32))) == P(None, None, None,
                                                 MODEL_AXIS)
    assert tp_spec(np.zeros((32,))) == P(MODEL_AXIS)
    assert tp_spec(np.zeros(())) == P()


def test_make_mesh_2d_shape_and_validation(eight_devices):
    mesh = make_mesh_2d(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh_2d(8, 2)


def test_tp_generate_matches_replicated(eight_devices):
    """Forward pass with channel-split params == replicated params.
    gen_dim=16 -> channels divide the 2-wide model axis."""
    cfg = Config(type="mnist", gen_dim=16, latent_dim=32)
    gen, params, stats = _gen_and_vars(cfg)

    z = jax.random.normal(jax.random.key(1), (8, cfg.latent_dim))

    @jax.jit
    def fwd(p, s, z):
        return gen.apply({"params": p, "batch_stats": s}, z, train=False)

    ref = np.asarray(fwd(params, stats, z))

    mesh = make_mesh_2d(4, 2)
    p_tp = shard_params_tp(params, mesh)
    s_tp = shard_params_tp(stats, mesh)
    z_tp = jax.device_put(z, batch_sharding(mesh, 2))
    out = np.asarray(fwd(p_tp, s_tp, z_tp))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_tp_projection_defense_matches_replicated(eight_devices):
    """The full R x L projection (scan + momentum + argmin over restarts)
    under DP x TP placement reproduces the replicated result to fp
    tolerance — TP re-orders matmul reductions, so allclose not exact."""
    cfg = Config(type="mnist", gen_dim=16, latent_dim=32, rec_rr=2,
                 rec_iters=5)
    gen, params, stats = _gen_and_vars(cfg)

    def gen_apply_with(p, s):
        def gen_apply(z):
            return gen.apply({"params": p, "batch_stats": s}, z,
                             train=False)
        return gen_apply

    x = jax.random.uniform(jax.random.key(2), (8,) + cfg.image_shape)
    z0 = sample_z0(jax.random.key(3), 8, cfg.rec_rr, cfg.latent_dim)

    @jax.jit
    def run(p, s, x, z0):
        return reconstruct(gen_apply_with(p, s), x, z0,
                           rec_iters=cfg.rec_iters)

    ref = run(params, stats, x, z0)

    mesh = make_mesh_2d(4, 2)
    p_tp = shard_params_tp(params, mesh)
    s_tp = shard_params_tp(stats, mesh)
    x_tp = jax.device_put(x, batch_sharding(mesh, x.ndim))
    z0_tp = jax.device_put(z0, batch_sharding(mesh, z0.ndim))
    out = run(p_tp, s_tp, x_tp, z0_tp)

    np.testing.assert_allclose(np.asarray(out.x_hat),
                               np.asarray(ref.x_hat), rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(out.loss),
                               np.asarray(ref.loss), rtol=5e-5, atol=5e-7)


def test_tp_odd_channels_fall_back_to_replicated(eight_devices):
    """A leaf whose shard axis doesn't divide the model axis must be
    placed replicated, not crash."""
    mesh = make_mesh_2d(4, 2)
    leaf = np.zeros((7,), np.float32)          # 7 % 2 != 0
    out = shard_params_tp({"b": leaf}, mesh)["b"]
    assert out.sharding.is_fully_replicated
    ok = shard_params_tp({"k": np.zeros((4, 6), np.float32)}, mesh)["k"]
    assert not ok.sharding.is_fully_replicated
