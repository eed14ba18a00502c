"""DefenseGAN model-level behaviors: reconstructor-cache invalidation on
train/load (pallas reconstructors capture packed weights at build time) and
the divergence-restore failure-detection path (SURVEY.md section 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defensegan_tpu.configs import Config
from defensegan_tpu.data.synthetic import make_synthetic
from defensegan_tpu.gan import DefenseGAN


def _tiny_cfg(tmp_path, **kw):
    base = dict(type="mnist", gen_dim=4, disc_dim=4, latent_dim=16,
                batch_size=8, disc_iters=1, rec_rr=2, rec_iters=3,
                compute_dtype="float32", sample_every=10**9,
                save_every=10**9, output_dir=str(tmp_path / "run"))
    base.update(kw)
    return Config(**base)


def test_reconstructor_cache_invalidated_on_train_and_load(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    gan = DefenseGAN(cfg)
    x = jnp.asarray(make_synthetic(4, 28, 1, seed=0)[0])
    gan.reconstruct(x, jax.random.key(0))
    assert len(gan._reconstructors) == 1

    images, _ = make_synthetic(32, 28, 1, seed=1)
    gan.train(images, train_iters=2, log_every=1, quiet=True)
    assert len(gan._reconstructors) == 0  # stale caches dropped

    gan.reconstruct(x, jax.random.key(0))
    gan.save()
    gan.load()
    assert len(gan._reconstructors) == 0


def test_divergence_restore_and_raise(tmp_path, capsys):
    cfg = _tiny_cfg(tmp_path)
    gan = DefenseGAN(cfg)
    gan.save()  # a checkpoint to restore from

    calls = {"n": 0}

    def poisoned_step(state, data, key):
        calls["n"] += 1
        metrics = {"d_loss": jnp.float32(np.nan), "g_loss": jnp.float32(0),
                   "gp": jnp.float32(0), "wasserstein": jnp.float32(0)}
        return state.replace(step=state.step + 1), metrics

    gan._train_step = poisoned_step
    images, _ = make_synthetic(32, 28, 1, seed=2)
    # restore path: continues (all steps NaN -> restores every log point)
    gan.train(images, train_iters=2, log_every=1, quiet=True,
              on_divergence="restore")
    assert calls["n"] == 2
    assert "restoring latest checkpoint" in capsys.readouterr().out

    with pytest.raises(RuntimeError, match="diverged"):
        gan.train(images, train_iters=1, log_every=1, quiet=True,
                  on_divergence="raise")
