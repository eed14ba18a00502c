"""Regression tests for the round-3 self-review findings:

- dryrun_multichip(1) must not crash (its negative divisibility check is
  vacuous on one device and used to raise AssertionError);
- DefenseGAN.reconstruct(kernel=...) per-call override routes through
  resolve_projection_kernel (whitebox --eval_z0 both pins the attack-z0
  replay to the attack graph's numeric path with kernel="xla");
- effective_cw_chunk is the single source of truth for the dispatched
  chunk size (the CLI used to print the pre-cap request);
- queue_lib.run_steps rejects unknown step names instead of reporting a
  clean no-op run.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from defensegan_tpu.attacks import CWConfig, effective_cw_chunk  # noqa: E402
from defensegan_tpu.configs import Config  # noqa: E402
from defensegan_tpu.gan import DefenseGAN  # noqa: E402
from defensegan_tpu.gan.defense_gan import resolve_projection_kernel  # noqa: E402


# ------------------------------------------------------------- dryrun
@pytest.mark.parametrize("n", [1, 2])
def test_dryrun_multichip_small_device_counts(n, eight_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)  # must complete without raising


# ------------------------------------------- per-call kernel override
def test_reconstruct_kernel_override_resolution():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 gen_arch="wide", projection_kernel="packed")
    gan = DefenseGAN(cfg)
    # per-call request beats cfg.projection_kernel ...
    assert resolve_projection_kernel(gan, n=8, requested="xla") == "xla"
    # ... and no request falls back to the cfg value
    assert resolve_projection_kernel(gan, n=8) == "packed"
    # pallas requests still degrade off-TPU to the per-arch best
    assert resolve_projection_kernel(
        gan, n=256, requested="pallas", on_tpu=False) == "packed"


def test_reconstruct_kernel_override_runs_generic_path():
    cfg = Config(type="mnist", gen_dim=4, latent_dim=8, disc_dim=4,
                 rec_rr=2, rec_iters=2, projection_kernel="packed")
    gan = DefenseGAN(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 28, 28, 1),
                    jnp.float32)
    key = jax.random.key(7)
    a = gan.reconstruct(x, key, kernel="xla")
    # the generic path is cached under a non-packed signature
    assert (2, 2, cfg.rec_lr, False) in gan._reconstructors
    b = gan.reconstruct(x, key, kernel="xla")
    assert jnp.array_equal(a.x_hat, b.x_hat)  # deterministic given key
    assert a.x_hat.shape == x.shape


# ------------------------------------------------- CW chunk single SoT
def test_effective_cw_chunk():
    cfg = CWConfig(max_iterations=200)
    assert effective_cw_chunk(cfg, 25, abort_early=True) == 20
    assert effective_cw_chunk(cfg, 25, abort_early=False) == 25
    assert effective_cw_chunk(cfg, 1000, abort_early=False) == 200
    assert effective_cw_chunk(CWConfig(max_iterations=100), 100,
                              abort_early=True) == 10
    assert effective_cw_chunk(CWConfig(max_iterations=5), 100,
                              abort_early=True) == 1


# ------------------------------------------------ queue unknown steps
def test_queue_rejects_unknown_step(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import queue_lib

    monkeypatch.setattr(queue_lib, "QDIR", str(tmp_path))
    ran = []
    steps = [("alpha", lambda: ran.append("alpha"))]
    with pytest.raises(SystemExit) as ex:
        queue_lib.run_steps(steps, only=("alhpa",))
    assert ex.value.code == 2
    assert ran == []  # nothing silently ran
    assert "unknown step" in capsys.readouterr().out
