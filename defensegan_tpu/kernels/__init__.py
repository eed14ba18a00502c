"""TPU-first kernels for the projection hot loop.

The reference (kabkabm/defensegan) has zero native/CUDA code of its own — all
compute sits inside the TF1 binary (SURVEY.md section 2). The TPU-native
equivalents of its hot path live here:

  - matmul_generator: the frozen generator re-expressed as im2col matmuls
    (BN folded) so XLA maps the projection loop straight onto the MXU.
  - fused_projection: Pallas fused per-step kernel (loss+grad+momentum with
    weights/z/v VMEM-resident).
"""

import jax

from defensegan_tpu.kernels.matmul_generator import (apply_packed,
                                                     pack_generator)
from defensegan_tpu.kernels.fused_projection import (
    projection_kernel_available,
    make_pallas_reconstructor,
)
from defensegan_tpu.kernels.fused_projection_v2 import (
    dense_kernel_available,
    make_pallas_dense_reconstructor,
)
from defensegan_tpu.kernels.fused_projection_v3 import (
    make_pallas_s2d_reconstructor,
    s2d_kernel_available,
)


def make_matmul_reconstructor(gan, *, rec_rr: int, rec_iters: int,
                              rec_lr: float, momentum: float,
                              dtype=None):
    """Jitted f(x, key) -> ReconstructionResult on the MXU-first generator.

    Drop-in replacement for DefenseGAN.reconstruct's XLA path; numerically
    equivalent to tolerance (tests/test_matmul_generator.py).
    """
    import jax.numpy as jnp

    from defensegan_tpu.defense.project import reconstruct, sample_z0

    if dtype is None:
        dtype = gan.generator.dtype
    packed = pack_generator(
        gan.generator,
        {"params": gan.state.gen_params, "batch_stats": gan.state.gen_stats},
        dtype=dtype)

    def gen_apply(z):
        return apply_packed(packed, z)

    z_dim = gan.cfg.latent_dim

    @jax.jit
    def run(x, key):
        z0 = sample_z0(key, x.shape[0], rec_rr, z_dim)
        return reconstruct(gen_apply, x, z0, rec_iters=rec_iters,
                           rec_lr=rec_lr, momentum=momentum)

    return run


__all__ = [
    "apply_packed",
    "pack_generator",
    "make_matmul_reconstructor",
    "projection_kernel_available",
    "make_pallas_reconstructor",
    "dense_kernel_available",
    "make_pallas_dense_reconstructor",
    "s2d_kernel_available",
    "make_pallas_s2d_reconstructor",
]
