"""Pallas TPU kernels for the projection hot loop.

The reference (kabkabm/defensegan) has zero native/CUDA code of its own — all
compute sits inside the TF1 binary (SURVEY.md section 2). The TPU-native
equivalent of its hot path is built here: a fused per-step
loss+grad+momentum-update kernel for the z-projection loop, used when the
XLA-compiled baseline (defense/project.py) leaves MXU throughput on the table.
"""

from defensegan_tpu.kernels.fused_projection import (
    projection_kernel_available,
    make_pallas_reconstructor,
)

__all__ = ["projection_kernel_available", "make_pallas_reconstructor"]
