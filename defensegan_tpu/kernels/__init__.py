"""TPU-first Pallas kernels for the projection hot loop.

The reference (kabkabm/defensegan) has zero native/CUDA code of its own —
all compute sits inside the TF1 binary (SURVEY.md section 2). The
TPU-native equivalents of its hot path live here; both run the WHOLE
R x L momentum-GD loop VMEM-resident and beat the XLA scan on a v5e chip
(RESULTS.md round 2):

  - fused_projection_v2: the wide single-deconv generator as an all-matmul
    dense chain (3676 recon/s vs 2570 XLA at R=10, L=200).
  - fused_projection_v3: the reference-depth two-deconv generator in
    space-to-depth form — convs as tap matmuls + static row shifts
    (1131 recon/s vs 896 XLA; the 1000 BASELINE target falls on the
    reference-faithful topology).
  - fused_projection_v4: the multi-deconv 64x64 stacks (celeba/
    imagenet64 deep and wide) as per-level grid-convs with in-kernel
    interleaves and a folded out level. OPT-IN (pallas_v4) until its
    on-chip gate + A/B pass (round 4; scripts/fused_projection_v4_exp.py).

Round 1's tap-loop kernel and im2col matmul generator were superseded by
v2/v3 and removed (their post-mortems live in RESULTS.md).
"""

from defensegan_tpu.kernels.fused_projection_v2 import (
    dense_kernel_available,
    make_pallas_dense_reconstructor,
)
from defensegan_tpu.kernels.fused_projection_v2i import (
    make_pallas_dense_int8_reconstructor,
)
from defensegan_tpu.kernels.fused_projection_v3 import (
    make_pallas_s2d_reconstructor,
    s2d_kernel_available,
)
from defensegan_tpu.kernels.fused_projection_v4 import (
    make_v4_reconstructor,
    v4_kernel_available,
)

__all__ = [
    "dense_kernel_available",
    "make_pallas_dense_reconstructor",
    "make_pallas_dense_int8_reconstructor",
    "s2d_kernel_available",
    "make_pallas_s2d_reconstructor",
    "v4_kernel_available",
    "make_v4_reconstructor",
]
