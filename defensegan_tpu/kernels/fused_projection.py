"""Fused Pallas projection kernel (work in progress).

Target: the scan body of defense/project.py — G(z), residual vs x, VJP w.r.t.
z, and the momentum update — fused into one Pallas program so z/v stay in
VMEM across all L steps and HBM traffic is only the generator weights.

Until the kernel lands, `projection_kernel_available()` returns False and
bench.py / callers fall back to the XLA-compiled path, which is already a
single jitted scan with zero host round-trips.
"""

from __future__ import annotations


def projection_kernel_available() -> bool:
    return False


def make_pallas_reconstructor(gan, *, rec_rr: int, rec_iters: int,
                              rec_lr: float, momentum: float):
    raise NotImplementedError(
        "Pallas fused projection kernel not implemented yet; "
        "use the XLA path (defense/project.py)")
