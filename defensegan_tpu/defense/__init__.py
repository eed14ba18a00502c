"""The Defense-GAN projection core.

Reference parity: models/gan.py::DefenseGANBase.reconstruct of
kabkabm/defensegan (~L350-500).
"""

from defensegan_tpu.defense.project import (
    ReconstructionResult,
    reconstruct,
    make_reconstructor,
    sample_z0,
)
from defensegan_tpu.defense.pipeline import DefendedPipeline, PipelineResult

__all__ = [
    "ReconstructionResult",
    "reconstruct",
    "make_reconstructor",
    "sample_z0",
    "DefendedPipeline",
    "PipelineResult",
]
