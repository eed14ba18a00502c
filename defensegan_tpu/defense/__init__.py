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
from defensegan_tpu.defense.audit import AuditedPipeline, AuditResult
from defensegan_tpu.defense.encoder_init import encoder_z0, train_encoder

__all__ = [
    "ReconstructionResult",
    "reconstruct",
    "make_reconstructor",
    "sample_z0",
    "DefendedPipeline",
    "PipelineResult",
    "AuditedPipeline",
    "AuditResult",
    "encoder_z0",
    "train_encoder",
]
