"""Device mesh + sharding helpers.

The reference (kabkabm/defensegan) is single-process single-GPU with zero
collectives; this module is new TPU-native machinery: a 1-D `data` mesh over
ICI, batch sharded across it, params replicated. XLA's GSPMD partitioner
inserts the gradient psums (see SURVEY.md section 2, parallelism table).
Multi-host bootstrap + the explicit-collective shard_map train step live in
parallel/distributed.py.
"""

from defensegan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    validate_batch_for_mesh,
    validate_projection_sharding,
)
from defensegan_tpu.parallel.distributed import (
    global_batch_sharding,
    initialize_distributed,
    make_shard_map_train_step,
)
from defensegan_tpu.parallel.serving import ShardedDefenseGAN
from defensegan_tpu.parallel.tp import (MODEL_AXIS, make_mesh_2d,
                                        shard_params_tp, tp_spec)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "validate_batch_for_mesh",
           "validate_projection_sharding", "initialize_distributed",
           "make_shard_map_train_step", "global_batch_sharding",
           "ShardedDefenseGAN", "MODEL_AXIS", "make_mesh_2d",
           "shard_params_tp", "tp_spec"]
