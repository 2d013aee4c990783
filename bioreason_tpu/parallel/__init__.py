from bioreason_tpu.parallel.mesh import make_mesh, make_multislice_mesh, MESH_AXES
from bioreason_tpu.parallel.partition import (
    partition_rules_decoder, partition_rules_encoder, partition_rules_fusion,
    specs_for_params, shard_params, batch_spec,
)
