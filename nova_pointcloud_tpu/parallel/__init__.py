from nova_pointcloud_tpu.parallel.mesh import create_mesh, local_shard_indices  # noqa: F401
from nova_pointcloud_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    make_sharded_train_step,
    opt_state_sharding,
    param_sharding,
    tp_spec_for_param,
    zero3_param_sharding,
)
from nova_pointcloud_tpu.parallel.pipeline import (  # noqa: F401
    make_pipelined_apply,
    merge_microbatches,
    pipelined_apply,
    split_microbatches,
    stack_stage_params,
    stage_param_sharding,
    unstack_stage_params,
)
from nova_pointcloud_tpu.parallel.ring_attention import (  # noqa: F401
    make_ring_attention,
    ring_attention,
)
