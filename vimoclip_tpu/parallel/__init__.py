from vimoclip_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    local_batch_slice,
    commit_replicated,
    initialize_distributed,
)
from vimoclip_tpu.parallel.sequence import (  # noqa: F401
    allgather_attention,
    ring_attention,
    sequence_parallel_attention,
)
from vimoclip_tpu.parallel.pipelining import (  # noqa: F401
    merge_microbatches,
    pipeline_apply,
    split_microbatches,
    stack_stage_params,
    tfam_cross_pipeline_logits,
    unstack_stage_params,
)
from vimoclip_tpu.parallel.partition import (  # noqa: F401
    PartitionRules,
    TFAM_PARTITION_RULES,
    STUDENT_PARTITION_RULES,
    partition_params,
    shard_params,
)
