from cigwas_tpu.parallel.mesh import make_mesh
from cigwas_tpu.parallel.spmd import build_multichip_cusk_step
from cigwas_tpu.parallel.block_scheduler import partition_blocks
from cigwas_tpu.parallel.distributed import init_distributed, process_partition
from cigwas_tpu.parallel.runner import run_all_blocks
from cigwas_tpu.parallel.sharded import RowShardedEngine, ShardedEngine

__all__ = [
    "RowShardedEngine",
    "make_mesh",
    "build_multichip_cusk_step",
    "partition_blocks",
    "init_distributed",
    "process_partition",
    "run_all_blocks",
    "ShardedEngine",
]
