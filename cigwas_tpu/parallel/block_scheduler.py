"""Block scheduling across processes / devices.

The reference distributes work by launching one `mps cusk <block>` process
per block on a cluster (`ci-gwas.py:100-104`, `README.md:57`). Here blocks
are partitioned programmatically: each host (jax process) takes a contiguous
load-balanced slice of the block list, weighted by block size squared (the
skeleton's correlation cost is quadratic in block size).
"""

from __future__ import annotations

import jax

# fixed per-block cost (device dispatch round-trips + host IO + pre-screen),
# expressed in block_size^2 units: roughly the compute of a 128-marker
# block. Dominates for small blocks, vanishes against genome-scale blocks.
BLOCK_OVERHEAD_COST = 128 * 128


def block_cost(block) -> int:
    """Wall-cost model for one block: quadratic skeleton work + fixed
    per-block overhead (the reference pays the same shape of cost per `mps
    cusk` process launch, `ci-gwas.py:100-104`)."""
    return block.block_size() ** 2 + BLOCK_OVERHEAD_COST


def partition_blocks(
    blocks: list, num_partitions: int | None = None, index: int | None = None
) -> list:
    """Blocks assigned to partition `index` of `num_partitions`.

    Defaults to jax process count/index for multi-host runs. Greedy
    longest-processing-time assignment on `block_cost` keeps per-host wall
    balanced within ~the largest single block.
    """
    if num_partitions is None:
        num_partitions = jax.process_count()
    if index is None:
        index = jax.process_index()
    loads = [0] * num_partitions
    assign: list[list] = [[] for _ in range(num_partitions)]
    order = sorted(range(len(blocks)), key=lambda i: -block_cost(blocks[i]))
    for i in order:
        tgt = loads.index(min(loads))
        assign[tgt].append(i)
        loads[tgt] += block_cost(blocks[i])
    chosen = sorted(assign[index])
    return [blocks[i] for i in chosen]
