"""Block scheduling across processes / devices.

The reference distributes work by launching one `mps cusk <block>` process
per block on a cluster (`ci-gwas.py:100-104`, `README.md:57`). Here blocks
are partitioned programmatically: each host (jax process) takes a contiguous
load-balanced slice of the block list, weighted by block size squared (the
skeleton's correlation cost is quadratic in block size).
"""

from __future__ import annotations

import jax


def partition_blocks(
    blocks: list, num_partitions: int | None = None, index: int | None = None
) -> list:
    """Blocks assigned to partition `index` of `num_partitions`.

    Defaults to jax process count/index for multi-host runs. Greedy
    longest-processing-time assignment on block_size^2 keeps per-host cost
    balanced within ~the largest single block.
    """
    if num_partitions is None:
        num_partitions = jax.process_count()
    if index is None:
        index = jax.process_index()
    loads = [0] * num_partitions
    assign: list[list] = [[] for _ in range(num_partitions)]
    order = sorted(
        range(len(blocks)), key=lambda i: -(blocks[i].block_size() ** 2)
    )
    for i in order:
        tgt = loads.index(min(loads))
        assign[tgt].append(i)
        loads[tgt] += blocks[i].block_size() ** 2
    chosen = sorted(assign[index])
    return [blocks[i] for i in chosen]
