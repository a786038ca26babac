"""Multi-block / multi-host cusk runner.

The reference leaves block-level data parallelism to the user ("run mps cusk
once for each block", `README.md:57`). This runner makes it first class:

* single host: iterate this process's partition of the block list (the
  device pipeline keeps the chip busy within each block),
* multi host (`jax.distributed` wired by
  :func:`cigwas_tpu.parallel.distributed.init_distributed`, or one
  `python -m cigwas_tpu.parallel.distributed` worker per partition): each
  process takes its load-balanced share via
  :func:`cigwas_tpu.parallel.block_scheduler.partition_blocks`; the merge
  step then reads all block outputs from the shared filesystem exactly like
  the reference's workflow, so no cross-host communication is needed beyond
  the file system.
"""

from __future__ import annotations

import os

from cigwas_tpu.io import read_blocks_from_file
from cigwas_tpu.parallel.block_scheduler import partition_blocks
from cigwas_tpu.pipelines.cusk import CuskContext
from cigwas_tpu.utils.timing import StageTimer


def run_all_blocks(
    phen_path: str,
    bed_base_path: str,
    block_path: str,
    alpha: float,
    max_level: int,
    max_level_two: int,
    depth: int,
    outdir: str,
    num_partitions: int | None = None,
    partition_index: int | None = None,
    verbose: bool = True,
) -> dict:
    """Run cusk for every block assigned to this partition.

    Returns {block_file_string: num_markers_retained | None (skipped)}.
    """
    blocks = read_blocks_from_file(block_path)
    mine = partition_blocks(blocks, num_partitions, partition_index)
    index_of = {b.to_file_string(): i for i, b in enumerate(blocks)}
    timer = StageTimer(verbose=verbose, prefix="[run_all_blocks] ")
    results: dict = {}
    ctx = CuskContext(
        phen_path,
        bed_base_path,
        block_path,
        alpha,
        max_level,
        max_level_two,
        depth,
        outdir,
        verbose=verbose,
    )
    # software pipeline: block i+1's host IO + pre-screen dispatch happen
    # before block i's finish, so disk reads and one device round-trip per
    # block hide behind the previous block's device work
    prepared = ctx.prepare(index_of[mine[0].to_file_string()]) if mine else None
    for i, b in enumerate(mine):
        stem = b.to_file_string()
        cur, prepared = prepared, (
            ctx.prepare(index_of[mine[i + 1].to_file_string()])
            if i + 1 < len(mine)
            else None
        )
        with timer.stage(stem):
            res = ctx.finish(cur)
        results[stem] = None if res is None else res.num_markers()
    if verbose:
        print(
            f"[run_all_blocks] processed {len(mine)} blocks in "
            f"{timer.total():.2f}s"
        )
    return results
