"""Individual-level per-block skeleton pipeline (`mps cusk` / `mps block`).

Equivalents of `cli.cpp:432-678` (cusk) and `cli.cpp:362-411` (make_blocks):
load one LD block of genotypes + standardized phenotypes, build the dense
correlation panel on the TPU, run the two-stage PC-stable skeleton with
ancestor reduction in between, and write the `.mdim/.ixs/.adj/.corr/.sep`
block output.
"""

from __future__ import annotations

import numpy as np

from cigwas_tpu.blocking import block_chr
from cigwas_tpu.constants import ML
from cigwas_tpu.io import (
    BedDims,
    BfilesBase,
    BimInfo,
    load_phen,
    make_path,
    read_blocks_from_file,
    read_floats_from_line_range,
    write_marker_blocks_to_file,
)
from cigwas_tpu.io.bed import check_path, check_prepped_bed_path, read_block_from_bed, read_chr_from_bed
from cigwas_tpu.ops.corr import (
    banded_row_abs_sums,
    corr_panel_device,
    kendall_npn_corr,
    kendall_npn_corr_banded,
    marker_phen_corr,
    pack_square_corr,
    phen_phen_corr,
)
from cigwas_tpu.skeleton import reduce_gcs, skeleton, subset_variables
from cigwas_tpu.utils.stats import fisher_z, threshold_array


def make_blocks(
    bed_base_path: str,
    max_block_size: int,
    corr_width: int,
    out_path: str | None = None,
    verbose: bool = True,
) -> list:
    """Partition every chromosome into LD blocks (`make_blocks`, `cli.cpp:362-411`).

    The reference takes a device-mem budget to size its streaming batches;
    the TPU path tiles internally, so no budget parameter is needed.
    """
    bfiles = BfilesBase(bed_base_path)
    dims = BedDims.from_bfiles(bfiles)
    bim = BimInfo(bfiles.bim())
    out_path = out_path or bfiles.blocks(max_block_size)

    all_blocks = []
    for cid in bim.chr_ids:
        if verbose:
            print(f"[chr {cid}] loading bed data")
        chr_bed = read_chr_from_bed(bfiles.bed(), cid, bim, dims)
        if verbose:
            print(f"[chr {cid}] computing banded correlations")
        band = kendall_npn_corr_banded(chr_bed, dims.num_samples, corr_width)
        row_sums = banded_row_abs_sums(band)
        blocks = block_chr(row_sums, cid, max_block_size)
        if verbose:
            print(f"[chr {cid}] partitioned into {len(blocks)} blocks")
        write_marker_blocks_to_file(blocks, out_path)
        all_blocks.extend(blocks)
    return all_blocks


def cusk(
    phen_path: str,
    bed_base_path: str,
    block_path: str,
    alpha: float,
    max_level: int,
    max_level_two: int,
    depth: int,
    outdir: str,
    block_index: int,
    verbose: bool = True,
):
    """Two-stage skeleton for a single LD block (`cusk`, `cli.cpp:432-678`).

    Returns the written ReducedGCS, or None if the block was skipped because
    no marker–phenotype correlation is significant (`cli.cpp:561-576`).
    """
    check_prepped_bed_path(bed_base_path)
    check_path(phen_path)
    check_path(block_path)
    check_path(outdir)

    phen = load_phen(phen_path)
    bfiles = BfilesBase(bed_base_path)
    dims = BedDims.from_file(bfiles.dim())
    if phen.num_samples != dims.num_samples:
        raise ValueError("different num samples in phen and dims")
    bim = BimInfo(bfiles.bim())
    num_individuals = dims.num_samples
    num_phen = phen.num_phen

    blocks = read_blocks_from_file(block_path)
    for b in blocks:
        if (
            b.first_marker_ix >= bim.get_num_markers_on_chr(b.chr_id)
            or b.last_marker_ix >= bim.get_num_markers_on_chr(b.chr_id)
        ):
            raise ValueError(
                f"block out of bounds with first_ix: {b.first_marker_ix} "
                f"last_ix: {b.last_marker_ix}"
            )

    Th = threshold_array(num_individuals, alpha)
    block = blocks[block_index]
    num_markers = block.block_size()
    if verbose:
        print(f"Processing block {block_index + 1} / {len(blocks)} ({num_markers} markers)")

    bedblock = read_block_from_bed(bfiles.bed(), block, dims, bim)
    chr_start = bim.get_global_chr_start(block.chr_id)
    means = read_floats_from_line_range(
        bfiles.means(),
        chr_start + block.first_marker_ix,
        chr_start + block.last_marker_ix,
    )
    stds = read_floats_from_line_range(
        bfiles.stds(),
        chr_start + block.first_marker_ix,
        chr_start + block.last_marker_ix,
    )
    if means.size != num_markers or stds.size != num_markers:
        raise ValueError("block size and number of means or stds differ")

    # pre-screen: skip blocks without any significant marker-phen correlation
    mp_corr = marker_phen_corr(bedblock, phen.data, means, stds, num_individuals)
    with np.errstate(divide="ignore", invalid="ignore"):
        num_sig = int((fisher_z(mp_corr) >= Th[0]).sum())
    if num_sig == 0:
        if verbose:
            print("No significant correlations found. Skipping block.")
        return None
    if verbose:
        print(f"Found {num_sig} marker-phen correlations. Proceeding.")

    num_var = num_markers + num_phen
    if num_markers <= 4096:
        # fused device panel: decode once, keep C on device for the skeleton
        C_dev, v_panel = corr_panel_device(
            bedblock, phen.data, means, stds, num_individuals
        )
        sq_corrs = np.asarray(C_dev)[:v_panel, :v_panel]
        res1 = skeleton(sq_corrs, Th, max_level, verbose=verbose, C_dev=C_dev)
    else:
        mm_corr = kendall_npn_corr(bedblock, num_individuals)
        pp_corr = phen_phen_corr(phen.data)
        sq_corrs = pack_square_corr(mm_corr, mp_corr, pp_corr)
        res1 = skeleton(sq_corrs, Th, max_level, verbose=verbose)
    keep = subset_variables(res1.G, num_var, num_markers, depth)
    gcs = reduce_gcs(res1.G, sq_corrs, res1.sepset, keep, num_var, num_phen, max_level)

    # stage 2 (`reduced_gcs_cusk`, `cli.cpp:62-87`): Skeleton re-screens from
    # the reduced correlations (its level 0 rebuilds the adjacency)
    if verbose:
        print("Starting second cusk stage")
    res2 = skeleton(gcs.C, Th, max_level_two, verbose=verbose)
    keep2 = subset_variables(res2.G, gcs.num_var, gcs.num_markers(), depth)
    gcs2 = reduce_gcs(
        res2.G,
        gcs.C,
        res2.sepset,
        keep2,
        gcs.num_var,
        num_phen,
        ML,
        index_map=gcs.new_to_old_indices,
    )
    if verbose:
        print(f"Retained {gcs2.num_markers()} markers")
    gcs2.to_file(make_path(outdir, block.to_file_string(), ""))
    return gcs2
