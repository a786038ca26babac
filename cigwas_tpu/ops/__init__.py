from cigwas_tpu.ops.decode import unpack_bed_codes, geno_onehot
from cigwas_tpu.ops.corr import (
    kendall_npn_corr,
    kendall_npn_corr_banded,
    marker_phen_corr,
    phen_phen_corr,
    pack_square_corr,
)

__all__ = [
    "unpack_bed_codes",
    "geno_onehot",
    "kendall_npn_corr",
    "kendall_npn_corr_banded",
    "marker_phen_corr",
    "phen_phen_corr",
    "pack_square_corr",
]
