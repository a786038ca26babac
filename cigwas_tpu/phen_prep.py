"""Phenotype file preparation: merge, reorder and validate trait files.

Equivalent of `cusk/scripts/phen_prep.py`: aligns one or more
space-separated phenotype files (FID/IID or IID/FID headers, "EID" accepted
as IID) to the sample order of a .fam file, validates that traits are
standardized, and writes the merged tab-separated .phen consumed by cusk.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


def _is_iid(col: str) -> bool:
    return str(col).upper() in ("IID", "EID")


def _is_fid(col: str) -> bool:
    return str(col).upper() == "FID"


@dataclass
class PhenotypesFile:
    filepath: str
    columns: list[str]

    def load_aligned(self, fam_df: pd.DataFrame) -> pd.DataFrame:
        df = pd.read_csv(self.filepath, sep=" ")
        c0, c1 = df.columns[0], df.columns[1]
        if _is_fid(c0) and _is_iid(c1):
            df = df.rename(columns={c0: "FID", c1: "IID"})
        elif _is_iid(c0) and _is_fid(c1):
            df = df.rename(columns={c0: "IID", c1: "FID"})
        else:
            raise ValueError(f"Header of {self.filepath} is invalid")
        if len(df.columns) == 3 and self.columns:
            df = df.rename(columns={df.columns[-1]: self.columns[0]})
        df = df[["FID", "IID", *self.columns]]
        df = df.set_index("IID").reindex(index=fam_df["IID"]).reset_index()
        return df.drop(columns=["IID", "FID"])


def load_fam(filepath: str) -> pd.DataFrame:
    return pd.read_csv(
        filepath,
        sep=" ",
        header=None,
        names=["FID", "IID", "Father", "Mother", "Sex", "Phen"],
    )


def is_standardized(df: pd.DataFrame) -> bool:
    return bool(
        np.all(np.abs(df.std(axis=0).values - 1) < 0.1)
        and np.all(np.abs(df.mean(axis=0).values) < 0.1)
    )


def merge_phenos(phenos: list[PhenotypesFile], fam_path: str) -> pd.DataFrame:
    fam_df = load_fam(fam_path)
    dfs = []
    for p in phenos:
        cur = p.load_aligned(fam_df)
        if not is_standardized(cur):
            raise ValueError(
                f"data in {p.filepath} seems not precisely standardized"
            )
        dfs.append(cur)
    return pd.concat([fam_df[["FID", "IID"]], *dfs], axis=1)


def make_merged_pheno_file(
    phenos: list[PhenotypesFile], fam_path: str, outfile: str
) -> None:
    merged = merge_phenos(phenos, fam_path)
    merged.to_csv(outfile, sep="\t", index=False, na_rep="nan")
