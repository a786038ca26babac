"""Extract golden parity fixtures from the reference checkout into tests/data.

The reference commits its expected outputs as C++ headers and small data
files (`cusk/include/test_data/*.h`, `cusk/tests/test_files/*`). This script
parses the *data values* out of those fixtures and caches them as .npz/.npy
plus verbatim copies of the tiny input files, so the parity tests can run
without the reference tree present.

Run from the repo root:  python tests/tools/extract_fixtures.py
"""

from __future__ import annotations

import os
import re
import shutil
import sys

import numpy as np

REFERENCE = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "data")


def _parse_brace_array(text: str, name: str, pattern: str | None = None):
    pat = pattern or (re.escape(name) + r"[^{]*\{(.*?)\}")
    m = re.search(pat, text, re.S)
    if m is None:
        raise ValueError(f"could not find {name}")
    body = "\n".join(
        line.split("//")[0] for line in m.group(1).splitlines()
    )
    vals = [v.strip() for v in body.replace("\n", " ").split(",") if v.strip()]
    return vals


def extract_n10() -> None:
    path = os.path.join(REFERENCE, "cusk/include/test_data/cupc_test_set.h")
    txt = open(path).read()
    A = np.array([int(v) for v in _parse_brace_array(txt, "A_N10")], dtype=np.int32)
    C = np.array([float(v) for v in _parse_brace_array(txt, "C_N10")], dtype=np.float32)
    alpha = float(re.search(r"ALPHA_N10 = ([0-9.e-]+)", txt).group(1))
    n = int(re.search(r"SAMPLE_SIZE_N10 = (\d+)", txt).group(1))
    np.savez(
        os.path.join(DATA, "n10.npz"),
        A=A.reshape(10, 10),
        C=C.reshape(10, 10),
        alpha=alpha,
        sample_size=n,
    )
    print("wrote n10.npz")


def extract_blocking() -> None:
    path = os.path.join(REFERENCE, "cusk/include/test_data/blocking_test_set.h")
    txt = open(path).read()
    v = np.array(
        [
            float(x)
            for x in _parse_brace_array(txt, "TEST_V", pattern=r"TEST_V = \{(.*?)\};")
        ],
        dtype=np.float32,
    )
    smooth = np.array(
        [float(x) for x in _parse_brace_array(txt, "TEST_V_SMOOTH")], dtype=np.float64
    )
    np.savez(os.path.join(DATA, "blocking.npz"), v=v, smooth=smooth)
    print(f"wrote blocking.npz ({v.size} values)")


def extract_parent_set() -> None:
    path = os.path.join(REFERENCE, "cusk/include/test_data/parent_set_test_set.h")
    txt = open(path).read()
    adj = np.array(
        [int(x) for x in _parse_brace_array(txt, "TEST_ADJ_MAT")], dtype=np.int32
    )
    num_markers = int(re.search(r"TEST_NUM_MARKERS = (\d+)", txt).group(1))
    num_phen = int(re.search(r"TEST_NUM_PHEN = (\d+)", txt).group(1))
    sets = {}
    for d in (0, 1, 2):
        sets[f"d{d}"] = np.array(
            [int(x) for x in _parse_brace_array(txt, f"TEST_PAR_SET_D{d}")],
            dtype=np.int32,
        )
    np.savez(
        os.path.join(DATA, "parent_set.npz"),
        adj=adj,
        num_markers=num_markers,
        num_phen=num_phen,
        **sets,
    )
    print("wrote parent_set.npz")


def copy_test_files() -> None:
    src = os.path.join(REFERENCE, "cusk/tests/test_files")
    dst = os.path.join(DATA, "test_files")
    os.makedirs(dst, exist_ok=True)
    for name in (
        "small.bed",
        "small.bim",
        "small.fam",
        "small.phen",
        "with_nan.phen",
        "small_mxm.bin",
        "marker_indices.bin",
        "marker_trait_summary_stats.txt",
        "trait_summary_stats.txt",
        "blocks.txt",
        "time_index.txt",
        "distance.bim",
        "wrong_magic_num_one.bed",
        "wrong_magic_num_two.bed",
        "wrong_magic_num_three.bed",
    ):
        p = os.path.join(src, name)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(dst, name))
    print("copied test input files")


def main() -> int:
    if not os.path.isdir(REFERENCE):
        print("reference tree not found; nothing to do")
        return 1
    os.makedirs(DATA, exist_ok=True)
    extract_n10()
    extract_blocking()
    extract_parent_set()
    extract_bed_marker()
    copy_test_files()
    return 0




def extract_bed_marker() -> None:
    """bmt/bmt2 correlation fixtures from bed_marker_test_set.h."""
    path = os.path.join(REFERENCE, "cusk/include/test_data/bed_marker_test_set.h")
    txt = open(path).read()

    def arr(name, dtype=np.float32, pattern=None):
        vals = _parse_brace_array(txt, name, pattern=pattern)
        if dtype == np.uint8:
            return np.array([int(v, 0) for v in vals], dtype=np.uint8)
        return np.array([float(v) for v in vals], dtype=dtype)

    out = {
        "bmt_marker_vals": arr("bmt_marker_vals", np.uint8),
        "bmt_marker_mean": arr("bmt_marker_mean"),
        "bmt_marker_std": arr("bmt_marker_std"),
        "bmt_phen_vals": arr("bmt_phen_vals"),
        "bmt2_marker_vals": arr("bmt2_marker_vals", np.uint8),
        "bmt2_marker_mean": arr("bmt2_marker_mean"),
        "bmt2_marker_std": arr("bmt2_marker_std"),
        "bmt2_phen_vals": arr("bmt2_phen_vals"),
        "bmt2_marker_corrs": arr("bmt2_marker_corrs", pattern=r"bmt2_marker_corrs\[[^\]]*\] = \{(.*?)\};"),
        "bmt2_marker_corrs_pearson": arr("bmt2_marker_corrs_pearson"),
        "bmt2_marker_corr_antidiag_sums": arr("bmt2_marker_corr_antidiag_sums"),
        "bmt2_sparse_corrs": arr(
            "bmt2_sparse_corrs",
            pattern=r"\nconst float bmt2_sparse_corrs\[[^\]]*\] = \{(.*?)\};",
        ),
    }
    for extra in ("bmt_marker_corrs", "bmt_marker_phen_corrs", "bmt_phen_corrs"):
        try:
            out[extra] = arr(extra, pattern=re.escape(extra) + r"\[[^\]]*\] = \{(.*?)\};")
        except ValueError:
            pass
    np.savez(os.path.join(DATA, "bed_marker.npz"), **out)
    print("wrote bed_marker.npz:", sorted(out))


if __name__ == "__main__":
    sys.exit(main())
