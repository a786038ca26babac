"""cigwas_tpu — a TPU-native causal discovery engine for genome-wide association data.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of CI-GWAS
(medical-genomics-group/ci-gwas): massively parallel conditional-independence
testing (PC-stable skeleton search), LD blocking, marker/trait correlation
panels on the MXU, separation-set selection, RFCI PAG orientation and
multivariable IVW Mendelian randomization.

Layer map (see SURVEY.md for the reference equivalents):

- :mod:`cigwas_tpu.io`        — PLINK .bed/.bim/.fam, .phen, summary stats, block files
- :mod:`cigwas_tpu.ops`       — device ops: 2-bit decode, correlation panels, batched CI tests
- :mod:`cigwas_tpu.skeleton`  — level-wise PC-stable skeleton engines (cuPC-S equivalents)
- :mod:`cigwas_tpu.blocking`  — LD-block boundary search
- :mod:`cigwas_tpu.pipelines` — cusk / cuskss end-to-end per-block workflows
- :mod:`cigwas_tpu.merge`     — block merging, sepselect, MR assumption checks
- :mod:`cigwas_tpu.pag`       — sRFCI R1–R10 PAG orientation
- :mod:`cigwas_tpu.mr`        — multivariable IVW Mendelian randomization
- :mod:`cigwas_tpu.parallel`  — device meshes, block scheduling, sharded panels
"""

import os as _os

from cigwas_tpu.constants import ML

__version__ = "0.1.0"
__all__ = ["ML", "__version__"]


def _enable_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache unless explicitly disabled.

    TPU compiles through the remote tunnel are slow (>60s per kernel shape);
    the on-disk cache makes repeat invocations of the engine cheap.
    """
    if _os.environ.get("CIGWAS_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "cigwas_tpu_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _tune_malloc() -> None:
    """Keep GB-scale host buffers in the malloc arena (Linux glibc).

    glibc serves large allocations with mmap and returns them to the OS on
    free, so every per-block scratch array (the (n, n, l) sepsets, removal
    masks, ...) re-faults fresh pages — measured 8.2 s for a 1.5 GB
    `np.full` at the 11k block on this VM vs 0.3 s from recycled pages.
    Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD makes the first block pay
    the fault cost once and every later block reuse the pages.
    """
    if _os.environ.get("CIGWAS_TPU_NO_MALLOC_TUNE"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_enable_compilation_cache()
_tune_malloc()
