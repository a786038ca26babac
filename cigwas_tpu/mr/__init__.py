from cigwas_tpu.mr.mvivw import run_mvivw, mv_ivw_regression

__all__ = ["run_mvivw", "mv_ivw_regression"]
