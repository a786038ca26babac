from cigwas_tpu.mr.mvivw import run_mvivw, run_mvivw_filtered, mv_ivw_regression

__all__ = ["run_mvivw", "run_mvivw_filtered", "mv_ivw_regression"]
