from cigwas_tpu.pipelines.cusk import cusk, make_blocks
from cigwas_tpu.pipelines.cuskss import CuskssArgs, cuskss

__all__ = ["cusk", "make_blocks", "CuskssArgs", "cuskss"]
