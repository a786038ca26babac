from cigwas_tpu.pag.rfci import (
    estimate_pag,
    udag2apag,
    rule_functions,
)

__all__ = ["estimate_pag", "udag2apag", "rule_functions"]
