from ganon_tpu.index.config import IBFConfig
from ganon_tpu.index.ibf import IBF, build_ibf
from ganon_tpu.index import sizing

__all__ = ["IBFConfig", "IBF", "build_ibf", "sizing"]
