from ganon_tpu.classify.lca import LCA
from ganon_tpu.classify.engine import ClassifyConfig, FilterSpec, run_classify

__all__ = ["LCA", "ClassifyConfig", "FilterSpec", "run_classify"]
