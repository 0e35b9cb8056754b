from ganon_tpu.parallel.mesh import make_mesh, ShardedClassifier

__all__ = ["make_mesh", "ShardedClassifier"]
