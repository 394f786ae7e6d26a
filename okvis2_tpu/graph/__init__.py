from okvis2_tpu.graph.mst import max_spanning_tree
from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig

__all__ = ["max_spanning_tree", "Estimator", "EstimatorConfig"]
