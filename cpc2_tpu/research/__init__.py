from .dim_reduction import PCA, SFALinear, buildPCA, buildSFA, loadDimReduction
from .clustering_criterion import (ClusteringLoss, DeepClustering,
                                   CTCCLustering, DeepEmbeddedClustering)

__all__ = ["PCA", "SFALinear", "buildPCA", "buildSFA", "loadDimReduction",
           "ClusteringLoss", "DeepClustering", "CTCCLustering",
           "DeepEmbeddedClustering"]
