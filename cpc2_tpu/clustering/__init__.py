from .clustering import (kMeanCluster, kMeanClusterStep, kMeanGPU,
                         fastDPMean, KMean, distanceEstimation,
                         save_clustering_checkpoint,
                         load_clustering_checkpoint)

__all__ = ["kMeanCluster", "kMeanClusterStep", "kMeanGPU", "fastDPMean",
           "KMean", "distanceEstimation", "save_clustering_checkpoint",
           "load_clustering_checkpoint"]
