from .clustering import (kMeanCluster, kMeanGPU, fastDPMean, KMean,
                         distanceEstimation, save_clustering_checkpoint,
                         load_clustering_checkpoint)

__all__ = ["kMeanCluster", "kMeanGPU", "fastDPMean", "KMean",
           "distanceEstimation", "save_clustering_checkpoint",
           "load_clustering_checkpoint"]
