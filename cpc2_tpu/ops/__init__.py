from .dtw import dtw_batch, dtw_normalized, dtw_normalized_auto
from .dtw_pallas import dtw_normalized_pallas

__all__ = ["dtw_batch", "dtw_normalized", "dtw_normalized_auto",
           "dtw_normalized_pallas"]
