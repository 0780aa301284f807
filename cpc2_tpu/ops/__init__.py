from .dtw import dtw_batch, dtw_normalized

__all__ = ["dtw_batch", "dtw_normalized"]
