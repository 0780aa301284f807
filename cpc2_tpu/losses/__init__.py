from .criterion import (CPCUnsupervisedCriterion, CPCUnsupersivedCriterion,
                        PredictionNetwork, MultiHeadPredictionNetwork,
                        SpeakerCriterion, AdvSpeakerCriterion, PhoneCriterion,
                        CTCPhoneCriterion, NoneCriterion, FFNetwork,
                        ShiftedConv)
from .custom_layers import (EqualizedLinear, EqualizedConv1d,
                            NormalizationLayer, Upscale2d, upscale2d)
from .seq_alignment import (beam_search, collapse_label_chain,
                            collapseLabelChain, needleman_wunsch_align_score,
                            get_seq_PER, getPER)
from .bert import CPCBertCriterion

__all__ = [
    "CPCUnsupervisedCriterion", "CPCUnsupersivedCriterion",
    "PredictionNetwork", "MultiHeadPredictionNetwork", "SpeakerCriterion",
    "AdvSpeakerCriterion", "PhoneCriterion", "CTCPhoneCriterion",
    "NoneCriterion", "FFNetwork", "ShiftedConv", "EqualizedLinear",
    "EqualizedConv1d", "NormalizationLayer", "beam_search",
    "collapse_label_chain", "collapseLabelChain",
    "needleman_wunsch_align_score", "get_seq_PER", "getPER",
    "CPCBertCriterion",
]
