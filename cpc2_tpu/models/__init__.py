from .encoder import CPCEncoder, MFCCEncoder, LFBEncoder, ChannelNorm
from .ar import CPCAR, NoAr, BiDIRAR, BiDIRARTangled
from .transformer import (TransformerAR, MultiHeadTransformerAR,
                          build_transformer_ar, build_multihead_transformer_ar)
from .cpc import CPCModel, CPCBertModel, ConcatenatedModel

__all__ = [
    "CPCEncoder", "MFCCEncoder", "LFBEncoder", "ChannelNorm",
    "CPCAR", "NoAr", "BiDIRAR", "BiDIRARTangled",
    "TransformerAR", "MultiHeadTransformerAR",
    "build_transformer_ar", "build_multihead_transformer_ar",
    "CPCModel", "CPCBertModel", "ConcatenatedModel",
]
