from .audio_io import load_audio, save_audio, audio_info
from .corpus import findAllSeqs, find_all_seqs, filterSeqs, filter_seqs, \
    parseSeqLabels, parse_seq_labels
from .dataset import AudioBatchData, AudioLoader, PeakNorm
from .samplers import (UniformAudioSampler, SequentialSampler,
                       SameSpeakerSampler, TemporalSameSpeakerSampler,
                       BatchSampler)

__all__ = [
    "load_audio", "save_audio", "audio_info", "findAllSeqs", "find_all_seqs",
    "filterSeqs", "filter_seqs", "parseSeqLabels", "parse_seq_labels",
    "AudioBatchData", "AudioLoader", "PeakNorm", "UniformAudioSampler",
    "SequentialSampler", "SameSpeakerSampler", "TemporalSameSpeakerSampler",
    "BatchSampler",
]
