"""cpc2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Contrastive
Predictive Coding on raw audio.

Re-designed from scratch with the capabilities of the reference PyTorch
implementation (MarvinLvn/CPC2): CPC pretraining (strided-conv encoder +
recurrent/transformer context nets + multi-step InfoNCE), host-side streaming
data pipeline with speaker/temporal samplers and waveform augmentations, and
the full evaluation stack (linear separability, ABX, k-means/DP-means
quantization, CTC phone recognition, ZeroSpeech export).

Public surface parity: flag names/defaults follow the reference
(`cpc/cpc_default_config.py`), checkpoints interoperate with the reference's
torch-pickle format, and CLI entry points mirror `cpc/train.py` and
`cpc/eval/*`.
"""

__version__ = "0.1.0"
