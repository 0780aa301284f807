"""Flag registry for the CPC2-TPU framework.

Keeps the exact public flag names, defaults and choices of the reference
(`/root/reference/cpc/cpc_default_config.py:13-162` and the train-only flag
groups of `/root/reference/cpc/train.py:550-632`) so that existing recipes,
sweep grids and `checkpoint_args.json` files work unchanged. Help texts are
our own; only the machine-readable surface (names, types, defaults,
choices) mirrors the reference.

The registry is a plain argparse parser; `get_default_cpc_config()` returns a
Namespace with every architecture/augmentation default populated, which is the
canonical config object passed around the framework (it round-trips through
JSON for checkpoint side-files).
"""

import argparse


def get_default_cpc_config():
    parser = set_default_cpc_config(argparse.ArgumentParser())
    return parser.parse_args([])


def set_default_cpc_config(parser):
    group = parser.add_argument_group(
        'Architecture configuration',
        description='Model architecture flags.')
    group.add_argument('--hiddenEncoder', type=int, default=256,
                       help='Channel width of the convolutional encoder.')
    group.add_argument('--hiddenGar', type=int, default=256,
                       help='State size of the context (AR) network.')
    group.add_argument('--nPredicts', type=int, default=12,
                       help='How many future frames the CPC loss predicts.')
    group.add_argument('--negativeSamplingExt', type=int, default=128,
                       help='InfoNCE negatives drawn per window position.')
    group.add_argument('--optimizer', type=str, default='adam',
                       choices=['adam', 'sgd'],
                       help='Which optimizer drives training.')
    group.add_argument('--learningRate', type=float, default=2e-4)
    group.add_argument('--schedulerStep', type=int, default=-1,
                       help='Halve the learning rate every this many '
                       'epochs; negative disables the schedule.')
    group.add_argument('--schedulerRamp', type=int, default=None,
                       help='Length (in updates) of a linear LR warm-up '
                       'prepended to training.')
    group.add_argument('--beta1', type=float, default=0.9,
                       help='Adam first-moment decay.')
    group.add_argument('--beta2', type=float, default=0.999,
                       help='Adam second-moment decay.')
    group.add_argument('--epsilon', type=float, default=1e-08,
                       help='Adam denominator fuzz term.')
    group.add_argument('--sizeWindow', type=int, default=20480,
                       help='Samples per training window (1.28 s at 16 kHz).')
    group.add_argument('--nEpoch', type=int, default=200,
                       help='Total training epochs.')
    group.add_argument('--samplingType', type=str, default='samespeaker',
                       choices=['samespeaker', 'uniform', 'samesequence',
                                'sequential', 'temporalsamespeaker'],
                       help='Batch construction policy, which also shapes '
                       'the in-batch negative pool of the CPC loss.')
    group.add_argument('--nLevelsPhone', type=int, default=1,
                       help='Depth of the phone-classifier head '
                       '(supervised mode).')
    group.add_argument('--cpc_mode', type=str, default=None,
                       choices=['reverse', 'bert', 'none'],
                       help='CPC task variant: time-reversed prediction, '
                       'masked (BERT-style) prediction, or no loss.')
    group.add_argument('--encoder_type', type=str,
                       choices=['cpc', 'mfcc', 'lfb'], default='cpc',
                       help='Front-end: learned conv stack, MFCC features, '
                       'or learnable filter banks.')
    group.add_argument('--normMode', type=str, default='layerNorm',
                       choices=['instanceNorm', 'ID', 'layerNorm',
                                'batchNorm'],
                       help='Normalization inserted after each encoder '
                       'convolution.')
    group.add_argument('--onEncoder', action='store_true',
                       help='Probe the encoder output instead of the '
                       'context output (supervised mode).')
    group.add_argument('--random_seed', type=int, default=None,
                       help='Seed for all RNG streams; random if unset.')
    group.add_argument('--arMode', default='LSTM',
                       choices=['GRU', 'LSTM', 'RNN', 'no_ar', 'transformer'],
                       help='Context-network family.')
    group.add_argument('--nLevelsGRU', type=int, default=1,
                       help='Stacked recurrent layers in the context '
                       'network.')
    group.add_argument('--rnnMode', type=str, default='transformer',
                       choices=['transformer', 'RNN', 'LSTM', 'linear',
                                'ffd', 'conv4', 'conv8', 'conv12',
                                'transformer_adaptive_span'],
                       help='Per-step prediction-head family for the CPC '
                       'loss.')
    group.add_argument('--dropout', action='store_true',
                       help='Apply dropout to the prediction-head outputs.')
    group.add_argument('--abspos', action='store_true',
                       help='Transformer heads: sinusoidal absolute '
                       'positions instead of relative ones.')
    group.add_argument('--multihead_rnn', action='store_true',
                       help='Share one prediction trunk with K classifier '
                       'heads rather than K independent networks.')
    group.add_argument('--adapt_span_loss', type=float, default=2e-6)
    group.add_argument('--transformer_pruning', type=int, default=0)
    group.add_argument('--naming_convention', type=str, default=None,
                       choices=[None, 'full_seedlings', 'no_speaker',
                                'id_spkr_onset_offset', 'spkr-id',
                                'spkr-id-nb',
                                'id_spkr_onset_offset_spkr_onset_offset',
                                'spkr_id_nb'])
    group.add_argument('--no_artefacts', action='store_true',
                       help='Shift windows that would straddle a recording '
                       'boundary so no batch mixes two recordings.')
    group.add_argument('--mask_prob', type=float, default=0.0,
                       help='Per-frame probability of starting a wav2vec2 '
                       'span mask over the encoded features.')
    group.add_argument('--mask_length', type=int, default=10,
                       help='Frames covered by each span mask.')
    group.add_argument('--signal_quality_path', type=str, default=None,
                       help='Directory of per-file signal-quality tensors '
                       '(.pt); enables quality-weighted loss.')
    group.add_argument('--signal_quality_step', type=int, default=1600,
                       help='Frame stride between consecutive quality '
                       'estimates (1600 frames = 100 ms).')
    group.add_argument('--signal_quality_mode', type=str,
                       choices=['snr', 'c50', 'snr_c50'], default='snr')
    group.add_argument('--growth_rate', type=float, default=10,
                       help='Sigmoid steepness for quality weighting: high '
                       'values gate noisy windows out almost entirely.')
    group.add_argument('--inflection_point_x', type=float, default=0.5,
                       help='Quality value at which the sigmoid weight '
                       'crosses one half.')
    group.add_argument('--n_skipped', type=int, default=0,
                       help='Drop this many leading prediction steps from '
                       'the loss and accuracy tables.')
    group.add_argument('--no_speaker', action='store_true',
                       help='Treat the whole corpus as a single speaker.')

    group_augment = parser.add_argument_group(
        'Data augmentation configuration',
        description='Waveform augmentation flags.')
    group_augment.add_argument('--noise_extension', type=str, default='.wav')
    group_augment.add_argument('--augment_future', action='store_true')
    group_augment.add_argument('--augment_past', action='store_true')
    group_augment.add_argument('--augment_type', type=str,
                               choices=['none', 'bandreject', 'pitch',
                                        # 'pitch_deropout' is the
                                        # reference CLI's misspelling of
                                        # the factory key; both spellings
                                        # select PitchDropout here.
                                        'pitch_deropout', 'pitch_dropout',
                                        'pitch_quick',
                                        'additive', 'artificial_reverb',
                                        'time_dropout',
                                        'artificial_reverb_dropout',
                                        'natural_reverb'], nargs='+')
    group_augment.add_argument('--bandreject_scaler', type=float, default=1.0)
    group_augment.add_argument('--t_ms', type=int, default=100)
    group_augment.add_argument('--pathDBNoise', type=str, default=None)
    group_augment.add_argument('--pathSeqNoise', type=str, default=None)
    group_augment.add_argument('--past_equal_future', action='store_true',
                               help='Give the past and future views the '
                               'identical augmentation draw.')
    group_augment.add_argument('--pathImpulseResponses', type=str,
                               default=None)
    group_augment.add_argument('--impulse_response_prob', type=float,
                               default=1.0)
    group_augment.add_argument('--shift_max', type=float, default=300)
    group_augment.add_argument('--min_snr_in_db', type=float, default=5.0)
    group_augment.add_argument('--max_snr_in_db', type=float, default=20.0)
    group_augment.add_argument('--ir_sample_rate', type=int, default=16000,
                               help='Sample rate the impulse-response files '
                               'were recorded at.')
    group_augment.add_argument('--temporal_additive_noise',
                               action='store_true',
                               help='Draw additive-noise windows in temporal '
                               'order instead of uniformly.')
    group_augment.add_argument('--meta_aug', action='store_true',
                               help='Also augment the noise corpus itself '
                               'before mixing it in.')
    group_augment.add_argument('--meta_aug_type', type=str,
                               choices=['none', 'natural_reverb'], nargs='+',
                               help='Augmentations applied to the noise '
                               'sequences when --meta_aug is set.')
    group_augment.add_argument('--ir_batch_wise', action='store_true',
                               help='Convolve the whole batch with one '
                               'impulse response instead of one per '
                               'sequence.')
    group_augment.add_argument('--meta_ir_batch_wise', action='store_true',
                               help='Batch-level impulse response for the '
                               'noise sequences (with --meta_aug).')
    return parser


def set_tpu_config(parser):
    """TPU-framework-specific flags (additive; absent from the reference).

    All default to values that reproduce reference behaviour exactly, so a
    reference command line runs unmodified.
    """
    group = parser.add_argument_group('TPU configuration')
    group.add_argument('--precision', type=str, default='bf16mix',
                       choices=['fp32', 'bf16mix', 'bf16'],
                       help='Compute precision: fp32, bf16 compute with fp32 '
                       'params (bf16mix, default), or full bf16.')
    group.add_argument('--data_axis_size', type=int, default=-1,
                       help='Number of devices on the data-parallel mesh '
                       'axis. -1 = all local devices.')
    group.add_argument('--model_axis_size', type=int, default=1,
                       help='Shard the nPredicts prediction heads over a '
                       'second (model) mesh axis: mesh becomes '
                       '(nGPU/M data, M model), each model rank computes '
                       'nPredicts/M heads. Extension beyond the reference '
                       '(DP-only); unsupervised CPC path only. See '
                       'training.build_steps_2d.')
    group.add_argument('--dcn_axis_size', type=int, default=0,
                       help='Build the data mesh as an explicit 2-level '
                       "('dcn_data','ici_data') layout with this many "
                       'slices on the outer (DCN) axis — multi-slice '
                       'pods / multi-process pod runs. 0/1 (default) = '
                       'flat 1-D data mesh. Must divide the device count. '
                       'Step functions are unchanged '
                       '(parallel.mesh.data_axes); composes with '
                       '--distributed; not with --model_axis_size>1.')
    group.add_argument('--ckpt_format', type=str, default='torch',
                       choices=['torch', 'orbax'],
                       help='Checkpoint serialization: reference-compatible '
                       'torch pickle (default) or native orbax.')
    group.add_argument('--profile_dir', type=str, default=None,
                       help='If set, dump a jax.profiler trace of a few '
                       'training steps to this directory.')
    group.add_argument('--remat', action='store_true',
                       help='Rematerialize the forward pass in the backward '
                       'pass (jax.checkpoint): trades FLOPs for HBM, for '
                       'large models/windows that would not otherwise fit.')
    group.add_argument('--prng', type=str, default='rbg',
                       choices=['rbg', 'threefry'],
                       help='PRNG implementation for dropout masks and '
                       'negative sampling. rbg (default) uses the TPU '
                       'hardware random instruction -- measured 18%% '
                       'faster per step than threefry, whose mask '
                       'generation is ALU-bound. Streams differ between '
                       'the two but both are deterministic per seed.')
    group.add_argument('--augment_on_device', action='store_true',
                       help='Run the waveform augmentations batched on '
                       'the accelerator inside the train step '
                       '(data/augment_device.py) instead of per-window '
                       'on host CPU. Types with a device port (see '
                       'data/augment_device.py:DEVICE_AUGMENTATIONS) '
                       'move to the chip; any remaining types keep '
                       'running through the host pipeline (hybrid '
                       'split, host chain applied first). On a '
                       'single-core host this removes the augmentation '
                       'bottleneck (~90 -> ~15 ms/batch measured).')
    group.add_argument('--pitch_algo', type=str, default='wsola',
                       choices=['vocoder', 'wsola'],
                       help='Pitch-shift stretch algorithm, host and '
                       'device fast path alike. wsola (default): sox '
                       'tempo\'s WSOLA with its music defaults — the '
                       'algorithm family sox `pitch` itself is, i.e. the '
                       'WavAugment training distribution; applies to '
                       'every pitch stage (pitch/pitch_quick/'
                       'pitch_dropout), since the reference\'s quick '
                       'variants only degrade the resample, not the '
                       'stretch. vocoder: the legacy phase-vocoder '
                       'approximation (quick stages fall back to a '
                       'linear stretch). docs/augmentation_parity.md '
                       'has the measured family gap and A/B.')
    group.add_argument('--adam_mu_dtype', type=str, default='fp32',
                       choices=['fp32', 'bf16'],
                       help='Dtype of Adam\'s first moment. bf16 halves '
                       'its HBM traffic (the optimizer update is '
                       'bandwidth-bound, ~1 ms/step at the recipe; '
                       'measured -0.17 ms/step) at a small numeric '
                       'shift; fp32 (default) keeps reference-exact '
                       'Adam math.')
    group.add_argument('--head_remat', nargs='?', const='nothing',
                       default=False, choices=['nothing', 'dots'],
                       help='Rematerialize the prediction-head stack in '
                       'the backward pass. Bare --head_remat (= "nothing") '
                       'recomputes everything, storing no intermediates; '
                       '--head_remat dots saves the matmul outputs and '
                       'recomputes only the elementwise chains '
                       '(ReLU/dropout/LN), trading far fewer FLOPs for '
                       'most of the HBM saving. Bit-identical gradients '
                       'either way.')
    group.add_argument('--steps_per_dispatch', type=int, default=1,
                       help='Optimizer steps per host dispatch (a lax.scan '
                       'over stacked batches inside one program). '
                       'Amortizes per-dispatch host round-trips; '
                       'trajectories match 1 to fp tolerance. Incompatible '
                       'with sequential sampling (hidden carry).')
    group.add_argument('--global_negatives', action='store_true',
                       help='Draw InfoNCE negatives from the GLOBAL batch '
                       'across the data-parallel mesh (all_gather over '
                       'ICI) instead of the local shard. Extension beyond '
                       'the reference, whose DDP samples per-rank.')
    group.add_argument('--neg_pool_group', type=int, default=0,
                       help='Sample each window\'s InfoNCE negatives '
                       'within its group of this many contiguous batch '
                       'elements instead of the whole per-chip batch '
                       '(0 = whole batch). --neg_pool_group 8 at batch '
                       'G*8 reproduces the reference\'s G-GPU '
                       'DataParallel semantics (each GPU samples within '
                       'its own batchSizeGPU=8 shard) on one chip, and '
                       'keeps every pool small enough for the fused '
                       'VMEM scoring kernel at any batch size. '
                       'Mutually exclusive with --global_negatives.')
    group.add_argument('--host_prefetch', type=int, default=2,
                       help='Host-side loader prefetch depth (batches '
                       'prepared on a background thread while the device '
                       'computes). 0 disables.')
    group.add_argument('--corpus_on_device', action='store_true',
                       help='Keep each data pack resident in accelerator '
                       'HBM (uploaded once, as int16 when the audio sits '
                       'on the PCM16 grid) and gather training windows on '
                       'device from per-step offset vectors. Removes the '
                       'per-step audio upload — the real-data bottleneck '
                       'on remote/tunneled accelerators. Identical '
                       'training trajectory to the host path. Needs one '
                       'TRAIN pack plus the (usually much smaller) VAL '
                       'pack — both stay resident across epochs — to fit '
                       'in HBM beside the model (--max_size_loaded bounds '
                       'each pack), and clean host windows: host-side '
                       'augmentation is rejected (--augment_on_device '
                       'composes). Single-process only.')
    return parser
