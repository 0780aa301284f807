"""Model factories, checkpoint loading and feature extraction
(reference `cpc/feature_loader.py`).

A flax module is stateless, so the reference's `CPCModel` object becomes a
`ModelBundle` (module + params + config). `loadModel` reads reference torch
checkpoints (including recursive load-of-load and multi-checkpoint concat,
`feature_loader.py:238-283`) through the converter in `io/torch_ckpt.py`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import unfreeze

from .io.checkpoint import get_checkpoint_data, load_args
from .io.torch_ckpt import (load_torch_checkpoint,
                            params_from_torch_state_dict)
from .models import (BiDIRARTangled, CPCAR, CPCBertModel, CPCEncoder,
                     CPCModel, ConcatenatedModel, LFBEncoder, MFCCEncoder,
                     NoAr, build_transformer_ar)
from .models.encoder import DOWNSAMPLING

Array = jax.Array


def get_encoder(args: argparse.Namespace) -> nn.Module:
    """Encoder factory (reference `feature_loader.py:202-212`)."""
    if args.encoder_type == 'mfcc':
        return MFCCEncoder(dim_encoded=args.hiddenEncoder)
    elif args.encoder_type == 'lfb':
        return LFBEncoder(dim_encoded=args.hiddenEncoder)
    return CPCEncoder(size_hidden=args.hiddenEncoder,
                      norm_mode=args.normMode)


def get_ar(args: argparse.Namespace) -> nn.Module:
    """AR factory (reference `feature_loader.py:215-235`). NOTE: mirrors the
    reference's in-place `args.hiddenGar = args.hiddenEncoder` for the
    transformer AR."""
    if args.arMode == 'transformer':
        ar = build_transformer_ar(args.hiddenEncoder, args.hiddenGar,
                                  args.nLevelsGRU, args.sizeWindow // 160,
                                  args.abspos)
        args.hiddenGar = args.hiddenEncoder
        return ar
    if args.cpc_mode == "bert":
        return BiDIRARTangled(dim_encoded=args.hiddenEncoder,
                              dim_output=args.hiddenGar,
                              n_levels=args.nLevelsGRU)
    if args.arMode == 'no_ar':
        return NoAr()
    return CPCAR(dim_encoded=args.hiddenEncoder,
                 dim_output=args.hiddenGar,
                 keep_hidden=args.samplingType == "sequential",
                 n_levels=args.nLevelsGRU,
                 mode=args.arMode,
                 reverse=args.cpc_mode == "reverse")


# Reference-spelled aliases
getEncoder = get_encoder
getAR = get_ar


def build_model(args: argparse.Namespace) -> nn.Module:
    encoder = get_encoder(args)
    ar = get_ar(args)
    if args.cpc_mode == "bert":
        model = CPCBertModel(gEncoder=encoder, gAR=ar,
                             block_size=args.nPredicts,
                             supervised=getattr(args, 'supervised', False))
    else:
        model = CPCModel(gEncoder=encoder, gAR=ar,
                         mask_prob=getattr(args, 'mask_prob', 0.0),
                         mask_length=getattr(args, 'mask_length', 10))
    return model


@dataclasses.dataclass
class ModelBundle:
    """A flax module plus its variables and originating config."""
    module: nn.Module
    variables: Dict[str, Any]
    args: argparse.Namespace
    hidden_gar: int = 0
    hidden_encoder: int = 0

    @property
    def params(self):
        return self.variables.get('params', {})

    def apply(self, batch: Array, label=None, hidden=None,
              train: bool = False, rngs=None):
        return self.module.apply(self.variables, batch, label, hidden=hidden,
                                 train=train, rngs=rngs)

    def downsampling_factor(self) -> int:
        return DOWNSAMPLING


def init_model(args: argparse.Namespace, seed: int = 0,
               batch_size: int = 2) -> ModelBundle:
    """Initialize a fresh model from config.

    Init runs on the CPU backend: parameter initialization is a one-off
    host-side task, and compiling the full forward on the accelerator just
    to draw init values wastes a (potentially slow, remote) TPU compile per
    CLI start. Params transfer to the device lazily on first use."""
    module = build_model(args)
    import contextlib
    try:
        # local_devices, not devices: under multi-process JAX,
        # jax.devices('cpu')[0] is process 0's device and is not
        # addressable from the other processes.
        cpu_devs = jax.local_devices(backend='cpu')
    except RuntimeError:
        cpu_devs = []
    ctx = (jax.default_device(cpu_devs[0]) if cpu_devs
           else contextlib.nullcontext())
    with ctx:
        dummy = jnp.zeros((batch_size, args.sizeWindow), jnp.float32)
        rngs = {'params': jax.random.PRNGKey(seed)}
        variables = module.init(rngs, dummy, None, train=False)
    return ModelBundle(module=module, variables=unfreeze(variables),
                       args=args, hidden_gar=args.hiddenGar,
                       hidden_encoder=args.hiddenEncoder)



def load_model(path_checkpoints: Sequence[str], loadStateDict: bool = True,
               updateConfig: Optional[argparse.Namespace] = None
               ) -> Tuple[ModelBundle, int, int]:
    """Reference `loadModel` (`feature_loader.py:238-283`): build from the
    checkpoint's stored args, optionally recurse through its own `load`
    chain, concat multiple checkpoints."""
    if not path_checkpoints:
        raise ValueError(
            "load_model needs at least one checkpoint path — even with "
            "loadStateDict=False / --no_pretraining, the checkpoint's "
            "stored args define the architecture to build")
    bundles: List[ModelBundle] = []
    hidden_gar, hidden_encoder = 0, 0
    for path in path_checkpoints:
        print(f"Loading checkpoint {path}")
        _, _, loc_args = get_checkpoint_data(os.path.dirname(path))
        do_load = loc_args.load is not None and \
            (len(loc_args.load) > 1 or
             os.path.dirname(loc_args.load[0]) != os.path.dirname(path))

        if updateConfig is not None and not do_load:
            print("Updating the configuration file with")
            print(json.dumps(vars(updateConfig), indent=4, sort_keys=True))
            load_args(loc_args, updateConfig)

        if do_load:
            bundle, hg, he = load_model(loc_args.load, loadStateDict=False,
                                        updateConfig=updateConfig)
            hidden_gar += hg
            hidden_encoder += he
        else:
            bundle = init_model(loc_args)

        if loadStateDict:
            print(f"Loading the state dict at {path}")
            state = load_torch_checkpoint(path)
            params, batch_stats, unmatched = params_from_torch_state_dict(
                state["gEncoder"], bundle.variables['params'])
            merged = dict(bundle.variables)
            merged['params'] = _merge_trees(bundle.variables['params'],
                                            params)
            if batch_stats:
                merged['batch_stats'] = _merge_trees(
                    bundle.variables.get('batch_stats', {}), batch_stats)
            bundle = dataclasses.replace(bundle, variables=merged)
            if unmatched:
                print(f"  (skipped {len(unmatched)} torch keys: "
                      f"{unmatched[:5]}...)")
        if not do_load:
            hidden_gar += loc_args.hiddenGar
            hidden_encoder += loc_args.hiddenEncoder
        bundles.append(bundle)

    if len(bundles) == 1:
        b = bundles[0]
        return dataclasses.replace(b, hidden_gar=hidden_gar,
                                   hidden_encoder=hidden_encoder), \
            hidden_gar, hidden_encoder

    concat = ConcatenatedModel(models=tuple(b.module for b in bundles))
    variables = {'params': {f'models_{i}': b.variables['params']
                            for i, b in enumerate(bundles)}}
    bs = {f'models_{i}': b.variables['batch_stats']
          for i, b in enumerate(bundles) if 'batch_stats' in b.variables}
    if bs:
        variables['batch_stats'] = bs
    bundle = ModelBundle(module=concat, variables=variables,
                         args=bundles[0].args, hidden_gar=hidden_gar,
                         hidden_encoder=hidden_encoder)
    return bundle, hidden_gar, hidden_encoder


# Reference-spelled alias
loadModel = load_model


def get_module(wrapped):
    """Unwrap a feature maker to its ModelBundle (reference `getModule`,
    `feature_loader.py:286-293`, which peels DataParallel/DDP/FeatureModule
    wrappers — here there are no DP wrappers, only FeatureModule-style
    objects carrying a `bundle`)."""
    while True:
        if hasattr(wrapped, 'bundle'):
            wrapped = wrapped.bundle
        elif hasattr(wrapped, 'model'):
            wrapped = wrapped.model
        else:
            return wrapped


# Reference-spelled alias
getModule = get_module


def _merge_trees(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_trees(out[k], v)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Feature extraction (reference `feature_loader.py:15-54, 316-433`)
# ---------------------------------------------------------------------------

class FeatureModule:
    """Callable feature maker over a ModelBundle: choose context vs encoder
    output, optional flatten (`collapse`), optional CCA projection."""

    def __init__(self, bundle: ModelBundle, get_encoded: bool,
                 collapse: bool = False, cca_projection: Optional[str] = None,
                 keep_hidden: bool = False, seqNorm: bool = False,
                 train_mode: bool = False, train_mode_seed: int = 0,
                 mesh='auto'):
        self.bundle = bundle
        self.get_encoded = get_encoded
        self.collapse = collapse
        self.keep_hidden = keep_hidden
        self.seqNorm = seqNorm
        self.hidden = None
        # Batch-sharded extraction over the local device mesh — the
        # reference DataParallel-izes its eval feature makers
        # (`linear_separability.py:203`, `clustering.py:133`,
        # `common_voices_eval.py:542`). Feature extraction has no
        # cross-example reduction, so sharding the batch axis is
        # bit-identical per example; batches that don't divide the mesh
        # fall back to the replicated placement of the same program.
        # mesh: 'auto' -> all local devices when there are several;
        # None -> single-device; or an explicit Mesh.
        if mesh == 'auto':
            mesh = None
            if jax.process_count() == 1 and len(jax.local_devices()) > 1:
                from .parallel.mesh import eval_mesh
                mesh = eval_mesh()
        self._mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicate
            self.bundle.variables = replicate(mesh, self.bundle.variables)
        # --train_mode (reference `clustering_script.py:236-237`,
        # `build_zeroSpeech_features.py`): skip featureMaker.eval(), i.e.
        # keep dropout ACTIVE during feature extraction. Functionally that
        # means train=True plus a fresh dropout rng per forward.
        self.train_mode = train_mode
        self._dropout_rng = (jax.random.PRNGKey(train_mode_seed)
                             if train_mode else None)
        self.cca_projection = None
        if cca_projection:
            import pickle
            assert cca_projection[-4:] == ".pkl"
            print("Loading canonical correlation analysis model.")
            with open(cca_projection, 'rb') as f:
                self.cca_projection = pickle.load(f)

        @jax.jit
        def _fwd(variables, batch, hidden, rng=None):
            # Feature extraction feeds parity-sensitive evals (ABX,
            # separability): force fp32 matmul precision on TPU.
            rngs = None if rng is None else {'dropout': rng}
            with jax.default_matmul_precision('highest'):
                c, e, _, h = bundle.module.apply(variables, batch, None,
                                                 hidden=hidden,
                                                 train=train_mode, rngs=rngs)
            return c, e, h
        self._fwd = _fwd

    @property
    def out_feature_dim(self) -> int:
        return (self.bundle.hidden_encoder if self.get_encoded
                else self.bundle.hidden_gar)

    def get_downsampling_factor(self) -> int:
        return DOWNSAMPLING

    # reference-spelled alias
    getDownsamplingFactor = get_downsampling_factor

    def reset_hidden(self):
        self.hidden = None

    def __call__(self, data) -> Array:
        batch_audio, _label = data
        batch_audio = jnp.asarray(batch_audio)
        if batch_audio.ndim == 4:       # (B, 1, 1, T) torch-style
            batch_audio = batch_audio[:, 0]
        if batch_audio.ndim == 3:       # (B, 1, T) channel-first
            batch_audio = batch_audio[:, 0]
        if self._mesh is not None:
            n_dev = self._mesh.devices.size
            if batch_audio.shape[0] % n_dev == 0:
                from jax.sharding import NamedSharding
                from .parallel.mesh import batch_pspec
                batch_audio = jax.device_put(
                    batch_audio,
                    NamedSharding(self._mesh, batch_pspec(self._mesh, 2)))
        if self.train_mode:
            self._dropout_rng, rng = jax.random.split(self._dropout_rng)
            c, e, h = self._fwd(self.bundle.variables, batch_audio,
                                self.hidden, rng)
        else:
            c, e, h = self._fwd(self.bundle.variables, batch_audio,
                                self.hidden)
        if self.keep_hidden:
            self.hidden = h
        feats = e if self.get_encoded else c
        if self.seqNorm:
            feats = seqNormalization(feats)
        if self.collapse:
            feats = feats.reshape(-1, feats.shape[-1])
        if self.cca_projection is not None:
            feats = jnp.asarray(self.cca_projection.transform(
                np.asarray(feats).reshape(-1, feats.shape[-1])
            ).reshape(feats.shape[0], feats.shape[1], -1))
        return feats


def seqNormalization(out: Array) -> Array:
    """Normalize along time (reference `feature_loader.py:316-320`)."""
    mean = jnp.mean(out, axis=1, keepdims=True)
    var = jnp.var(out, axis=1, keepdims=True, ddof=1)
    return (out - mean) / jnp.sqrt(var + 1e-08)


def to_one_hot(input_vector: Array, n_items: int) -> Array:
    """(B, S) int -> (B, S, n_items) one-hot (`feature_loader.py:307-313`)."""
    return jax.nn.one_hot(input_vector, n_items, dtype=jnp.int32)


toOneHot = to_one_hot


def build_feature(feature_maker: Callable, seq_path: str, strict: bool = False,
                  maxSizeSeq: int = 64000, seqNorm: bool = False) -> Array:
    """Whole-file feature extraction in fixed chunks
    (reference `feature_loader.py:323-367`). Stateful RNN carry-over happens
    inside `feature_maker` when keep_hidden is set.

    Documented deviation: the hidden state is RESET at the start of every
    file. The reference's eval scripts set `keepHidden=True` and never
    reset (`eval_ABX.py:182`, `clustering_quantization.py:204`), so there
    file N's first frames are computed from file N-1's final LSTM/GRU
    state — acoustic context leaks across unrelated utterances and the
    extracted features depend on the corpus iteration order. We reset per
    file (each file's features are a pure function of that file); the
    measured end-to-end effect on ABX parity is within |Δ| <= 3.1e-5
    (`scripts/abx_parity.py`)."""
    from .data.audio_io import load_audio
    seq, _sr = load_audio(seq_path)
    seq = np.asarray(seq, dtype=np.float32)
    size_seq = seq.shape[-1]
    start = 0
    out = []
    if hasattr(feature_maker, 'reset_hidden'):
        feature_maker.reset_hidden()
    while start < size_seq:
        if strict and start + maxSizeSeq > size_seq:
            break
        end = min(size_seq, start + maxSizeSeq)
        subseq = seq[start:end][None, :]
        features = feature_maker((subseq, None))
        if seqNorm:
            features = seqNormalization(features)
        out.append(np.asarray(features))
        start += maxSizeSeq

    if strict and start < size_seq:
        subseq = seq[-maxSizeSeq:][None, :]
        features = feature_maker((subseq, None))
        if seqNorm:
            features = seqNormalization(features)
        ds = (feature_maker.get_downsampling_factor()
              if hasattr(feature_maker, 'get_downsampling_factor')
              else DOWNSAMPLING)
        delta = (size_seq - start) // ds
        out.append(np.asarray(features)[:, -delta:])

    return jnp.concatenate([jnp.asarray(o) for o in out], axis=1)


def build_feature_batch(feature_maker: Callable, seq_path: str,
                        strict: bool = False, maxSizeSeq: int = 8000,
                        seqNorm: bool = False, batch_size: int = 8) -> Array:
    """Batched whole-file extraction (reference
    `feature_loader.py:370-433`); no hidden carry-over across chunks."""
    from .data.audio_io import load_audio
    seq, _sr = load_audio(seq_path)
    seq = np.asarray(seq, dtype=np.float32)
    size_seq = seq.shape[-1]
    ds = (feature_maker.get_downsampling_factor()
          if hasattr(feature_maker, 'get_downsampling_factor')
          else DOWNSAMPLING)

    n_chunks = size_seq // maxSizeSeq
    n_batches = n_chunks // batch_size
    if n_chunks % batch_size != 0:
        n_batches += 1

    out = []
    for batch_idx in range(n_batches):
        start = batch_idx * batch_size * maxSizeSeq
        end = min((batch_idx + 1) * batch_size * maxSizeSeq,
                  maxSizeSeq * n_chunks)
        batch_seqs = seq[start:end].reshape(-1, maxSizeSeq)
        batch_out = feature_maker((batch_seqs, None))
        for features in batch_out:
            features = features[None]
            if seqNorm:
                features = seqNormalization(features)
            out.append(np.asarray(features))

    if size_seq % maxSizeSeq >= ds:
        remainders = size_seq % maxSizeSeq
        if strict:
            subseq = seq[-maxSizeSeq:][None, :]
            features = feature_maker((subseq, None))
            if seqNorm:
                features = seqNormalization(features)
            delta = remainders // ds
            out.append(np.asarray(features)[:, -delta:])
        else:
            subseq = seq[-remainders:][None, :]
            features = feature_maker((subseq, None))
            if seqNorm:
                features = seqNormalization(features)
            out.append(np.asarray(features))

    return jnp.concatenate([jnp.asarray(o) for o in out], axis=1)


# Reference-spelled aliases
buildFeature = build_feature
buildFeature_batch = build_feature_batch


def build_feature_files(feature_maker: Callable, seq_paths,
                        maxSizeSeq: int = 64000, seqNorm: bool = False,
                        strict: bool = False, max_batch: int = 16,
                        bucket_frames: int = 0):
    """Whole-corpus feature extraction, batched ACROSS files.

    `buildFeature` dispatches one device call per (file, chunk) — on
    remote-dispatch backends a corpus pass is round-trip bound. Files with
    identical sample counts have identical chunk structure, so they are
    grouped and run as one batch per chunk: dispatch count drops from
    n_files * n_chunks to n_length_groups * n_chunks, with per-file hidden
    carry preserved (the batch axis of the RNN state is the file axis).
    Per-file results match `buildFeature` to float precision (only the
    batch dimension of the same program changes).

    `bucket_frames > 0` additionally zero-pads every file up to the next
    multiple of `bucket_frames` encoded frames so files of *different*
    lengths share programs and batches (real corpora have nearly unique
    lengths, which defeats exact grouping). Outputs are trimmed back to
    each file's true frame count. Approximation note: the pad interacts
    with the conv encoder's edge padding, so a file's final ~receptive-
    field frames (<= 3 for the standard stack) can differ slightly from
    the exact computation — off by default; use for dispatch-bound eval
    passes where the tail frames don't matter.

    Returns {path: (1, T_frames, D) array}, one entry per input path.
    """
    from collections import defaultdict

    from .data.audio_io import load_audio
    from .utils.prefetch import prefetch

    ds = (feature_maker.get_downsampling_factor()
          if hasattr(feature_maker, 'get_downsampling_factor')
          else DOWNSAMPLING)

    def _decode(p):
        """Runs on the prefetch worker thread: host decode (+ bucket pad)
        overlaps the previous batches' device forwards — the extraction
        pass used to decode the WHOLE corpus before the first dispatch
        (decode measured ~1.5 s of a 32-file ABX pass, fully serial with
        the forwards it feeds)."""
        seq, _sr = load_audio(p)
        seq = np.asarray(seq, dtype=np.float32)
        frames = seq.shape[-1] // ds
        if bucket_frames > 0:
            padded_frames = -(-max(frames, 1) // bucket_frames) * \
                bucket_frames
            pad = padded_frames * ds - seq.shape[-1]
            if pad > 0:
                seq = np.pad(seq, (0, pad))
        return p, frames, seq

    out = {}
    pending = []       # (batch_items, device (B, T, D)); fetched at the end

    def _run_batch(size_seq, batch_items):
        stack = np.stack([seq for _, seq in batch_items])   # (B, T)
        if hasattr(feature_maker, 'reset_hidden'):
            feature_maker.reset_hidden()
        chunks = []            # device arrays; ONE fetch per group
        start = 0
        while start < size_seq:
            if strict and start + maxSizeSeq > size_seq:
                break
            end = min(size_seq, start + maxSizeSeq)
            feats = feature_maker((stack[:, start:end], None))
            if seqNorm:
                feats = seqNormalization(feats)
            chunks.append(jnp.asarray(feats))
            start += maxSizeSeq
        if strict and start < size_seq:
            feats = feature_maker((stack[:, -maxSizeSeq:], None))
            if seqNorm:
                feats = seqNormalization(feats)
            delta = (size_seq - start) // ds
            chunks.append(jnp.asarray(feats)[:, -delta:])
        # concat on device; the FETCH is deferred so group k+1's
        # dispatches overlap group k's device->host transfer (an
        # inline np.asarray here serialized compute with fetch —
        # round-trip bound on remote-dispatch backends)
        pending.append((batch_items,
                        jnp.concatenate(chunks, axis=1)
                        if len(chunks) > 1 else chunks[0]))

    # Streaming pipeline: decode on a worker thread, dispatch a batch as
    # soon as `max_batch` same-length files accumulate (the partition is
    # identical to the old decode-everything-first grouping — consecutive
    # arrival slices per length), so decode, host dispatch, device
    # compute, and the deferred fetches all overlap.
    true_frames = {}
    buckets = defaultdict(list)
    for p, frames, seq in prefetch(seq_paths, 4, transform=_decode):
        true_frames[p] = frames
        length = seq.shape[-1]
        buckets[length].append((p, seq))
        if len(buckets[length]) >= max_batch:
            _run_batch(length, buckets.pop(length))
    for size_seq, items in buckets.items():
        _run_batch(size_seq, items)

    for batch_items, whole_dev in pending:
        whole = np.asarray(whole_dev)
        for j, (p, _) in enumerate(batch_items):
            feats = whole[j:j + 1]
            if bucket_frames > 0:
                feats = feats[:, :true_frames[p]]
            out[p] = feats
    return out


# Reference-style alias
buildFeature_files = build_feature_files


# ---------------------------------------------------------------------------
# Combined feature makers (reference `feature_loader.py:85-147,159-173`)
# ---------------------------------------------------------------------------

class CriterionWrapper:
    """A flax criterion module + its params, exposing get_prediction."""

    def __init__(self, module, variables):
        self.module = module
        self.variables = variables

    def get_prediction(self, c_feature):
        return self.module.apply(self.variables, c_feature,
                                 method=self.module.get_prediction)


def load_supervised_criterion(path_checkpoint):
    """Reference `loadSupervisedCriterion` (`feature_loader.py:159-173`):
    build a PhoneCriterion from the checkpoint args and load its state."""
    from .losses import PhoneCriterion
    from .data.corpus import parse_seq_labels
    *_, args = get_checkpoint_data(os.path.dirname(path_checkpoint))
    _, n_phones = parse_seq_labels(args.pathPhone)
    criterion = PhoneCriterion(dim_encoder=args.hiddenGar,
                               n_phones=n_phones,
                               on_encoder=args.onEncoder)
    dummy_c = jnp.zeros((1, 8, args.hiddenGar))
    variables = criterion.init(jax.random.PRNGKey(0), dummy_c, dummy_c,
                               jnp.zeros((1, 8), jnp.int32), train=False)
    state_dict = load_torch_checkpoint(path_checkpoint)
    params, _, _ = params_from_torch_state_dict(state_dict["cpcCriterion"],
                                                variables['params'])
    return CriterionWrapper(criterion, {'params': _merge_trees(
        variables['params'], params)}), n_phones


loadSupervisedCriterion = load_supervised_criterion


class ModelPhoneCombined:
    """Feature maker + phone classifier (reference
    `feature_loader.py:85-115`)."""

    def __init__(self, model, criterion, one_hot: bool):
        self.model = model
        self.criterion = criterion
        self.oneHot = one_hot

    def get_downsampling_factor(self):
        return self.model.get_downsampling_factor()

    getDownsamplingFactor = get_downsampling_factor

    def __call__(self, data):
        c_feature = self.model(data)
        pred = self.criterion.get_prediction(c_feature)
        p = pred.shape[2]
        if self.oneHot:
            pred = jnp.argmax(pred, axis=2)
            pred = to_one_hot(pred, p)
        else:
            pred = jax.nn.softmax(pred, axis=2)
        return pred


class ModelClusterCombined:
    """Feature maker + k-means quantizer (reference
    `feature_loader.py:118-147`)."""

    def __init__(self, model, cluster, nk: int, out_format: str):
        if out_format not in ['oneHot', 'int', 'softmax']:
            raise ValueError(f'Invalid output format {out_format}')
        self.model = model
        self.cluster = cluster
        self.nk = nk
        self.outFormat = out_format

    def get_downsampling_factor(self):
        return self.model.get_downsampling_factor()

    getDownsamplingFactor = get_downsampling_factor

    def __call__(self, data):
        c_feature = self.model(data)
        pred = self.cluster(c_feature)
        if self.outFormat == 'oneHot':
            pred = jnp.argmin(pred, axis=2)
            pred = to_one_hot(pred, self.nk)
        elif self.outFormat == 'int':
            pred = jnp.argmin(pred, axis=2)
        else:
            pred = jax.nn.softmax(-pred, axis=2)
        return pred


class CPCModule:
    """Expose CPC prediction scores / cosine distances as features
    (reference `feature_loader.py:57-82`)."""

    def __init__(self, bundle: ModelBundle, criterion_wrapper,
                 main_distance_only: bool = False, n_pred: int = -1):
        self.bundle = bundle
        self.criterion = criterion_wrapper  # CriterionWrapper over
        # CPCUnsupervisedCriterion
        self.n_pred = n_pred
        self.main_distance_only = main_distance_only

    def get_downsampling_factor(self):
        return DOWNSAMPLING

    getDownsamplingFactor = get_downsampling_factor

    def __call__(self, data):
        batch_audio, label = data
        batch_audio = jnp.asarray(batch_audio)
        if batch_audio.ndim >= 3:
            batch_audio = batch_audio.reshape(batch_audio.shape[0], -1)
        c, e, _, _ = self.bundle.apply(batch_audio, label, train=False)
        crit = self.criterion
        distances = crit.module.apply(crit.variables, c, e,
                                      method=crit.module.cosine_distances)
        preds = distances[:, self.n_pred]     # (B, W)
        if self.main_distance_only:
            return preds
        return jax.nn.softmax(preds, axis=1)
