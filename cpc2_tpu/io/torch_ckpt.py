"""PyTorch-pickle checkpoint interop.

The reference saves `{gEncoder, cpcCriterion, optimizer, best}` state dicts as
a torch pickle (`cpc/feature_loader.py:296-304`). This module converts between
those state dicts and our flax param pytrees so that

* reference-trained checkpoints load into the TPU framework bit-for-bit
  (fp32), and
* our checkpoints load back into the reference code unchanged.

torch (CPU build) is used *only* here, for (de)serialization on the host —
never on the compute path.

Key mapping
-----------
flax scopes were deliberately named after the torch modules (gEncoder.conv0,
gAR.baseNet.weight_ih_l0, wPrediction.predictors_{k}, ...), so mapping is
mostly `'.'.join(path)` with three mechanical rules:

* list containers: flax `predictors_0` <-> torch `predictors.0` (same for
  `models_{i}`, `PhoneCriterionClassifier_{i}`);
* equalized-LR wrappers: torch inserts `.module` (ConstrainedLayer) around the
  raw layer — dropped on read, re-inserted on write (config-independent:
  recorded during read, rule-based on write);
* torch bidirectional RNNs keep `_reverse` params in the same module; flax
  splits them into a sibling `<name>_bwd` scope.

Shape rules: ChannelNorm affine params are (1, C, 1) in torch and (C,) here.
Everything else shares layouts by construction.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

_LIST_CONTAINERS = ("predictors", "models", "PhoneCriterionClassifier")


def _get_torch():
    import torch  # local import: only checkpoint IO needs torch
    return torch


# ---------------------------------------------------------------------------
# torch -> flax
# ---------------------------------------------------------------------------

def _normalize_torch_key(key: str) -> Tuple[str, ...]:
    """Split a torch state-dict key and drop equalized-LR 'module' wrappers."""
    parts = [p for p in key.split('.') if p != 'module']
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if (p in _LIST_CONTAINERS and i + 1 < len(parts)
                and parts[i + 1].isdigit()):
            out.append(f'{p}_{parts[i + 1]}')
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _tree_set(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _tree_lookup(tree: Mapping, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if not isinstance(node, Mapping) or p not in node:
            return None
        node = node[p]
    return node


def _match_path(template: Mapping, path: Tuple[str, ...]
                ) -> Optional[Tuple[str, ...]]:
    """Find the flax path in `template` for a normalized torch path, handling
    the `_reverse` -> `<scope>_bwd` relocation of bidirectional RNNs."""
    if _tree_lookup(template, path) is not None:
        return path
    # bidirectional: leaf like weight_ih_l0_reverse lives under <parent>_bwd
    if len(path) >= 2 and path[-1].endswith('_reverse'):
        alt = path[:-2] + (path[-2] + '_bwd', path[-1])
        if _tree_lookup(template, alt) is not None:
            return alt
    return None


_STACK_RE = re.compile(r'^predictors_(\d+)$')


def _match_stacked(template: Mapping, path: Tuple[str, ...]
                   ) -> Optional[Tuple[Tuple[str, ...], int]]:
    """PredictionNetwork heads are vmap-stacked under a single `predictors`
    scope (leading axis K); torch keys are per-head `predictors.{k}.*`.
    Returns (stacked flax path, head index) when this is such a key."""
    for i, comp in enumerate(path):
        m = _STACK_RE.match(comp)
        if m:
            alt = path[:i] + ('predictors',) + path[i + 1:]
            if _tree_lookup(template, alt) is not None:
                return alt, int(m.group(1))
    return None


def params_from_torch_state_dict(state_dict: Mapping[str, Any],
                                 params_template: Mapping,
                                 strict: bool = False,
                                 _prefix_try: Tuple[str, ...] = ()
                                 ) -> Tuple[Dict, Dict, list]:
    """Convert a torch state dict into (params, batch_stats, unmatched_keys)
    shaped like `params_template` (a flax 'params' dict)."""
    params: Dict = {}
    batch_stats: Dict = {}
    unmatched = []
    pending_stacks: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    for key, value in state_dict.items():
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, 'detach') else value)
        path = _normalize_torch_key(key)
        leaf = path[-1]
        if leaf in ('num_batches_tracked', 'mask', 'z', 'pe', 'han'):
            # torch registered buffers that are pure constants here
            # (causal mask, relpos zero column, sinusoidal PE, Hann window).
            continue
        if leaf in ('running_mean', 'running_var'):
            # torch batchNorm{i}.running_mean -> batch_stats
            # path .../batchNorm{i}/bn/{mean,var}
            stat = 'mean' if leaf == 'running_mean' else 'var'
            _tree_set(batch_stats, path[:-1] + ('bn', stat), arr)
            continue
        # BatchNorm affine: batchNorm{i}.weight -> batchNorm{i}/bn/scale when
        # the template has a 'bn' child (i.e. normMode == batchNorm).
        if (len(path) >= 2 and leaf in ('weight', 'bias')
                and isinstance(_tree_lookup(params_template, path[:-1]), Mapping)
                and 'bn' in _tree_lookup(params_template, path[:-1])):
            flax_leaf = 'scale' if leaf == 'weight' else 'bias'
            _tree_set(params, path[:-1] + ('bn', flax_leaf), arr)
            continue
        match = _match_path(params_template, path)
        if match is None:
            stacked = _match_stacked(params_template, path)
            if stacked is not None:
                alt, head = stacked
                target = _tree_lookup(params_template, alt)
                slice_shape = tuple(target.shape)[1:]
                if arr.shape != slice_shape:
                    if arr.size == int(np.prod(slice_shape)):
                        arr = arr.reshape(slice_shape)
                    else:
                        raise ValueError(
                            f"Shape mismatch for {key}: torch {arr.shape} "
                            f"vs stacked slice {slice_shape}")
                pending_stacks.setdefault(alt, {})[head] = arr
                continue
            unmatched.append(key)
            continue
        target = _tree_lookup(params_template, match)
        tshape = tuple(target.shape)
        if arr.shape != tshape:
            if arr.size == int(np.prod(tshape)):
                arr = arr.reshape(tshape)  # e.g. ChannelNorm (1,C,1) -> (C,)
            else:
                raise ValueError(
                    f"Shape mismatch for {key}: torch {arr.shape} vs "
                    f"flax {tshape}")
        _tree_set(params, match, arr.astype(target.dtype)
                  if hasattr(target, 'dtype') else arr)
    for alt, slices in pending_stacks.items():
        target = _tree_lookup(params_template, alt)
        k = int(target.shape[0])
        missing = [i for i in range(k) if i not in slices]
        if missing:
            raise KeyError(f"Missing predictor heads {missing} for "
                           f"{'.'.join(alt)}")
        stacked_arr = np.stack([slices[i] for i in range(k)], axis=0)
        _tree_set(params, alt, stacked_arr.astype(target.dtype)
                  if hasattr(target, 'dtype') else stacked_arr)
    if strict and unmatched:
        raise KeyError(f"Unmatched torch keys: {unmatched}")
    return params, batch_stats, unmatched


# ---------------------------------------------------------------------------
# flax -> torch
# ---------------------------------------------------------------------------

_BWD_RE = re.compile(r'^(.*)_bwd$')


def _torch_key_from_path(path: Tuple[str, ...],
                         equalized_hint: Optional[str] = None) -> str:
    """Build the torch key for a flax param path.

    equalized_hint: 'ffd' inserts `.module` after lin1/lin2; 'conv' inserts
    `.module.module` before the leaf of ShiftedConv predictors.
    """
    parts = []
    for i, p in enumerate(path):
        m = _BWD_RE.match(p)
        if m and i == len(path) - 2 and path[-1].endswith('_reverse'):
            parts.append(m.group(1))
            continue
        split = None
        for cont in _LIST_CONTAINERS:
            if p.startswith(cont + '_') and p[len(cont) + 1:].isdigit():
                split = (cont, p[len(cont) + 1:])
                break
        if split:
            parts.extend(split)
        else:
            parts.append(p)
    key = '.'.join(parts)
    if equalized_hint == 'ffd':
        key = re.sub(r'\.(lin1|lin2)\.(weight|bias)$', r'.\1.module.\2', key)
    elif equalized_hint == 'conv':
        key = re.sub(r'(predictors\.\d+)\.(weight|bias)$',
                     r'\1.module.module.\2', key)
    return key


def _iter_leaves(tree: Mapping, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _iter_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def params_to_torch_state_dict(params: Mapping,
                               batch_stats: Optional[Mapping] = None,
                               rnn_mode: Optional[str] = None,
                               norm_mode: str = 'layerNorm',
                               channel_norm_names: Tuple[str, ...] =
                               ('batchNorm',)) -> Dict[str, Any]:
    """Convert a flax params dict (optionally with batch_stats) into a torch
    state dict with reference-compatible keys/layouts.

    `norm_mode`: the encoder normMode — ChannelNorm ('layerNorm') affine
    params are (1, C, 1) in torch, instanceNorm's are (C,)."""
    torch = _get_torch()
    hint = None
    if rnn_mode == 'ffd':
        hint = 'ffd'
    elif rnn_mode in ('conv4', 'conv8', 'conv12'):
        hint = 'conv'
    out: Dict[str, Any] = {}
    for path, value in _iter_leaves(params):
        arr = np.asarray(value)
        # vmap-stacked prediction heads: unstack axis 0 back into the
        # reference's per-head `predictors.{k}.*` keys.
        if 'predictors' in path:
            i = path.index('predictors')
            for k in range(arr.shape[0]):
                sub_path = (path[:i] + (f'predictors_{k}',) + path[i + 1:])
                key = _torch_key_from_path(sub_path, hint)
                out[key] = torch.from_numpy(np.array(arr[k]))
            continue
        # BatchNorm scale/bias live under .../bn/
        if len(path) >= 2 and path[-2] == 'bn':
            leaf = 'weight' if path[-1] == 'scale' else 'bias'
            key = _torch_key_from_path(path[:-2] + (leaf,), hint)
        else:
            key = _torch_key_from_path(path, hint)
            # ChannelNorm affine params back to (1, C, 1): detect a
            # batchNorm{i}.{weight,bias} of rank 1 produced by ChannelNorm.
            if (norm_mode == 'layerNorm' and len(path) >= 2
                    and path[-1] in ('weight', 'bias') and arr.ndim == 1
                    and any(path[-2].startswith(n)
                            for n in channel_norm_names)):
                arr = arr.reshape(1, -1, 1)
        out[key] = torch.from_numpy(np.array(arr))
    if batch_stats:
        for path, value in _iter_leaves(batch_stats):
            if path[-2] == 'bn':
                leaf = ('running_mean' if path[-1] == 'mean'
                        else 'running_var')
                key = _torch_key_from_path(path[:-2] + (leaf,), hint)
                out[key] = torch.from_numpy(
                    np.array(value))
    return out


# ---------------------------------------------------------------------------
# Whole-checkpoint IO (reference layout, `feature_loader.py:296-304`)
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    torch = _get_torch()
    return torch.load(path, map_location='cpu', weights_only=False)


def save_checkpoint(model_state: Dict[str, Any],
                    criterion_state: Dict[str, Any],
                    optimizer_state: Any, best_state: Optional[Dict[str, Any]],
                    path_checkpoint: str) -> None:
    """Reference-format save: {gEncoder, cpcCriterion, optimizer, best}."""
    torch = _get_torch()
    state_dict = {"gEncoder": model_state,
                  "cpcCriterion": criterion_state,
                  "optimizer": optimizer_state,
                  "best": best_state}
    torch.save(state_dict, path_checkpoint)
