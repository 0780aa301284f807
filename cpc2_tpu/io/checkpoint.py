"""Checkpoint discovery, args/logs side-files
(reference `cpc/feature_loader.py:150-199`, `cpc/utils/misc.py:25-27`).

Layout parity: `checkpoint_<epoch>.pt` torch pickles next to
`checkpoint_args.json` / `checkpoint_logs.json`; auto-resume picks the
highest-numbered checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Optional, Tuple

from ..config import get_default_cpc_config


def save_logs(data: Dict[str, Any], path_logs: str) -> None:
    with open(path_logs, 'w') as f:
        json.dump(data, f, indent=2)


def save_args(args: argparse.Namespace, path_args: str) -> None:
    with open(path_args, 'w') as f:
        json.dump(vars(args), f, indent=2)


def load_args(args: argparse.Namespace, loc_args: argparse.Namespace,
              forbidden_attr=None) -> None:
    """In-place update of `args` from `loc_args` minus forbidden attributes
    (reference `feature_loader.py:150-156`)."""
    for k, v in vars(loc_args).items():
        if forbidden_attr is not None:
            if k not in forbidden_attr:
                setattr(args, k, v)
        else:
            setattr(args, k, v)


# Reference-spelled alias
loadArgs = load_args


def get_checkpoint_data(path_dir: str
                        ) -> Optional[Tuple[str, Dict, argparse.Namespace]]:
    """Find the newest checkpoint in a run directory
    (reference `feature_loader.py:176-199`). Returns
    (abs checkpoint path, logs dict, merged args namespace) or None."""
    if not os.path.isdir(path_dir):
        return None
    checkpoints = [x for x in os.listdir(path_dir)
                   if os.path.splitext(x)[1] == '.pt'
                   and os.path.splitext(x[11:])[0].isdigit()]
    if len(checkpoints) == 0:
        print("No checkpoints found at " + path_dir)
        return None
    checkpoints.sort(key=lambda x: int(os.path.splitext(x[11:])[0]))
    data = os.path.join(path_dir, checkpoints[-1])

    with open(os.path.join(path_dir, 'checkpoint_logs.json'), 'rb') as f:
        logs = json.load(f)
    with open(os.path.join(path_dir, 'checkpoint_args.json'), 'rb') as f:
        args = json.load(f)

    args = argparse.Namespace(**args)
    default_args = get_default_cpc_config()
    load_args(default_args, args)
    return os.path.abspath(data), logs, default_args


# Reference-spelled alias
getCheckpointData = get_checkpoint_data
