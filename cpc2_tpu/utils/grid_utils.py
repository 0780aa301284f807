"""SLURM sweep / preemption-requeue helpers
(reference `cpc/utils/grid_utils.py`).

A sweep is a JSON object mapping flag names to a value or a list of values;
every combination becomes one command line. `SlurmWrapper` makes a training
callable requeue itself on preemption via submitit — combined with the
trainer's per-epoch checkpoint auto-resume (`train.py`), preemptions are
lossless (elastic recovery).
"""

from __future__ import annotations

import itertools
import json


class SlurmWrapper:
    """Requeue-on-preemption wrapper (reference `grid_utils.py:9-29`).

    The trainer checkpoints every epoch, so on requeue the fresh submission
    simply resumes from the newest checkpoint."""

    def __init__(self, runnable, verbose=False):
        self.runnable = runnable
        self.args = None
        self.verbose = verbose

    def __call__(self, args):
        self.args = args
        if self.verbose:
            print(f'# launching {json.dumps(args)}', flush=True)
        self.runnable(args)

    def checkpoint(self, _):
        import submitit
        return submitit.helpers.DelayedSubmission(
            SlurmWrapper(self.runnable), self.args)


def _format_flag(name, value):
    """One swept value -> one CLI token (reference `grid_utils.py:36-46`):
    numbers and strings render as --name=value (strings may not contain
    double quotes), booleans render as a bare --name or an empty token."""
    if isinstance(value, bool):
        # bool first: bool is a subclass of int
        return f"--{name}" if value else ""
    if isinstance(value, (int, float)):
        return f"--{name}={value}"
    if isinstance(value, str):
        assert '"' not in value, (
            f"sweep axis {name}: double quotes are not allowed in string "
            f"values ({value!r})")
        return f'--{name}={value}'
    raise Exception(
        f"sweep axis {name}: cannot render a {type(value).__name__} "
        f"({value!r}) as a flag")


def parse_json_sweep(config):
    """JSON grid -> list of flag-token lists, one per combination
    (reference `grid_utils.py:32-58`). Scalar values act as 1-element
    axes."""
    axes = {name: vals if isinstance(vals, list) else [vals]
            for name, vals in config.items()}
    names = list(axes.keys())
    return [[_format_flag(name, choice)
             for name, choice in zip(names, combo)]
            for combo in itertools.product(*axes.values())]


def sweep(fname):
    with open(fname, 'r') as config_file:
        return parse_json_sweep(json.load(config_file))
