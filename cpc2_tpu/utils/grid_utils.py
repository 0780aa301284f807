"""SLURM sweep / preemption-requeue helpers
(reference `cpc/utils/grid_utils.py`).

The framework's checkpoint auto-resume (`train.py`) makes requeue-on-
preemption elastic recovery: `SlurmWrapper.checkpoint` resubmits the same
callable via submitit; on restart the trainer resumes from the newest
checkpoint.
"""

from __future__ import annotations

import itertools
import json


class SlurmWrapper:
    """Requeue-on-preemption wrapper (reference `grid_utils.py:9-29`).
    Checkpointing is done within the trainer each epoch."""

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
        training_callable = SlurmWrapper(self.runnable)
        return submitit.helpers.DelayedSubmission(training_callable,
                                                  self.args)


def parse_json_sweep(config):
    """JSON grid -> flag permutations (reference `grid_utils.py:32-58`)."""
    config = {k: v if type(v) is list else [v] for k, v in config.items()}
    perms = list(itertools.product(*config.values()))

    def to_arg(k, v):
        if type(v) in (int, float):
            return f"--{k}={v}"
        elif type(v) is bool:
            return f"--{k}" if v else ""
        elif type(v) is str:
            assert '"' not in v, (f"Key {k} has string value {v} which "
                                  f"contains forbidden quotes.")
            return f'--{k}={v}'
        else:
            raise Exception(f"Key {k} has value {v} of unsupported type "
                            f"{type(v)}.")

    commands = []
    for p in perms:
        args = [to_arg(k, p[i]) for i, k in enumerate(config.keys())]
        commands.append(args)
    return commands


def sweep(fname):
    with open(fname, 'r') as config_file:
        config = json.loads(config_file.read())
    return parse_json_sweep(config)
