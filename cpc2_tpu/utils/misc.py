"""Logging, seeding and LR-schedule helpers (reference `cpc/utils/misc.py`).

Schedulers are expressed both as the reference's stateful stepper objects
(`SchedulerCombiner`) for API parity and as a pure `learning_rate_fn(epoch)`
used to build the optax schedule (`make_lr_schedule`).
"""

from __future__ import annotations

import json
import random
import sys
from bisect import bisect_left
from copy import deepcopy
from typing import Callable, Dict, List, Optional

import numpy as np


def untensor(d):
    if isinstance(d, list):
        return [untensor(v) for v in d]
    if isinstance(d, dict):
        return dict((k, untensor(v)) for k, v in d.items())
    if hasattr(d, 'tolist'):
        return d.tolist()
    return d


def save_logs(data: Dict, path_logs: str) -> None:
    """checkpoint_logs.json writer — 2-space-indent JSON, the exact file
    the reference's tooling (best_val_epoch, resume) reads back."""
    with open(path_logs, 'w') as f:
        json.dump(data, f, indent=2)


def update_logs(logs: Dict, log_step: int, prev_logs: Optional[Dict] = None
                ) -> Dict:
    """Per-window means: (cumulative - previous cumulative) / steps, key
    by key — byte-compatible with the reference's accumulator
    (`utils/misc.py:30-38`)."""
    def window_mean(key, total):
        total = deepcopy(total)
        if prev_logs is not None:
            total = total - prev_logs[key]
        return total / log_step
    return {key: window_mean(key, total) for key, total in logs.items()}


def show_logs(text: str, logs: Dict) -> None:
    """The reference's per-prediction-step metric table, byte for byte
    (`utils/misc.py:44-60`): a 'Step 1..K' header row and one
    16-char-right-aligned value row per metric, between 50-dash rules."""
    def row(cells):
        return ' '.join('{:>16}' for _ in cells).format(*cells)

    lines = ["", '-' * 50, text]
    for key, values in logs.items():
        if key == "iter":
            continue
        steps = [str(k) for k in range(1, values.shape[0] + 1)]
        lines.append(row(['Step'] + steps))
        lines.append(row([key] + ['{:10.6f}'.format(v) for v in values]))
    lines.append('-' * 50)
    print('\n'.join(lines))


def set_seed(seed: Optional[int]) -> None:
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed)


def cpu_stats() -> None:
    print(sys.version)
    try:
        import psutil
        print(psutil.cpu_percent())
        print(psutil.virtual_memory())
    except ImportError:
        pass


def ramp_scheduling_function(n_epoch_ramp: int, epoch: int,
                             square_ramp: bool = False) -> float:
    """Linear warm-up (reference `utils/misc.py:77-83`)."""
    if epoch >= n_epoch_ramp:
        return 1
    if square_ramp:
        return ((epoch + 1) / n_epoch_ramp) ** 2
    return (epoch + 1) / n_epoch_ramp


class _FunctionScheduler:
    """Minimal stand-in for torch LambdaLR/StepLR: tracks a multiplicative
    factor as `.step()` is called; `scale` is the current LR multiplier."""

    def __init__(self, fn: Callable[[int], float]):
        self.fn = fn
        self.epoch = 0

    @property
    def scale(self) -> float:
        return self.fn(self.epoch)

    def step(self):
        self.epoch += 1


def step_lr(scheduler_step: int, gamma: float = 0.5) -> _FunctionScheduler:
    return _FunctionScheduler(lambda e: gamma ** (e // scheduler_step))


def lambda_lr(fn: Callable[[int], float]) -> _FunctionScheduler:
    return _FunctionScheduler(fn)


class SchedulerCombiner:
    """Apply schedulers sequentially (reference `utils/misc.py:85-122`)."""

    def __init__(self, scheduler_list: List, activation_step: List[int],
                 curr_step: int = 0):
        if len(scheduler_list) != len(activation_step):
            raise ValueError("The number of scheduler must be the same as "
                             "the number of activation step")
        if activation_step[0] > curr_step:
            raise ValueError("The first activation step cannot be higher "
                             "than the current step.")
        self.scheduler_list = scheduler_list
        self.activation_step = deepcopy(activation_step)
        self.curr_step = curr_step

    def step(self):
        self.curr_step += 1
        index = bisect_left(self.activation_step, self.curr_step) - 1
        for i in reversed(range(index, len(self.scheduler_list))):
            self.scheduler_list[i].step()

    @property
    def scale(self) -> float:
        return float(np.prod([s.scale for s in self.scheduler_list]))

    def __str__(self):
        out = "SchedulerCombiner \n(\n"
        for index, scheduler in enumerate(self.scheduler_list):
            out += f"({index}) {scheduler.__str__()} \n"
        out += ")\n"
        return out


def make_lr_schedule(learning_rate: float, scheduler_step: int,
                     scheduler_ramp: Optional[int]) -> Callable[[int], float]:
    """Pure per-epoch LR function reproducing the reference's
    StepLR(gamma=0.5) + optional linear ramp combination
    (`cpc/train.py:501-520` + `SchedulerCombiner`).

    Exact torch-chained semantics: while the ramp is active (epoch <=
    schedulerRamp) the LambdaLR overwrites the StepLR's multiplications, so
    step decay only accumulates for milestones *after* the ramp:
    lr(e > R) = base * 0.5^(e//step - R//step)."""

    def lr_fn(epoch: int) -> float:
        if scheduler_ramp is not None:
            if epoch <= scheduler_ramp:
                return learning_rate * ramp_scheduling_function(
                    scheduler_ramp, epoch)
            if scheduler_step > 0:
                decays = (epoch // scheduler_step
                          - scheduler_ramp // scheduler_step)
                return learning_rate * 0.5 ** decays
            return learning_rate
        if scheduler_step > 0:
            return learning_rate * 0.5 ** (epoch // scheduler_step)
        return learning_rate

    return lr_fn


_ACTIVATION_DTYPE = None


def activation_dtype():
    """Activation dtype requested by --precision (None = keep f32)."""
    return _ACTIVATION_DTYPE


def apply_precision(precision: str) -> None:
    """Wire the --precision flag to XLA's matmul precision.

    - 'bf16mix' (default): the TPU backend's native mode — bf16 MXU compute
      with fp32 accumulation, fp32 parameters AND fp32 activations. No
      config change.
    - 'fp32': force full-precision matmuls (multi-pass on the MXU); use for
      numerics debugging or strict parity runs. ~3x slower matmuls.
    - 'bf16': bf16 MXU compute AND bf16 activations through the
      transformer prediction heads (params stay fp32; layer norms and
      softmax statistics stay fp32). Halves the HBM traffic of the
      dominant head chains; training numerics shift by ~bf16 rounding.
    """
    import jax
    global _ACTIVATION_DTYPE
    if precision == 'fp32':
        jax.config.update('jax_default_matmul_precision', 'highest')
        _ACTIVATION_DTYPE = None
    elif precision == 'bf16':
        import jax.numpy as jnp
        jax.config.update('jax_default_matmul_precision', 'bfloat16')
        _ACTIVATION_DTYPE = jnp.bfloat16
    elif precision == 'bf16mix':
        _ACTIVATION_DTYPE = None
    else:
        raise ValueError(f"unknown precision {precision!r}")


def apply_prng_impl(prng: str) -> None:
    """Wire the --prng flag to jax's default PRNG implementation.

    'rbg' keys generate random bits with the TPU's hardware RNG
    instruction instead of threefry's ALU chains. The train step draws
    ~33M random bits per step for the head dropout masks (attention probs
    + FFN hiddens, p=0.1 as in the reference `transformers.py:121`), and
    threefry generation is a measured 1.3 ms of a 7.7 ms step; 'rbg'
    removes it (6.3 ms/step). Streams differ between implementations but
    both are deterministic per seed.
    """
    import jax
    if prng not in ('rbg', 'threefry'):
        raise ValueError(f"unknown prng {prng!r}")
    jax.config.update('jax_default_prng_impl', prng)
