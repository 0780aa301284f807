"""Measured anchor for the training-step baseline: the REFERENCE
implementation's train step (model + InfoNCE criterion fwd/bwd + Adam) on
torch CPU — the only hardware it can run on here.

The published vs_baseline figures divide by an ESTIMATED ~95 ms/step on a
V100 (the reference publishes no numbers and no GPU exists here); this
script pins a measured same-host lower bound so the estimate has an
anchor: a V100 is far faster than this host's single CPU core, so
the true GPU denominator lies between the two.

Usage: PYTHONPATH=/root/repo python scripts/bench_reference_step.py
Prints one line: reference torch-CPU ms/step at the recipe config.
"""

import importlib.util
import os
import sys
import time

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = '/root/reference'


def _load_parity_module():
    spec = importlib.util.spec_from_file_location(
        'abx_parity', os.path.join(REPO, 'scripts', 'abx_parity.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    par = _load_parity_module()
    par._install_reference_shims()
    # reference criterion hardcodes device='cuda' for its quality-weighting
    # ones (`criterion.py:340` — SURVEY §2.10 stale code); map it to cpu.
    _ones = torch.ones

    def _ones_cpu(*a, **kw):
        if kw.get('device') == 'cuda':
            kw['device'] = 'cpu'
        return _ones(*a, **kw)
    torch.ones = _ones_cpu
    sys.path.insert(0, REF)
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    from cpc.model import CPCEncoder, CPCAR, CPCModel
    from cpc.criterion.criterion import CPCUnsupersivedCriterion

    # the published recipe (cpc_default_config.py defaults)
    encoder = CPCEncoder(256, 'layerNorm')
    ar = CPCAR(256, 256, False, 1, mode='LSTM')
    model = CPCModel(encoder, ar)
    criterion = CPCUnsupersivedCriterion(nPredicts=12, dimOutputAR=256,
                                         dimOutputEncoder=256,
                                         negativeSamplingExt=128,
                                         mode=None, rnnMode='transformer',
                                         dropout=False,
                                         nSpeakers=64, sizeInputSeq=128)
    params = list(model.parameters()) + list(criterion.parameters())
    opt = torch.optim.Adam(params, lr=2e-4)

    b = 8
    rs = np.random.RandomState(0)
    batch = torch.from_numpy(
        rs.randn(b, 2, 1, 20480).astype(np.float32))
    label = torch.zeros(b, dtype=torch.long)

    def step():
        # reference trainStep semantics (`cpc/train.py:72-142`)
        past, future = batch[:, 0], batch[:, 1]
        combined = torch.cat([past, future], dim=0)
        c_feature, encoded_data, lab = model(combined, label)
        c_feature = c_feature[:b]
        encoded_data = encoded_data[b:]
        all_losses, all_acc = criterion(c_feature, encoded_data, lab, None)
        tot = all_losses.sum()
        tot.backward()
        opt.step()
        opt.zero_grad()

    for _ in range(3):
        step()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            step()
        times.append((time.perf_counter() - t0) / 10)
    best = min(times) * 1000
    ah_per_h = b * 20480 / 16000 / (best / 1000)  # audio-seconds per second
    print(f"reference torch-CPU train step (recipe config, batch {b}): "
          f"{best:.1f} ms/step = {ah_per_h:.2f} audio-hours/hour")


if __name__ == '__main__':
    main()
