"""Generate the miniature FB-hub-layout payload fixture
(`tests/fixtures/hub_mini_60k.pt`).

The real libri-light 60k payload (`/root/reference/hubconf.py:22-25`) is a
torch pickle `{"config": vars(args), "weights": CPCModel.state_dict()}`
whose weight keys are the flat `gEncoder.*` / `gAR.*` names the reference
loads with `model.load_state_dict(..., strict=False)`. This script builds
the same layout at miniature dimensions (32-d encoder/AR) so the
`hubconf.CPC_audio(pretrained=...)` conversion path is testable offline;
only the literal HTTP fetch stays untested. Run once; the output is
committed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.io.torch_ckpt import params_to_torch_state_dict


def main():
    args = get_default_cpc_config()
    args.hiddenEncoder = 32
    args.hiddenGar = 32
    args.nLevelsGRU = 1
    # the published FB payload is an LSTM-AR model (reference default)
    args.arMode = 'LSTM'

    bundle = fl.init_model(args, seed=2024)
    weights = params_to_torch_state_dict(
        bundle.variables['params'], norm_mode=args.normMode)
    weights = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
               for k, v in weights.items()}

    payload = {"config": vars(args), "weights": weights}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'fixtures',
        'hub_mini_60k.pt')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    torch.save(payload, out)
    print(f"wrote {out} ({os.path.getsize(out)} bytes, "
          f"{len(weights)} weight keys)")
    print(sorted(weights)[:6])


if __name__ == '__main__':
    main()
