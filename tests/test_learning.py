"""Gradient-quality guard: the full jitted training step must actually LEARN.

Overfits one fixed batch of structured synthetic audio (speaker-distinct
stationary tones; past frames predict future frames) with fixed negative
samples, and asserts InfoNCE loss collapses and prediction accuracy rises
far above chance. Catches subtle gradient/optimizer wiring bugs that
shape-only e2e tests cannot (reference behavior: `cpc/train.py` loss tables
decrease per epoch)."""

import numpy as np

import jax

from cpc2_tpu import feature_loader as fl
from cpc2_tpu.config import get_default_cpc_config
from cpc2_tpu.parallel.mesh import make_mesh, shard_batch
from cpc2_tpu.train import get_criterion, init_criterion_vars
from cpc2_tpu.training import build_steps, create_train_state, make_optimizer


def test_infonce_overfits_fixed_batch():
    args = get_default_cpc_config()
    args.hiddenEncoder = args.hiddenGar = 32
    args.nPredicts, args.negativeSamplingExt = 2, 8
    args.sizeWindow = 4160
    args.batchSizeGPU = 8
    args.learningRate = 3e-3
    args.rnnMode, args.arMode = 'linear', 'GRU'

    mesh = make_mesh(1)
    bundle = fl.init_model(args, seed=0)
    criterion = get_criterion(args, 160, n_speakers=4, n_phones=None)
    criterion_vars = init_criterion_vars(criterion, args, bundle)
    tx = make_optimizer(args)
    state = create_train_state(bundle.variables, criterion_vars, tx)
    train_step, _ = build_steps(bundle.module, criterion, tx, mesh)

    # One fixed batch: a distinct tone per item + tiny noise. The positive
    # future frame shares the item's tone; in-batch negatives mostly don't.
    rs = np.random.RandomState(0)
    b = args.batchSizeGPU
    freqs = rs.choice([220.0, 330.0, 440.0, 550.0, 660.0, 880.0], size=b)
    t = np.arange(2 * args.sizeWindow) / 16000.0
    phases = rs.uniform(0, 2 * np.pi, size=b)[:, None]
    x = 0.4 * np.sin(2 * np.pi * freqs[:, None] * t[None] + phases)
    x = (x + 0.005 * rs.randn(b, t.size)).astype(np.float32)
    batch_np = np.stack([x[:, :args.sizeWindow], x[:, args.sizeWindow:]],
                        axis=1)[:, :, None, :]
    labels = np.zeros((b,), np.int32)
    batch, lab = shard_batch(mesh, batch_np, labels)

    # fixed rng => fixed negative indices => a deterministic overfit target
    key = jax.random.PRNGKey(0)
    first_loss = None
    for step in range(120):
        state, losses, accs = train_step(state, batch, lab, key)
        if step == 0:
            first_loss = float(np.asarray(losses).mean())

    last_loss = float(np.asarray(losses).mean())
    last_acc = float(np.asarray(accs).mean())

    # chance accuracy is 1/(1+8) ~= 11%; initial loss is ln(9) ~= 2.20
    assert abs(first_loss - np.log(9)) < 0.1, first_loss
    assert last_loss < 1.7, (first_loss, last_loss)
    assert last_acc > 0.3, last_acc
