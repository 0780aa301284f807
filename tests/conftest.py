"""Test configuration: run JAX on a simulated 8-device CPU mesh so sharding
tests exercise real multi-device paths without TPU hardware."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin ignores JAX_PLATFORMS from the environment in some
# builds; force the CPU backend explicitly so tests are hermetic and fast.
jax.config.update('jax_platforms', 'cpu')
# CPU matmuls default to fast-but-loose on some backends; tests compare
# against fp64/torch references, so use full fp32 precision.
jax.config.update('jax_default_matmul_precision', 'highest')

import numpy as np
import pytest


# Canonical global-config baselines, captured before any test (or any
# module-scoped fixture calling `train.main`) can change them.
_BASE_PRNG = jax.config.jax_default_prng_impl
_BASE_MATMUL = jax.config.jax_default_matmul_precision


@pytest.fixture(autouse=True)
def _isolate_global_jax_config():
    """`train.main`/`bench.py` set process-global jax config (PRNG impl,
    matmul precision) via `--prng`/`--precision`. Restore the canonical
    baselines after every test — snapshot-restore is NOT enough, because a
    module-scoped fixture (e.g. test_train_e2e's `run_dir`) runs
    `train.main` before this function-scoped fixture can snapshot."""
    from cpc2_tpu.utils import misc as _misc
    yield
    if jax.config.jax_default_prng_impl != _BASE_PRNG:
        jax.config.update('jax_default_prng_impl', _BASE_PRNG)
    if jax.config.jax_default_matmul_precision != _BASE_MATMUL:
        jax.config.update('jax_default_matmul_precision', _BASE_MATMUL)
    _misc._ACTIVATION_DTYPE = None


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def mini_corpus(tmp_path_factory):
    """A tiny on-disk wav corpus shaped like LibriSpeech
    (speaker/chapter/file), mirroring the reference's bundled test_db."""
    from cpc2_tpu.data.audio_io import save_wav
    root = tmp_path_factory.mktemp("test_db")
    rs = np.random.RandomState(0)
    layout = {
        "2911": {"12359": [("2911-12359-0007", 43680)]},
        "4051": {"11218": [("4051-11218-0044", 36240)]},
        "4397": {"15668": [("4397-15668-0003", 52400),
                           ("4397-15668-0007", 41600)]},
        "5393": {"19218": [("5393-19218-0024", 46800)]},
        "5678": {"43301": [("5678-43301-0021", 39040),
                           ("5678-43301-0024", 33920)]},
        "6476": {"57446": [("6476-57446-0019", 62480)]},
        "8193": {"112949": [("8193-112949-0034", 27200)]},
    }
    for spk, chapters in layout.items():
        for chap, files in chapters.items():
            d = root / spk / chap
            d.mkdir(parents=True, exist_ok=True)
            for name, n in files:
                t = np.arange(n) / 16000.0
                f0 = 80 + (hash(name) % 200)
                x = (0.3 * np.sin(2 * np.pi * f0 * t)
                     + 0.05 * rs.randn(n)).astype(np.float32)
                save_wav(str(d / f"{name}.wav"), x, 16000)
    return root
