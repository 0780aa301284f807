"""C++ host DTW kernel vs the JAX wavefront implementation: bit parity."""

import numpy as np
import pytest

from cpc2_tpu.ops import dtw as dtw_jax
from cpc2_tpu.ops import dtw_host

pytestmark = pytest.mark.skipif(dtw_host.get_lib() is None,
                                reason="libdtwhost.so not built")


def test_bit_parity_random_batch(rng):
    b, s1, s2 = 24, 37, 29
    dist = rng.rand(b, s1, s2).astype(np.float32)
    n1 = rng.randint(1, s1 + 1, size=b).astype(np.int32)
    n2 = rng.randint(1, s2 + 1, size=b).astype(np.int32)
    ours = dtw_host.dtw_normalized_host(dist, n1, n2)
    ref = np.asarray(dtw_jax.dtw_normalized(dist, n1, n2))
    np.testing.assert_array_equal(ours, ref)


def test_bit_parity_with_ties(rng):
    # Quantized distances force plenty of DP ties, exercising the
    # diag <= left <= up backtrack tie-break.
    b, s = 16, 20
    dist = (rng.randint(0, 3, size=(b, s, s)) * 0.5).astype(np.float32)
    n1 = np.full(b, s, np.int32)
    n2 = rng.randint(2, s + 1, size=b).astype(np.int32)
    ours = dtw_host.dtw_normalized_host(dist, n1, n2)
    ref = np.asarray(dtw_jax.dtw_normalized(dist, n1, n2))
    np.testing.assert_array_equal(ours, ref)


def test_reference_unit_expectations():
    # The reference's own unit test values (`cpc/eval/ABX/unit_tests.py`)
    # are already pinned for the JAX kernel in tests/test_abx.py; spot-check
    # the host kernel on the same hand-computable cases.
    d = np.array([[[0.0, 1.0], [1.0, 0.0]]], np.float32)
    out = dtw_host.dtw_normalized_host(d, np.array([2]), np.array([2]))
    # path (0,0)->(1,1): cost 0, length 2
    np.testing.assert_allclose(out, [0.0])
    d2 = np.array([[[1.0, 2.0], [3.0, 1.0]]], np.float32)
    out2 = dtw_host.dtw_normalized_host(d2, np.array([2]), np.array([2]))
    np.testing.assert_allclose(out2, [1.0])  # diag path cost 2 / len 2


def test_dtw_batch_host_matches_jax_batch(rng):
    nx, ny, s1, s2 = 3, 4, 12, 15
    dist = rng.rand(nx, ny, s1, s2).astype(np.float32)
    sx = rng.randint(2, s1 + 1, size=nx)
    sy = rng.randint(2, s2 + 1, size=ny)
    ours = dtw_host.dtw_batch_host(None, None, sx, sy, dist)
    ref = dtw_jax.dtw_batch(None, None, sx, sy, dist)
    np.testing.assert_allclose(ours, np.asarray(ref), atol=0, rtol=0)


def test_symmetric_ignore_diag(rng):
    n, s = 5, 10
    dist = rng.rand(n, n, s, s).astype(np.float32)
    dist = dist + dist.transpose(1, 0, 3, 2)  # symmetric pair matrix
    sx = np.full(n, s)
    out = dtw_host.dtw_batch_host(None, None, sx, sx, dist,
                                  ignore_diag=True, symetric=True)
    assert np.all(np.diag(out) == 0.0)
    np.testing.assert_allclose(out, out.T, rtol=0, atol=0)
