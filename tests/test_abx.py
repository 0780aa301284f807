"""ABX stack tests, mirroring the reference's own unit tests
(`cpc/eval/ABX/unit_tests.py`) including its hand-computed DTW expectations.
Data fixtures are read from the read-only reference checkout when present."""

import math
from pathlib import Path

import numpy as np
import pytest

from cpc2_tpu.eval.abx import abx_group_computation as abx_g
from cpc2_tpu.eval.abx import abx_iterators
from cpc2_tpu.ops.dtw import dtw_normalized, dtw_batch

REF_DATA = Path('/root/reference/cpc/eval/ABX/test_data')


def dtw_reference(dist):
    """Direct numpy port of the Cython DP + backtracking semantics
    (`dtw.pyx:40-77`) used as ground truth."""
    n, m = dist.shape
    cost = np.empty((n, m), dtype=np.float64)
    cost[0, 0] = dist[0, 0]
    for i in range(1, n):
        cost[i, 0] = dist[i, 0] + cost[i - 1, 0]
    for j in range(1, m):
        cost[0, j] = dist[0, j] + cost[0, j - 1]
    for i in range(1, n):
        for j in range(1, m):
            cost[i, j] = dist[i, j] + min(cost[i - 1, j],
                                          cost[i - 1, j - 1],
                                          cost[i, j - 1])
    final = cost[n - 1, m - 1]
    path_len = 1
    i, j = n - 1, m - 1
    while i > 0 and j > 0:
        c_up, c_left, c_diag = cost[i - 1, j], cost[i, j - 1], \
            cost[i - 1, j - 1]
        if c_diag <= c_left and c_diag <= c_up:
            i -= 1
            j -= 1
        elif c_left <= c_up:
            j -= 1
        else:
            i -= 1
        path_len += 1
    if i == 0:
        path_len += j
    if j == 0:
        path_len += i
    return final / path_len


class TestDTW:

    def test_dtw_vs_reference_dp(self):
        rng = np.random.RandomState(0)
        for trial in range(10):
            n = rng.randint(1, 12)
            m = rng.randint(1, 12)
            dist = rng.rand(n, m).astype(np.float32)
            expected = dtw_reference(dist)
            pad = np.zeros((1, 16, 16), np.float32)
            pad[0, :n, :m] = dist
            got = float(np.asarray(dtw_normalized(
                pad, np.array([n]), np.array([m])))[0])
            assert abs(got - expected) < 1e-4, (trial, n, m, got, expected)

    def test_dtw_hand_computed(self):
        """The reference unit test's exact expectations
        (`ABX/unit_tests.py:17-36`)."""
        x = np.array([[[0, 1], [0, 0], [1, 1], [42, 42]],
                      [[0, 2], [0, 1], [1, 1], [-1, 0]],
                      [[0, 0], [0, 1], [0, 0], [21, 211]]], np.float32)
        x_size = np.array([3, 4, 2])
        y = np.array([[[0, 1], [1, 2], [0, 0]]], np.float32)
        y_size = np.array([3])
        dist = abx_g.get_distance_group_dtw(
            x, y, x_size, y_size,
            distance_function=abx_g.get_euclidian_distance_batch)
        assert dist.shape == (3, 1)
        expected = [math.sqrt(2) / 2, 3 / 4, (2 + math.sqrt(2)) / 3]
        for i in range(3):
            assert abs(expected[i] - dist[i, 0]) < 1e-4

    def test_theta_symmetric(self):
        """`ABX/unit_tests.py:38-53` — theta == 0.5."""
        a = np.array([[[0, 1], [0, 0], [1, 1], [42, 42]],
                      [[0, 2], [0, 1], [1, 1], [-1, 0]],
                      [[0, 0], [0, 1], [0, 0], [21, 211]]], np.float32)
        a_size = np.array([3, 4, 2])
        b = np.array([[[0, 1], [1, 2], [0, 0]]], np.float32)
        b_size = np.array([3])
        theta = abx_g.get_theta_group_dtw(
            a, b, a, a_size, b_size, a_size,
            abx_g.get_euclidian_distance_batch, True)
        assert theta == 0.5

    def test_dtw_batch_wrapper(self):
        rng = np.random.RandomState(1)
        nx, ny, s = 3, 4, 7
        dist = rng.rand(nx, ny, s, s).astype(np.float32)
        sx = rng.randint(2, s + 1, nx)
        sy = rng.randint(2, s + 1, ny)
        out = dtw_batch(None, None, sx, sy, dist)
        for i in range(nx):
            for j in range(ny):
                exp = dtw_reference(dist[i, j, :sx[i], :sy[j]])
                assert abs(out[i, j] - exp) < 1e-4


class TestCosineNormalization:

    def test_cosine_normalized(self):
        """`ABX/unit_tests.py:58-82`."""
        x = np.array([[[1., 0., 0., 0.], [0., 0., 0., 0.]],
                      [[0., 0., -1., 0.], [0.5, -0.5, 0.5, -0.5]]],
                     np.float32)
        y = np.array([[[-0.5, -0.5, -0.5, 0.5], [0., 0., 0., 0.],
                       [0., 1., 0., 0.]]], np.float32)
        norm_x = abx_iterators.normalize_with_singularity(x)
        norm_y = abx_iterators.normalize_with_singularity(y)
        dist = np.asarray(abx_g.get_cosine_distance_batch(norm_x, norm_y))
        assert dist.shape == (2, 1, 2, 3)
        expected = {(0, 0, 0, 0): 0.6667, (0, 0, 0, 1): 1.,
                    (0, 0, 0, 2): 0.5, (0, 0, 1, 0): 1.,
                    (0, 0, 1, 1): 0., (0, 0, 1, 2): 1.,
                    (1, 0, 0, 0): 0.3333, (1, 0, 0, 1): 1.,
                    (1, 0, 0, 2): 0.5, (1, 0, 1, 0): 0.6667,
                    (1, 0, 1, 1): 1., (1, 0, 1, 2): 0.6667}
        for coords, val in expected.items():
            assert abs(dist[coords] - val) < 1e-4, coords


class TestGroupMaker:

    def test_1d(self):
        data = [[0], [1], [2], [3], [4], [2], [2], [2]]
        out_index, out_data = abx_iterators.get_features_group(data, [0])
        assert out_index == [0, 1, 2, 5, 6, 7, 3, 4]
        assert out_data == [(0, 1), (1, 2), (2, 6), (6, 7), (7, 8)]

    def test_2d(self):
        data = [[0, 1], [1, 2], [2, 3], [3, 3], [4, 0], [2, 2], [4, 2],
                [2, 2], [0, 3]]
        out_index, out_data = abx_iterators.get_features_group(data, [1, 0])
        assert out_index == [4, 0, 1, 5, 7, 6, 8, 2, 3]
        assert out_data == [[(0, 1)], [(1, 2)], [(2, 3), (3, 5), (5, 6)],
                            [(6, 7), (7, 8), (8, 9)]]

    def test_3d(self):
        data = [[0, 0, 0, 1], [41, 1, 0, 2], [-23, 0, 3, 1], [220, 1, -2, 3],
                [40, 2, 1, 0], [200, 0, 0, 1]]
        out_index, out_data = abx_iterators.get_features_group(data,
                                                               [1, 3, 2])
        assert out_index == [0, 5, 2, 1, 3, 4]
        assert out_data == [[[(0, 2), (2, 3)]], [[(3, 4)], [(4, 5)]],
                            [[(5, 6)]]]


@pytest.mark.skipif(not REF_DATA.is_dir(),
                    reason="reference fixtures unavailable")
class TestItemLoader:

    def test_load_item_file(self):
        out, context_match, phone_match, speaker_match = \
            abx_iterators.load_item_file(REF_DATA / "dummy_item_file.item")
        assert len(out) == 4
        assert phone_match == {'n': 0, 'd': 1, 'ih': 2, 's': 3, 'dh': 4}
        assert speaker_match == {'8193': 0, '2222': 1, '12': 2}
        assert context_match == {'ae+d': 0, 'n+l': 1, 'l+n': 2, 'ih+s': 3,
                                 'n+ax': 4, 'ax+dh': 5, 's+ax': 6}
        assert out['2107'] == [[0.3225, 0.5225, 0, 0, 0],
                               [0.4225, 0.5925, 1, 1, 1],
                               [1.1025, 1.2925, 6, 4, 2]]
        assert out['407'] == [[0.8725, 1.2425, 5, 3, 1]]


@pytest.fixture(scope="module")
def npy_fixtures(tmp_path_factory):
    """The reference repo ships `2107.npy` etc. as empty LFS stubs; their
    content is recoverable from the reference unit-test expectations
    (`ABX/unit_tests.py:214-247`): each file is simply arange(n) — feature i
    has value i. Regenerate equivalent fixtures."""
    d = tmp_path_factory.mktemp("abx_npy")
    for name in ('2107', '42', '23', '407'):
        np.save(d / f"{name}.npy", np.arange(20, dtype=np.float32))
    return d


@pytest.mark.skipif(not REF_DATA.is_dir(),
                    reason="reference fixtures unavailable")
class TestABXFeatureLoader:

    step_feature = 10

    @staticmethod
    def dummy_feature_maker(path_file, *args):
        data = np.load(path_file)
        assert data.ndim == 1
        return data.reshape(1, -1, 1)

    def test_base_loader(self, npy_fixtures):
        seq_list = [('2107', npy_fixtures / '2107.npy'),
                    ('42', npy_fixtures / '42.npy'),
                    ('23', npy_fixtures / '23.npy'),
                    ('407', npy_fixtures / '407.npy')]
        dataset = abx_iterators.ABXFeatureLoader(
            REF_DATA / "dummy_item_file.item", seq_list,
            self.dummy_feature_maker, self.step_feature, False)
        assert dataset.feature_dim == 1
        assert len(dataset) == 9
        assert dataset.data.ndim == 2
        assert len(dataset.data) == 16
        data, size, coords = dataset[0]
        assert size == 1
        assert coords == (0, 0, 0)
        assert data.tolist() == [[3]]
        data, size, coords = dataset[3]
        assert size == 1
        assert coords == (1, 1, 1)
        assert data.tolist() == [[5]]

    def test_within_iterator(self, npy_fixtures):
        seq_list = [('2107', npy_fixtures / '2107.npy'),
                    ('42', npy_fixtures / '42.npy')]
        dataset = abx_iterators.ABXFeatureLoader(
            REF_DATA / "dummy_item_within.item", seq_list,
            self.dummy_feature_maker, self.step_feature, False)
        iterator = dataset.get_iterator('within', 40)
        assert iterator.index_csp == [0, 1, 2, 6, 3, 4, 5, 8, 7]
        assert iterator.groups_csp == [[[(0, 1)]], [[(1, 3)]],
                                       [[(3, 4)], [(4, 6), (6, 7)]],
                                       [[(7, 8)], [(8, 9)]]]
        assert len(iterator) == 1

        it = iter(iterator)
        c1, a_01, b_01, x_01 = next(it)
        assert c1 == (1, 1, 2, 2)
        a_1, s_a = a_01
        assert s_a.tolist() == [1, 1]
        assert a_1.tolist() == [[[4.]], [[5.]]]
        assert x_01[0].tolist() == a_1.tolist()
        assert b_01[0].tolist() == [[[1.]]]
        assert next(it, False) is False
        assert iterator.get_board_size() == (2, 3, 3, 4)


class TestPallasDTW:

    def test_pallas_matches_scan(self):
        """The Pallas TPU kernel (interpret mode on CPU) must match the
        lax.scan wavefront exactly."""
        from cpc2_tpu.ops.dtw_pallas import dtw_normalized_pallas
        import jax.numpy as jnp
        rng = np.random.RandomState(3)
        b, s1, s2 = 9, 16, 24
        dist = rng.rand(b, s1, s2).astype(np.float32)
        n1 = rng.randint(2, s1 + 1, b).astype(np.int32)
        n2 = rng.randint(2, s2 + 1, b).astype(np.int32)
        ref = np.asarray(dtw_normalized(jnp.asarray(dist), jnp.asarray(n1),
                                        jnp.asarray(n2)))
        got = np.asarray(dtw_normalized_pallas(
            jnp.asarray(dist), jnp.asarray(n1), jnp.asarray(n2),
            interpret=True))
        np.testing.assert_allclose(ref, got, atol=1e-6)

    def test_skew_layout(self):
        from cpc2_tpu.ops.dtw_pallas import _skew
        import jax.numpy as jnp
        rng = np.random.RandomState(0)
        d = rng.rand(2, 3, 5).astype(np.float32)
        sk = np.asarray(_skew(jnp.asarray(d)))
        for b in range(2):
            for i in range(3):
                for j in range(5):
                    assert sk[i + j, b, i] == d[b, i, j]

    def test_vmem_gate(self):
        """Long-sequence buckets must never reach the kernel: at the
        minimum 8-pair block a (512, 512) bucket's skewed slab is ~16.7 MB
        (double-buffered ~33 MB), past scoped VMEM — the auto dispatch
        must take the scan fallback instead of failing to compile."""
        from cpc2_tpu.ops.dtw_pallas import (fits_vmem, _pick_block,
                                             _SLAB_LIMIT, _per_pair_bytes)
        assert fits_vmem(128, 128)
        assert not fits_vmem(512, 512)
        # _pick_block never exceeds the slab limit on shapes that pass
        # the gate (block * per-pair <= limit, block a power of two >= 8)
        for s in (16, 64, 128, 256, 448):
            if not fits_vmem(s, s):
                continue
            blk = _pick_block(64, s, s)
            assert blk >= 8 and (blk & (blk - 1)) == 0
            assert blk * _per_pair_bytes(s, s) <= max(
                _SLAB_LIMIT, 8 * _per_pair_bytes(s, s))

    def test_auto_dispatch_large_bucket_falls_back(self, monkeypatch):
        """dtw_normalized_auto on an over-budget bucket must produce the
        scan result (not attempt the Pallas kernel) even when the backend
        gate says TPU."""
        import jax.numpy as jnp
        from cpc2_tpu.ops import dtw as dtw_mod
        monkeypatch.setattr(dtw_mod, '_USE_PALLAS', True)
        called = []
        import cpc2_tpu.ops.dtw_pallas as dp
        monkeypatch.setattr(
            dp, 'dtw_normalized_pallas',
            lambda *a, **k: called.append(True) or dtw_normalized(*a))
        rng = np.random.RandomState(5)
        b, s = 2, 512                     # fits_vmem(512, 512) is False
        dist = jnp.asarray(rng.rand(b, s, s).astype(np.float32))
        n1 = jnp.asarray(np.array([s, s - 7], np.int32))
        n2 = jnp.asarray(np.array([s - 3, s], np.int32))
        ref = np.asarray(dtw_normalized(dist, n1, n2))
        got = np.asarray(dtw_mod.dtw_normalized_auto(dist, n1, n2))
        np.testing.assert_allclose(ref, got, atol=0)
        assert not called


class TestBatchedGroupScoring:
    """The stacked-groups scorer must reproduce the per-group fused path
    exactly (same padding, same DTW, same win/tie counts)."""

    @staticmethod
    def _random_groups(rng, n_groups, symmetric):
        groups = []
        d = 8
        for gi in range(n_groups):
            # varied sizes to force several shape buckets + partial
            # (dummy-padded) flushes
            na = rng.randint(2, 7)
            nb = rng.randint(1, 7)
            s = rng.randint(3, 12)

            def mk(n):
                feats = rng.randn(n, s, d).astype(np.float32)
                feats /= np.linalg.norm(feats, axis=2, keepdims=True)
                sizes = rng.randint(1, s + 1, size=n).astype(np.int64)
                return feats, sizes
            a = mk(na)
            b = mk(nb)
            x = (a[0].copy(), a[1].copy()) if symmetric else mk(
                rng.randint(1, 7))
            coords = (gi, gi % 3, gi % 2, 0)
            groups.append((coords, a, b, x))
        return groups

    @pytest.mark.parametrize("symmetric", [True, False])
    def test_matches_per_group_path(self, symmetric):
        from cpc2_tpu.eval.abx import abx_group_computation as abx_g
        rng = np.random.RandomState(5)
        groups = self._random_groups(rng, 13, symmetric)

        class Fixed:
            def __len__(self):
                return len(groups)

            def __iter__(self):
                return iter(groups)

            def get_board_size(self):
                return (13, 3, 2, 1)

        singles = [float(abx_g.loc_dtw(
            g, abx_g.get_cosine_distance_batch, symmetric)[1])
            for g in groups]
        coords, values, board = abx_g.get_abx_scores_dtw_on_group(
            Fixed(), abx_g.get_cosine_distance_batch, symmetric)
        assert board == (13, 3, 2, 1)
        np.testing.assert_allclose(np.array(singles), values, atol=2e-7)
        np.testing.assert_array_equal(
            coords, np.array([g[0] for g in groups], dtype=np.int64))


class TestGatherPathEquality:
    """The index-gather fast path (flush ships int32 token indices into a
    device-resident feature matrix instead of re-uploading materialized
    blocks) must score EVERY group identically to the value-upload path:
    gathered junk beyond a token's length never reaches the DTW answer
    cell, exactly like the zero padding it replaces."""

    def test_gather_equals_value_path(self):
        import jax
        from cpc2_tpu.eval.abx import abx_group_computation as abx_g
        from cpc2_tpu.eval.abx import abx_iterators

        rs = np.random.RandomState(7)
        t, d = 300, 16

        class _DS:
            feature_dim = d
            data = rs.randn(t, d).astype(np.float32)

        class _It:
            dataset = _DS()
            symmetric = False

            def __init__(self, strip_starts):
                self.strip = strip_starts
                # 5 groups with ragged member counts/lengths
                self.groups = []
                g_rs = np.random.RandomState(1)
                for gi in range(5):
                    def member(n):
                        starts = g_rs.randint(0, t - 12, n)
                        sizes = g_rs.randint(2, 12, n)
                        longest = sizes.max()
                        blk = np.zeros((n, longest, d), np.float32).view(
                            abx_iterators.TokenBlock)
                        for j, (st, sz) in enumerate(zip(starts, sizes)):
                            blk[j, :sz] = _DS.data[st:st + sz]
                        blk.token_starts = starts.astype(np.int64)
                        if self.strip:
                            blk = np.asarray(blk)   # drops token_starts
                        return blk, sizes.astype(np.int64)
                    a = member(3)
                    b = member(2)
                    x = member(4)
                    coords = (gi, 0, 1, 0)
                    self.groups.append((coords, a, b, x))

            def __len__(self):
                return len(self.groups)

            def __iter__(self):
                return iter(self.groups)

            def get_board_size(self):
                return (5, 2, 2, 1)

        dist = abx_g.get_distance_function_from_name('cosine')
        out = {}
        for strip in (False, True):
            it = _It(strip)
            coords, values, board = abx_g.get_abx_scores_dtw_on_group(
                it, dist, it.symmetric)
            out[strip] = np.asarray(values)
        # strip=True forces the value-upload path; strip=False the gather
        np.testing.assert_allclose(out[False], out[True], atol=1e-6)
        assert np.isfinite(out[False]).all()
