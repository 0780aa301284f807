"""WireStager: lossless wire-format reduction for host->device batches
(`parallel/mesh.py`). Every mode must stage values identical to the plain
float32 `shard_batch` path."""

import numpy as np

import jax

from cpc2_tpu.parallel.mesh import WireStager, make_mesh, shard_batch


def _pcm_batch(rs, b=4, w=640):
    ints = rs.randint(-32768, 32768, size=(b, 1, 1, w)).astype(np.float32)
    one = ints / 32768.0
    return np.concatenate([one, one], axis=1)  # identical past/future


class TestWireStager:

    def test_pcm_dedup_batch_uses_i16_and_is_exact(self):
        rs = np.random.RandomState(0)
        seq = _pcm_batch(rs)
        wire, mode = WireStager.to_wire(seq)
        assert mode == 'i16d'
        assert wire.dtype == np.int16
        assert wire.shape == (4, 1, 1, 640)

        mesh = make_mesh(2)
        staged = np.asarray(WireStager(mesh).put(seq))
        want = np.asarray(shard_batch(mesh, seq.astype(np.float32)))
        np.testing.assert_array_equal(staged, want)

    def test_augmented_views_fall_back_and_are_exact(self):
        rs = np.random.RandomState(1)
        seq = _pcm_batch(rs)
        seq = seq + rs.randn(*seq.shape).astype(np.float32) * 1e-3  # off-grid
        seq[:, 1] += 0.01  # views differ
        wire, mode = WireStager.to_wire(seq)
        assert mode == 'f32'

        mesh = make_mesh(2)
        staged = np.asarray(WireStager(mesh).put(seq))
        np.testing.assert_array_equal(staged, seq.astype(np.float32))

    def test_equal_views_off_grid_dedups_only(self):
        rs = np.random.RandomState(2)
        one = rs.randn(4, 1, 1, 320).astype(np.float32)
        seq = np.concatenate([one, one], axis=1)
        wire, mode = WireStager.to_wire(seq)
        assert mode == 'f32d'
        assert wire.shape == (4, 1, 1, 320)

        mesh = make_mesh(2)
        staged = np.asarray(WireStager(mesh).put(seq))
        np.testing.assert_array_equal(staged, seq)

    def test_clipping_boundary_not_misclassified(self):
        # -32768/32768 = -1.0 is on the grid; +32768 would overflow int16,
        # so a batch containing exactly +1.0 must NOT take the int16 path.
        seq = np.zeros((2, 2, 1, 16), np.float32)
        seq[0, :, 0, 0] = 1.0
        wire, mode = WireStager.to_wire(seq)
        assert mode == 'f32d'

        seq[0, :, 0, 0] = -1.0
        wire, mode = WireStager.to_wire(seq)
        assert mode == 'i16d'
        mesh = make_mesh(2)
        staged = np.asarray(WireStager(mesh).put(seq))
        np.testing.assert_array_equal(staged, seq)
