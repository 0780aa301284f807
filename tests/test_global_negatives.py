"""--global_negatives extension (SURVEY §2.6): negatives drawn from the
GLOBAL data-parallel batch via all_gather, instead of the reference's
per-shard (per-GPU) pool.

Exactness anchor: a 2-shard global-negatives run with injected candidate
indices must equal the LOCAL path run on the full (unsharded) batch with
the same indices — the all_gathered pool of shard-halves IS the full
batch, and the collision patch must land in global coordinates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cpc2_tpu.losses import CPCUnsupervisedCriterion
from cpc2_tpu.parallel.mesh import make_mesh

B, S, D_AR, D_ENC, K, N = 4, 16, 8, 8, 2, 6


def _make(global_negatives, pool_axis_size):
    return CPCUnsupervisedCriterion(
        n_predicts=K, dim_ar=D_AR, dim_enc=D_ENC, negative_sampling_ext=N,
        rnn_mode='linear', size_input_seq=S - K,
        global_negatives=global_negatives, pool_axis_size=pool_axis_size)


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(0)
    c = jnp.asarray(rs.randn(B, S, D_AR).astype(np.float32))
    e = jnp.asarray(rs.randn(B, S, D_ENC).astype(np.float32))
    # global-coordinate indices, including deliberate collisions with
    # positive frames of both shards
    idx = rs.randint(0, B * S, size=(B, N, S - K)).astype(np.int32)
    idx[0, 0, 0] = 0 * S + 1      # collides with shard-0 positive (k=1, w=0)
    idx[2, 0, 0] = 2 * S + 1      # collides with shard-1 positive
    return c, e, jnp.asarray(idx)


class TestGlobalNegatives:

    def test_two_shard_global_equals_full_batch_local(self, data):
        c, e, idx = data
        local = _make(False, 1)
        variables = local.init(
            {'params': jax.random.PRNGKey(0)}, c, e, None, train=False)
        want_losses, want_accs = local.apply(c_feature=c, encoded_data=e,
                                             label=None, train=False,
                                             negative_indices=idx,
                                             variables=variables)

        mesh = make_mesh(2)
        global_crit = _make(True, 2)

        def body(c_sh, e_sh, idx_sh):
            losses, accs = global_crit.apply(
                variables, c_sh, e_sh, None, train=False,
                negative_indices=idx_sh)
            return (jax.lax.pmean(losses, 'data'),
                    jax.lax.pmean(accs, 'data'))

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P('data'), P('data'), P('data')),
            out_specs=(P(), P())))
        got_losses, got_accs = f(c, e, idx)

        np.testing.assert_allclose(np.asarray(got_losses),
                                   np.asarray(want_losses), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_accs),
                                   np.asarray(want_accs), atol=1e-6)

    def test_single_shard_global_is_local(self, data):
        c, e, idx = data
        local = _make(False, 1)
        variables = local.init(
            {'params': jax.random.PRNGKey(0)}, c, e, None, train=False)
        a = local.apply(variables, c, e, None, train=False,
                        negative_indices=idx)
        g = _make(True, 1).apply(variables, c, e, None, train=False,
                                 negative_indices=idx)
        for x, y in zip(a, g):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_sampled_indices_span_global_pool(self):
        from cpc2_tpu.losses.criterion import sample_negative_indices
        idx = sample_negative_indices(jax.random.PRNGKey(0), 2, S, 64,
                                      S - K, pool_batch=8)
        idx = np.asarray(idx)
        assert idx.min() >= 0 and idx.max() < 8 * S
        assert idx.max() >= 2 * S  # actually uses the widened pool

    def test_train_cli_runs_with_global_negatives(self, mini_corpus,
                                                  tmp_path):
        from cpc2_tpu import train
        train.main([
            '--pathDB', str(mini_corpus), '--file_extension', '.wav',
            '--pathCheckpoint', str(tmp_path / 'ck'),
            '--hiddenEncoder', '16', '--hiddenGar', '16',
            '--nPredicts', '2', '--negativeSamplingExt', '8',
            '--sizeWindow', '4160', '--nGPU', '2', '--batchSizeGPU', '2',
            '--rnnMode', 'linear', '--arMode', 'GRU',
            '--samplingType', 'uniform', '--random_seed', '5',
            '--logging_step', '50', '--save_step', '1', '--nEpoch', '1',
            '--global_negatives'])
        assert (tmp_path / 'ck' / 'checkpoint_0.pt').exists()
