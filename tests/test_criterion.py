"""InfoNCE criterion correctness.

The fused all-scores formulation is validated against (a) a dense
materialized implementation of the reference math (`cpc/criterion/
criterion.py:237-363`) given the same negative indices, and (b) the actual
reference criterion (torch) loaded from /root/reference with its sampler
monkeypatched to our drawn indices — proving loss/accuracy equivalence
end-to-end for the linear predictor."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpc2_tpu.losses import CPCUnsupervisedCriterion
from cpc2_tpu.losses.criterion import sample_negative_indices


def dense_infonce(preds, z, neg_idx, n_predicts):
    """Reference-style dense computation: build [pos ‖ negs] candidates and
    softmax-CE with label 0. preds: (B,K,W,D); z: (B,S,D); neg_idx: (B,N,W)."""
    b, k, w, d = preds.shape
    s = z.shape[1]
    z_flat = z.reshape(b * s, d)
    negs = z_flat[neg_idx.reshape(-1)].reshape(b, -1, w, d)  # (B,N,W,D)
    losses, accs = [], []
    for ki in range(1, n_predicts + 1):
        pos = z[:, ki:ki + w].reshape(b, 1, w, d)
        cands = np.concatenate([pos, negs], axis=1)          # (B,1+N,W,D)
        scores = (preds[:, ki - 1][:, None] * cands).mean(-1)  # (B,1+N,W)
        scores = np.transpose(scores, (0, 2, 1)).reshape(-1, scores.shape[1])
        # softmax CE with label 0
        m = scores.max(axis=1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(scores - m).sum(axis=1))
        losses.append(np.mean(lse - scores[:, 0]))
        accs.append(np.mean(scores.argmax(axis=1) == 0))
    return np.array(losses), np.array(accs)


class TestInfoNCE:

    def test_fused_equals_dense(self):
        b, s, d, k, n = 4, 24, 12, 3, 10
        rng = np.random.RandomState(0)
        c = rng.randn(b, s, d).astype(np.float32)
        z = rng.randn(b, s, d).astype(np.float32)

        crit = CPCUnsupervisedCriterion(
            n_predicts=k, dim_ar=d, dim_enc=d, negative_sampling_ext=n,
            rnn_mode='linear', size_input_seq=s)
        rngs = {'params': jax.random.PRNGKey(0),
                'negatives': jax.random.PRNGKey(1)}
        params = crit.init(rngs, jnp.asarray(c), jnp.asarray(z), None)
        neg_rng = jax.random.PRNGKey(7)
        w = s - k
        neg_idx = np.asarray(sample_negative_indices(neg_rng, b, s, n, w))
        losses, accs = crit.apply(params, jnp.asarray(c), jnp.asarray(z),
                                  None,
                                  negative_indices=jnp.asarray(neg_idx))
        stacked_w = np.asarray(
            params['params']['wPrediction']['predictors']['weight'])
        preds = np.stack([c[:, :w] @ stacked_w[ki].T for ki in range(k)],
                         axis=1)
        ref_losses, ref_accs = dense_infonce(preds, z, neg_idx, k)
        np.testing.assert_allclose(np.asarray(losses)[0], ref_losses,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(accs)[0], ref_accs, atol=1e-6)

    def test_negative_sampling_semantics(self):
        """Negatives must (a) cover the whole batch, (b) never point at the
        context frame itself (offset 0 w.r.t. position w is excluded)."""
        b, s, n, w = 4, 32, 64, 20
        idx = np.asarray(sample_negative_indices(
            jax.random.PRNGKey(0), b, s, n, w))
        assert idx.min() >= 0 and idx.max() < b * s
        seq_idx = idx % s
        base = np.arange(w)[None, None, :]
        offset = (seq_idx - base) % s
        assert (offset != 0).all(), "negative collided with the context frame"
        batch_idx = idx // s
        assert len(np.unique(batch_idx)) == b, "negatives not batch-wide"

    def test_matches_reference_torch_criterion(self):
        """End-to-end loss/acc equivalence with the actual reference
        criterion, same weights + same negative indices."""
        torch = pytest.importorskip("torch")
        # stub progressbar (unavailable) for cpc.criterion import chain
        sys.modules.setdefault('progressbar', types.ModuleType('progressbar'))
        pkg = types.ModuleType('cpc')
        pkg.__path__ = ['/root/reference/cpc']
        sys.modules.setdefault('cpc', pkg)
        crit_pkg = types.ModuleType('cpc.criterion')
        crit_pkg.__path__ = ['/root/reference/cpc/criterion']
        sys.modules.setdefault('cpc.criterion', crit_pkg)
        spec = importlib.util.spec_from_file_location(
            'cpc.criterion.criterion',
            '/root/reference/cpc/criterion/criterion.py')
        refmod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(refmod)
        except Exception as e:
            pytest.skip(f"reference criterion unimportable: {e}")

        b, s, d, k, n = 3, 20, 8, 4, 6
        w = s - k
        rng = np.random.RandomState(3)
        c = rng.randn(b, s, d).astype(np.float32)
        z = rng.randn(b, s, d).astype(np.float32)

        jcrit = CPCUnsupervisedCriterion(
            n_predicts=k, dim_ar=d, dim_enc=d, negative_sampling_ext=n,
            rnn_mode='linear', size_input_seq=s)
        rngs = {'params': jax.random.PRNGKey(0),
                'negatives': jax.random.PRNGKey(1)}
        params = jcrit.init(rngs, jnp.asarray(c), jnp.asarray(z), None)
        neg_rng = jax.random.PRNGKey(11)
        neg_idx = np.asarray(sample_negative_indices(neg_rng, b, s, n, w))
        jl, ja = jcrit.apply(params, jnp.asarray(c), jnp.asarray(z), None,
                             negative_indices=jnp.asarray(neg_idx))

        tcrit = refmod.CPCUnsupersivedCriterion(
            k, d, d, n, rnnMode=None, sizeInputSeq=s)
        # install our linear predictor weights (vmap-stacked, axis 0 = k)
        stacked_w = np.asarray(
            params['params']['wPrediction']['predictors']['weight'])
        with torch.no_grad():
            for ki in range(k):
                tcrit.wPrediction.predictors[ki].weight.copy_(
                    torch.from_numpy(stacked_w[ki].copy()))
        # monkeypatch sampleClean to use OUR negative indices

        def sample_clean(encoded_data, window_size):
            neg_ext = encoded_data.contiguous().view(-1, d)
            ext = neg_ext[torch.from_numpy(neg_idx.reshape(-1))].view(
                b, n, window_size, d)
            outputs = []
            for kk in range(1, k + 1):
                if kk < k:
                    pos_seq = encoded_data[:, kk:-(k - kk)]
                else:
                    pos_seq = encoded_data[:, kk:]
                pos_seq = pos_seq.view(b, 1, pos_seq.size(1), d)
                outputs.append(torch.cat((pos_seq, ext), dim=1))
            return outputs, torch.zeros(b * window_size, dtype=torch.long)

        tcrit.sampleClean = sample_clean
        tcrit.eval()
        with torch.no_grad():
            # quality weighting path hardcodes cuda in the reference;
            # pass explicit ones via signal_quality=None equivalent
            preds, label = tcrit.getPrediction(
                torch.from_numpy(c), torch.from_numpy(z), None)
            tl, ta = [], []
            ce = torch.nn.CrossEntropyLoss()
            for kk, loc in enumerate(preds):
                loc = loc.permute(0, 2, 1).contiguous().view(-1, 1 + n)
                tl.append(float(ce(loc, label)))
                ta.append(float((loc.max(1)[1] == label).float().mean()))
        np.testing.assert_allclose(np.asarray(jl)[0], np.array(tl),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(ja)[0], np.array(ta),
                                   atol=1e-6)

    def test_reverse_mode(self):
        b, s, d, k, n = 2, 16, 8, 2, 4
        rng = np.random.RandomState(0)
        c = rng.randn(b, s, d).astype(np.float32)
        z = rng.randn(b, s, d).astype(np.float32)
        fwd = CPCUnsupervisedCriterion(
            n_predicts=k, dim_ar=d, dim_enc=d, negative_sampling_ext=n,
            rnn_mode='linear', size_input_seq=s)
        rev = CPCUnsupervisedCriterion(
            n_predicts=k, dim_ar=d, dim_enc=d, negative_sampling_ext=n,
            rnn_mode='linear', size_input_seq=s, mode='reverse')
        rngs = {'params': jax.random.PRNGKey(0),
                'negatives': jax.random.PRNGKey(1)}
        params = fwd.init(rngs, jnp.asarray(c), jnp.asarray(z), None)
        idx = sample_negative_indices(jax.random.PRNGKey(5), b, s, n, s - k)
        lf, _ = fwd.apply(params, jnp.asarray(c), jnp.asarray(z), None,
                          negative_indices=idx)
        # reverse on flipped inputs == forward on original inputs
        lr, _ = rev.apply(params, jnp.asarray(c[:, ::-1].copy()),
                          jnp.asarray(z[:, ::-1].copy()), None,
                          negative_indices=idx)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lr), atol=1e-6)

    def test_quality_weighting(self):
        b, s, d, k, n = 2, 16, 8, 2, 4
        rng = np.random.RandomState(0)
        c = rng.randn(b, s, d).astype(np.float32)
        z = rng.randn(b, s, d).astype(np.float32)
        q = rng.rand(b, 12).astype(np.float32)
        crit = CPCUnsupervisedCriterion(
            n_predicts=k, dim_ar=d, dim_enc=d, negative_sampling_ext=n,
            rnn_mode='linear', size_input_seq=s, growth_rate=10.0,
            inflection_point_x=0.5)
        rngs = {'params': jax.random.PRNGKey(0),
                'negatives': jax.random.PRNGKey(1)}
        params = crit.init(rngs, jnp.asarray(c), jnp.asarray(z), None)
        l_plain, _ = crit.apply(params, jnp.asarray(c), jnp.asarray(z), None,
                                rngs={'negatives': jax.random.PRNGKey(5)})
        l_q, _ = crit.apply(params, jnp.asarray(c), jnp.asarray(z), None,
                            jnp.asarray(q),
                            rngs={'negatives': jax.random.PRNGKey(5)})
        # weight = 1e-5 + sigmoid(10*(mean(q)-0.5)) per batch element
        wgt = 1e-5 + 1 / (1 + np.exp(-10 * (q.mean(1) - 0.5)))
        assert not np.allclose(np.asarray(l_plain), np.asarray(l_q))
        # With per-(b,w) losses weighted by w[b], mean over b of w must
        # bracket the ratio.
        ratio = np.asarray(l_q).sum() / np.asarray(l_plain).sum()
        assert wgt.min() - 0.2 < ratio < wgt.max() + 0.2

    def test_n_skipped(self):
        b, s, d, k, n = 2, 16, 8, 4, 4
        rng = np.random.RandomState(0)
        c = rng.randn(b, s, d).astype(np.float32)
        z = rng.randn(b, s, d).astype(np.float32)
        crit = CPCUnsupervisedCriterion(
            n_predicts=k, dim_ar=d, dim_enc=d, negative_sampling_ext=n,
            rnn_mode='linear', size_input_seq=s, n_skipped=2)
        rngs = {'params': jax.random.PRNGKey(0),
                'negatives': jax.random.PRNGKey(1)}
        params = crit.init(rngs, jnp.asarray(c), jnp.asarray(z), None)
        losses, accs = crit.apply(params, jnp.asarray(c), jnp.asarray(z),
                                  None,
                                  rngs={'negatives': jax.random.PRNGKey(5)})
        assert losses.shape == (1, 2)
        assert accs.shape == (1, 2)


class TestHeadRemat:
    """`--head_remat` must be a pure scheduling change: same params tree,
    bit-identical losses and gradients for both prediction-network kinds."""

    def _grads(self, crit, c, z, seed=3):
        rngs = {'params': jax.random.PRNGKey(0),
                'negatives': jax.random.PRNGKey(1),
                'dropout': jax.random.PRNGKey(2)}
        params = crit.init(rngs, jnp.asarray(c), jnp.asarray(z), None)

        def loss_fn(p):
            losses, _ = crit.apply(
                p, jnp.asarray(c), jnp.asarray(z), None,
                rngs={'negatives': jax.random.PRNGKey(seed),
                      'dropout': jax.random.PRNGKey(seed + 1)})
            return jnp.sum(losses), losses

        (tot, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return params, np.asarray(losses), grads

    @pytest.mark.parametrize('multihead', [False, True])
    @pytest.mark.parametrize('policy', [True, 'nothing', 'dots'])
    def test_bit_identical(self, multihead, policy):
        b, s, d, k, n = 2, 20, 8, 3, 6
        rng = np.random.RandomState(0)
        c = rng.randn(b, s, d).astype(np.float32)
        z = rng.randn(b, s, d).astype(np.float32)
        kw = dict(n_predicts=k, dim_ar=d, dim_enc=d,
                  negative_sampling_ext=n, rnn_mode='transformer',
                  size_input_seq=s, multihead_rnn=multihead)
        p0, l0, g0 = self._grads(
            CPCUnsupervisedCriterion(**kw, head_remat=False), c, z)
        p1, l1, g1 = self._grads(
            CPCUnsupervisedCriterion(**kw, head_remat=policy), c, z)
        assert jax.tree_util.tree_structure(p0) == \
            jax.tree_util.tree_structure(p1)
        np.testing.assert_array_equal(l0, l1)
        for a, bb in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    def test_unknown_policy_rejected(self):
        b, s, d, k, n = 1, 12, 8, 2, 4
        rng = np.random.RandomState(0)
        c = rng.randn(b, s, d).astype(np.float32)
        z = rng.randn(b, s, d).astype(np.float32)
        crit = CPCUnsupervisedCriterion(
            n_predicts=k, dim_ar=d, dim_enc=d, negative_sampling_ext=n,
            rnn_mode='transformer', size_input_seq=s, head_remat='bogus')
        with pytest.raises(ValueError, match='head_remat'):
            self._grads(crit, c, z)


class TestCTCPhoneCriterion:
    """torch nn.CTCLoss parity: reduction='mean' divides each sample's loss
    by its target length before the batch mean (reference
    `criterion.py:469,494`); the collapsed label chain supplies the
    lengths."""

    def test_matches_torch_ctcloss(self):
        import torch
        from cpc2_tpu.losses.criterion import CTCPhoneCriterion
        rs = np.random.RandomState(0)
        b, s, h, n_phones = 3, 12, 8, 5
        crit = CTCPhoneCriterion(dim_encoder=h, n_phones=n_phones)
        c = jnp.asarray(rs.randn(b, s, h).astype(np.float32))
        lab = np.array([[0] * 4 + [1] * 4 + [2] * 4,          # collapses to 3
                        [3] * 12,                              # collapses to 1
                        [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1]], # stays 12
                       np.int32)
        variables = crit.init(jax.random.PRNGKey(0), c, None,
                              jnp.asarray(lab))
        loss, _ = crit.apply(variables, c, None, jnp.asarray(lab))

        params = variables['params']['PhoneCriterionClassifier']
        w, bias = np.asarray(params['weight']), np.asarray(params['bias'])
        logits = np.asarray(c) @ w.T + bias
        preds = torch.log_softmax(torch.from_numpy(logits), dim=2)
        preds = preds.permute(1, 0, 2)
        targets = [[0, 1, 2], [3], [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1]]
        sizes = torch.tensor([len(t) for t in targets])
        tgt = torch.zeros(b, int(sizes.max()), dtype=torch.long)
        for i, t in enumerate(targets):
            tgt[i, :len(t)] = torch.tensor(t)
        ctc = torch.nn.CTCLoss(blank=n_phones, zero_infinity=True)
        ref = ctc(preds, tgt, torch.full((b,), s, dtype=torch.long), sizes)
        np.testing.assert_allclose(np.asarray(loss)[0, 0], ref.item(),
                                   rtol=1e-4)

    def test_infeasible_sample_zeroed_like_torch(self):
        """zero_infinity=True parity: a target longer than the logit
        sequence contributes 0 — optax reports such samples as large
        FINITE values (~1e5), never inf, so an isfinite guard alone
        silently explodes the batch mean instead of matching torch."""
        import torch
        from cpc2_tpu.losses.criterion import CTCPhoneCriterion
        rs = np.random.RandomState(2)
        b, s, h, n_phones = 2, 4, 8, 5
        crit = CTCPhoneCriterion(dim_encoder=h, n_phones=n_phones)
        c = jnp.asarray(rs.randn(b, s, h).astype(np.float32))
        # sample 0 collapses to 8 labels > 4 logit frames (infeasible);
        # sample 1 collapses to 2 (feasible)
        lab = np.array([[0, 1, 2, 3, 4, 0, 1, 2],
                        [3, 3, 3, 3, 2, 2, 2, 2]], np.int32)
        variables = crit.init(jax.random.PRNGKey(0), c, None,
                              jnp.asarray(lab))
        loss, _ = crit.apply(variables, c, None, jnp.asarray(lab))

        params = variables['params']['PhoneCriterionClassifier']
        w, bias = np.asarray(params['weight']), np.asarray(params['bias'])
        logits = np.asarray(c) @ w.T + bias
        preds = torch.log_softmax(torch.from_numpy(logits), 2).permute(1, 0, 2)
        targets = [[0, 1, 2, 3, 4, 0, 1, 2], [3, 2]]
        sizes = torch.tensor([len(t) for t in targets])
        tgt = torch.zeros(b, 8, dtype=torch.long)
        for i, t in enumerate(targets):
            tgt[i, :len(t)] = torch.tensor(t)
        ctc = torch.nn.CTCLoss(blank=n_phones, zero_infinity=True)
        ref = ctc(preds, tgt, torch.full((b,), s, dtype=torch.long), sizes)
        assert np.isfinite(ref.item())
        np.testing.assert_allclose(np.asarray(loss)[0, 0], ref.item(),
                                   rtol=1e-4)

    def test_cv_mean_reduction_matches_torch(self):
        """The Common-Voices CTC head's reduction='mean' path (the CLI
        default) applies the same per-target-length normalization."""
        import torch
        from cpc2_tpu.eval.common_voices_eval import CTCPhoneCriterionCV
        rs = np.random.RandomState(1)
        b, s, h, n_phones = 2, 16, 8, 4
        crit = CTCPhoneCriterionCV(dim_encoder=h, n_phones=n_phones,
                                   reduction='mean')
        c = jnp.asarray(rs.randn(b, s, h).astype(np.float32))
        feat_size = jnp.asarray([16, 12], np.int32)
        label = jnp.asarray([[0, 1, 2, 0, 0], [3, 2, 0, 0, 0]], np.int32)
        label_size = jnp.asarray([4, 2], np.int32)
        variables = crit.init(jax.random.PRNGKey(0), c, feat_size, label,
                              label_size, train=False)
        loss = crit.apply(variables, c, feat_size, label, label_size,
                          train=False)

        logits = np.asarray(crit.apply(variables, c, feat_size,
                                       method=crit.get_prediction))
        t_logit = torch.log_softmax(torch.from_numpy(logits), 2)
        fs = torch.clamp(torch.tensor([16 // 4, 12 // 4]),
                         max=t_logit.shape[1])
        ctc = torch.nn.CTCLoss(blank=n_phones, reduction='mean',
                               zero_infinity=True)
        ref = ctc(t_logit.permute(1, 0, 2), torch.from_numpy(np.asarray(
            label)).long(), fs, torch.tensor([4, 2]))
        np.testing.assert_allclose(np.asarray(loss)[0, 0], ref.item(),
                                   rtol=1e-4)
