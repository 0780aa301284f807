"""Common Voices CTC pipeline integration (reference
`cpc/eval/common_voices_eval.py`): train the CTC head on whole utterances,
then compute PER via beam search."""


import numpy as np
import pytest


@pytest.fixture(scope="module")
def cv_corpus(tmp_path_factory):
    from cpc2_tpu.data.audio_io import save_wav
    root = tmp_path_factory.mktemp("cvdb")
    rs = np.random.RandomState(0)
    lines = []
    names = []
    for i in range(6):
        n = 16000 + 1600 * i          # 1.0-1.5 s utterances
        x = (0.3 * np.sin(2 * np.pi * (150 + 40 * i)
                          * np.arange(n) / 16000.0)
             + 0.03 * rs.randn(n)).astype(np.float32)
        name = f'utt{i:03d}'
        (root / 'd').mkdir(exist_ok=True)
        save_wav(str(root / 'd' / f'{name}.wav'), x, 16000)
        # short transcripts (3-5 phones from an inventory of 6)
        transcript = rs.randint(0, 6, size=3 + i % 3)
        lines.append(name + " " + " ".join(map(str, transcript)))
        names.append(name)
    phones = tmp_path_factory.mktemp("cvlabels") / "phones.txt"
    phones.write_text("\n".join(lines) + "\n")
    return root, str(phones), names


@pytest.fixture(scope="module")
def cpc_ckpt(cv_corpus, tmp_path_factory):
    from cpc2_tpu import train
    root, _, _ = cv_corpus
    ckpt = tmp_path_factory.mktemp("cvckpt")
    train.main(['--pathDB', str(root), '--file_extension', '.wav',
                '--pathCheckpoint', str(ckpt),
                '--hiddenEncoder', '16', '--hiddenGar', '16',
                '--nPredicts', '2', '--negativeSamplingExt', '4',
                '--sizeWindow', '3200', '--nEpoch', '1', '--nGPU', '1',
                '--batchSizeGPU', '2', '--rnnMode', 'linear',
                '--arMode', 'GRU', '--samplingType', 'uniform',
                '--random_seed', '1', '--save_step', '1'])
    return str(ckpt / 'checkpoint_0.pt')


class TestCommonVoices:

    def test_train_then_per(self, cv_corpus, cpc_ckpt, tmp_path):
        from cpc2_tpu.eval import common_voices_eval as cv
        root, phones, names = cv_corpus
        out = tmp_path / "cvout"
        cv.main(['train', str(root), phones, cpc_ckpt, '--freeze',
                 '--file_extension', '.wav', '--batchSize', '2',
                 '--nEpochs', '1', '-o', str(out)])
        assert (out / 'checkpoint.pt').exists()
        assert (out / 'args_training.json').exists()

        cv.main(['per', str(out), '--batchSize', '2',
                 '--file_extension', '.wav'])
        assert (out / 'args_validation_0.json').exists()

    def test_train_unfrozen_dropout(self, cv_corpus, cpc_ckpt, tmp_path):
        # Fine-tune mode (no --freeze) runs the feature net in train mode and
        # --dropout activates the criterion's Dropout — both need a dropout
        # rng threaded through the jitted step (regression: crashed with
        # flax's missing-rng error).
        from cpc2_tpu.eval import common_voices_eval as cv
        root, phones, names = cv_corpus
        out = tmp_path / "cvout_dropout"
        cv.main(['train', str(root), phones, cpc_ckpt, '--dropout',
                 '--file_extension', '.wav', '--batchSize', '2',
                 '--nEpochs', '1', '-o', str(out)])
        assert (out / 'checkpoint.pt').exists()

    def test_single_sequence_dataset(self, cv_corpus):
        from cpc2_tpu.data.corpus import findAllSeqs, parseSeqLabels
        from cpc2_tpu.eval.common_voices_eval import SingleSequenceDataset
        root, phones, names = cv_corpus
        phone_labels, n_phones = parseSeqLabels(phones)
        assert n_phones == 6
        seqs, _ = findAllSeqs(str(root), extension='.wav', loadCache=False)
        ds = SingleSequenceDataset(str(root), seqs, phone_labels,
                                   random_offset_amplitude=0)
        assert len(ds) == 6
        seq, size_seq, phone, size_phone = ds[0]
        assert seq.shape == (1, ds.maxSize)
        assert 3 <= size_phone <= 5
        batches = list(ds.batches(2, shuffle=False))
        assert len(batches) == 3
        assert batches[0][0].shape[0] == 2
        # ragged tail runs (reference DataLoader drop_last=False)
        batches = list(ds.batches(4, shuffle=False))
        assert [b[0].shape[0] for b in batches] == [4, 2]
        assert ds.n_batches(4) == 2
