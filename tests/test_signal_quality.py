"""Signal-quality-aware training (reference `dataset.py:69-77,106-120` +
`criterion.py:334-351`): per-file (SNR, C50) .pt tensors, min-max
normalization from min_max.csv, sigmoid loss weighting."""


import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def quality_corpus(tmp_path_factory):
    from cpc2_tpu.data.audio_io import save_wav
    root = tmp_path_factory.mktemp("qdb")
    qdir = tmp_path_factory.mktemp("quality")
    rs = np.random.RandomState(0)
    step = 1600
    for spk in ['a', 'b']:
        d = root / spk / 'c'
        d.mkdir(parents=True)
        (qdir / spk / 'c').mkdir(parents=True)
        for i in range(2):
            n = 32000
            x = (0.2 * np.sin(np.arange(n) * 0.04)
                 + 0.05 * rs.randn(n)).astype(np.float32)
            save_wav(str(d / f'{spk}-{i}.wav'), x, 16000)
            n_est = n // step
            snr = torch.from_numpy(
                rs.uniform(0, 30, (n_est, 1)).astype(np.float32))
            c50 = torch.from_numpy(
                rs.uniform(0, 60, (n_est, 1)).astype(np.float32))
            torch.save([snr, c50], str(qdir / spk / 'c' / f'{spk}-{i}.pt'))
    with open(qdir / 'min_max.csv', 'w') as f:
        f.write("min_snr,max_snr,min_c50,max_c50\n0,30,0,60\n")
    return root, qdir


class TestSignalQuality:

    def test_dataset_quality_windows(self, quality_corpus):
        from cpc2_tpu.data.corpus import find_all_seqs
        from cpc2_tpu.data.dataset import AudioBatchData
        root, qdir = quality_corpus
        seqs, speakers = find_all_seqs(str(root), extension='.wav',
                                       loadCache=False)
        ds = AudioBatchData(str(root), 3200, seqs, None, len(speakers),
                            nProcessLoader=1,
                            signal_quality_path=str(qdir),
                            signal_quality_step=1600,
                            signal_quality_mode='snr')
        out = ds[0]
        assert len(out) == 3
        data, label, quality = out
        assert quality.shape == (2,)  # 3200 // 1600
        assert (quality >= 0).all() and (quality <= 1).all()
        batch = ds.get_batch([0, 3200])
        assert batch[2].shape == (2, 2)

    def test_training_with_quality(self, quality_corpus, tmp_path):
        from cpc2_tpu import train as train_cli
        root, qdir = quality_corpus
        ckpt = tmp_path / "ck"
        train_cli.main(['--pathDB', str(root), '--file_extension', '.wav',
                        '--pathCheckpoint', str(ckpt),
                        '--hiddenEncoder', '16', '--hiddenGar', '16',
                        '--nPredicts', '2', '--negativeSamplingExt', '4',
                        '--sizeWindow', '3200', '--nEpoch', '1',
                        '--nGPU', '1', '--batchSizeGPU', '2',
                        '--rnnMode', 'linear', '--arMode', 'GRU',
                        '--samplingType', 'uniform', '--random_seed', '5',
                        '--save_step', '1',
                        '--signal_quality_path', str(qdir),
                        '--signal_quality_mode', 'snr'])
        import json
        with open(ckpt / 'checkpoint_logs.json') as f:
            logs = json.load(f)
        losses = np.asarray(logs['locLoss_train'][0])
        assert np.isfinite(losses).all()
