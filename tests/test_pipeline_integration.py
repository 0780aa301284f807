"""Full-pipeline integration: train a tiny CPC model on a generated corpus,
then run every downstream CLI against its checkpoint — linear separability,
k-means clustering, quantization, ABX from_checkpoint, ZeroSpeech export.
This is the coverage the reference never had (`SURVEY.md` §4)."""


import numpy as np
import pytest



@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from cpc2_tpu.data.audio_io import save_wav
    root = tmp_path_factory.mktemp("pipedb")
    rs = np.random.RandomState(7)
    names = []
    for s, spk in enumerate(['s1', 's2', 's3']):
        d = root / spk / 'c'
        d.mkdir(parents=True)
        for i in range(3):
            n = 28000
            t = np.arange(n) / 16000.0
            x = (0.3 * np.sin(2 * np.pi * (120 + 60 * s + 25 * i) * t)
                 + 0.04 * rs.randn(n)).astype(np.float32)
            name = f'{spk}-c-{i:04d}'
            save_wav(str(d / f'{name}.wav'), x, 16000)
            names.append(name)
    return root, names


@pytest.fixture(scope="module")
def checkpoint(corpus, tmp_path_factory):
    from cpc2_tpu import train
    root, _ = corpus
    ckpt = tmp_path_factory.mktemp("pipeckpt")
    train.main(['--pathDB', str(root), '--file_extension', '.wav',
                '--pathCheckpoint', str(ckpt),
                '--hiddenEncoder', '16', '--hiddenGar', '16',
                '--nPredicts', '2', '--negativeSamplingExt', '4',
                '--sizeWindow', '3200', '--nEpoch', '1', '--nGPU', '1',
                '--batchSizeGPU', '4', '--rnnMode', 'linear',
                '--arMode', 'GRU', '--samplingType', 'uniform',
                '--random_seed', '3', '--save_step', '1'])
    return ckpt / 'checkpoint_0.pt'


class TestPipeline:

    def test_linear_separability(self, corpus, checkpoint, tmp_path):
        from cpc2_tpu.eval import linear_separability
        root, names = corpus
        train_list = tmp_path / "train.txt"
        val_list = tmp_path / "val.txt"
        train_list.write_text("\n".join(names[:6]) + "\n")
        val_list.write_text("\n".join(names[6:]) + "\n")
        out = tmp_path / "sep"
        acc = linear_separability.main(
            [str(root), str(train_list), str(val_list), str(checkpoint),
             '--pathCheckpoint', str(out), '--n_epoch', '1',
             '--file_extension', '.wav', '--batchSizeGPU', '4',
             '--nGPU', '1', '--size_window', '3200'])
        assert 0.0 <= float(np.asarray(acc).reshape(-1)[0]) <= 1.0
        assert (out / 'checkpoint_logs.json').exists()

    def test_clustering_and_quantization(self, corpus, checkpoint, tmp_path):
        from cpc2_tpu.clustering import clustering_script, \
            clustering_quantization
        root, names = corpus
        cdir = tmp_path / "clusters"
        clustering_script.main(
            [str(checkpoint), str(cdir), str(root), '-k', '4',
             '--extension', '.wav', '--batchSizeGPU', '8',
             '--sizeWindow', '3200', '-n', '3', '--recursionLevel', '1'])
        assert (cdir / 'checkpoint_last.pt').exists()
        assert (cdir / 'args.json').exists()

        qdir = tmp_path / "quant"
        clustering_quantization.main(
            [str(cdir / 'checkpoint_last.pt'), str(root), str(qdir),
             '--file_extension', '.wav', '--nobatch',
             '--max_size_seq', '3200'])
        qfile = qdir / 'quantized_outputs.txt'
        assert qfile.exists()
        lines = qfile.read_text().strip().split("\n")
        assert len(lines) == len(names)
        for line in lines:
            name, ids = line.split("\t")
            vals = [int(x) for x in ids.split(",")]
            assert all(0 <= v < 4 for v in vals)

        # --separate-speaker: one output file per speaker with the same
        # lines (the reference's version of this flag dead-ends in a
        # NameError after quantizing everything).
        sdir = tmp_path / "quant_sep"
        clustering_quantization.main(
            [str(cdir / 'checkpoint_last.pt'), str(root), str(sdir),
             '--file_extension', '.wav', '--nobatch',
             '--max_size_seq', '3200', '--separate-speaker'])
        per_speaker = {}
        for spk in ('s1', 's2', 's3'):
            f = sdir / f'{spk}_quantized_outputs.txt'
            assert f.exists()
            per_speaker[spk] = f.read_text().strip().split("\n")
            assert len(per_speaker[spk]) == 3
            assert all(ln.split("\t")[0].startswith(spk)
                       for ln in per_speaker[spk])
        assert sorted(ln for lines in per_speaker.values()
                      for ln in lines) == sorted(lines)

    def test_abx_from_checkpoint(self, corpus, checkpoint, tmp_path):
        from cpc2_tpu.eval import eval_ABX
        root, names = corpus
        # synthetic .item file: 2 phones sharing one context, 2 intervals of
        # each phone per file, 3 speakers -> both within and across groups
        lines = ["#file onset offset #phone prev next speaker"]
        for s, spk in enumerate(['s1', 's2', 's3']):
            for i in range(3):
                fid = f'{spk}-c-{i:04d}'
                for j, ph in enumerate(['aa', 'bb']):
                    for rep in range(2):
                        onset = 0.15 + 0.4 * j + 0.9 * rep
                        offset = onset + 0.2
                        lines.append(f"{fid} {onset} {offset} {ph} p n "
                                     f"{spk}")
        item = tmp_path / "test.item"
        item.write_text("\n".join(lines) + "\n")
        out = tmp_path / "abx"
        scores = eval_ABX.main(['from_checkpoint', str(checkpoint),
                                str(item), str(root),
                                '--file_extension', '.wav',
                                '--out', str(out), '--mode', 'all'])
        assert 'within' in scores and 'across' in scores
        assert 0.0 <= scores['within'] <= 1.0
        assert 0.0 <= scores['across'] <= 1.0
        assert (out / 'ABX_scores.json').exists()

    def test_abx_seed_reproducible(self, corpus, checkpoint, tmp_path):
        """--abx_seed makes the triplet-group subsampler deterministic: two
        seeded runs with max_size_group small enough to force subsampling
        produce bit-identical scores (default stays reference-identical
        unseeded)."""
        from cpc2_tpu.eval import eval_ABX
        root, names = corpus
        lines = ["#file onset offset #phone prev next speaker"]
        for s, spk in enumerate(['s1', 's2', 's3']):
            for i in range(3):
                fid = f'{spk}-c-{i:04d}'
                for j, ph in enumerate(['aa', 'bb']):
                    for rep in range(2):
                        onset = 0.15 + 0.4 * j + 0.9 * rep
                        lines.append(f"{fid} {onset} {onset + 0.2} {ph} "
                                     f"p n {spk}")
        item = tmp_path / "seeded.item"
        item.write_text("\n".join(lines) + "\n")

        def run(seed, tag):
            out = tmp_path / f"abx-{tag}"
            return eval_ABX.main(
                ['from_checkpoint', str(checkpoint), str(item), str(root),
                 '--file_extension', '.wav', '--out', str(out),
                 '--mode', 'all', '--max_size_group', '3',
                 '--max_x_across', '1', '--abx_seed', str(seed)])

        a = run(123, 'a')
        b = run(123, 'b')
        assert a == b, (a, b)

    def test_abx_on_clustered_units(self, corpus, checkpoint, tmp_path):
        """eval_ABX_clustering --clustering end-to-end: fit centroids, then
        ABX over the on-the-fly quantized one-hot units (exercises the
        pre-extraction prime() path and the unit feature pipeline)."""
        from cpc2_tpu.clustering import clustering_script
        from cpc2_tpu.eval import eval_ABX_clustering
        root, names = corpus
        cdir = tmp_path / "clusters"
        clustering_script.main(
            [str(checkpoint), str(cdir), str(root), '-k', '4',
             '--extension', '.wav', '--batchSizeGPU', '8',
             '--sizeWindow', '3200', '-n', '2', '--recursionLevel', '1'])

        lines = ["#file onset offset #phone prev next speaker"]
        for spk in ('s1', 's2', 's3'):
            for i in range(3):
                fid = f'{spk}-c-{i:04d}'
                for j, ph in enumerate(['aa', 'bb']):
                    for rep in range(2):
                        onset = 0.15 + 0.4 * j + 0.9 * rep
                        lines.append(f"{fid} {onset} {onset + 0.2} {ph} "
                                     f"p n {spk}")
        item = tmp_path / "units.item"
        item.write_text("\n".join(lines) + "\n")

        out = tmp_path / "abx_units.json"
        scores = eval_ABX_clustering.main(
            ['--clustering', str(cdir / 'checkpoint_last.pt'),
             '--path_audio_data', str(root), '--path_abx_item', str(item),
             '--file-extension', '.wav', '--modes', 'all',
             '--group-modes', 'concat', '--name-output', str(out)])
        assert 0.0 <= scores['within'] <= 1.0
        assert 0.0 <= scores['across'] <= 1.0
        assert out.exists()

    def test_zerospeech_export(self, corpus, checkpoint, tmp_path):
        from cpc2_tpu.eval import build_zeroSpeech_features
        root, names = corpus
        out = tmp_path / "zs"
        build_zeroSpeech_features.main(
            [str(root), str(out), str(checkpoint), '--extension', '.wav',
             '--format', 'npy', '--maxSizeSeq', '16000'])
        files = list(out.glob("*.npy"))
        assert len(files) == len(names)
        feats = np.load(files[0])
        assert feats.ndim == 2 and feats.shape[1] == 16

    def test_best_val_epoch(self, checkpoint):
        from cpc2_tpu.tools.best_val_epoch import find_best_epoch
        epoch, acc = find_best_epoch(str(checkpoint.parent))
        assert epoch == 0
