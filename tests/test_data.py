"""Data-layer tests mirroring the reference's `cpc/unit_tests.py` strategy:
corpus discovery/ordering, filtering, window loading, pack splitting, and
same-speaker batch homogeneity — on a generated mini corpus."""

import os

import numpy as np

from cpc2_tpu.data.audio_io import audio_info, load_wav, save_wav
from cpc2_tpu.data.corpus import (filter_seqs, find_all_seqs,
                                  parse_seq_labels)
from cpc2_tpu.data.dataset import AudioBatchData


class TestAudioIO:

    def test_wav_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        x = (rng.rand(12345).astype(np.float32) - 0.5)
        p = str(tmp_path / "t.wav")
        save_wav(p, x, 16000)
        y, sr = load_wav(p)
        assert sr == 16000
        assert y.shape == x.shape
        np.testing.assert_allclose(x, y, atol=1.0 / 32000)

    def test_wav_info(self, tmp_path):
        x = np.zeros(4321, np.float32)
        p = str(tmp_path / "t.wav")
        save_wav(p, x, 8000)
        n, sr = audio_info(p)
        assert (n, sr) == (4321, 8000)

    def test_stereo_to_mono(self, tmp_path):
        x = np.stack([np.ones(100, np.float32) * 0.5,
                      -np.ones(100, np.float32) * 0.5])
        p = str(tmp_path / "st.wav")
        save_wav(p, x, 16000)
        y, sr = load_wav(p)
        assert y.shape == (100,)
        np.testing.assert_allclose(y, 0.0, atol=1e-4)


class TestFindAllSeqs:

    def test_speaker_discovery(self, mini_corpus):
        seqs, speakers = find_all_seqs(str(mini_corpus), extension='.wav',
                                       loadCache=False)
        assert len(seqs) == 9
        assert len(speakers) == 7
        # speaker label is the first path component
        for spk_idx, rel in seqs:
            assert rel.split(os.sep)[0] == speakers[spk_idx]

    def test_speaker_level_zero(self, mini_corpus):
        seqs, speakers = find_all_seqs(str(mini_corpus), extension='.wav',
                                       loadCache=False, speaker_level=0)
        assert len(speakers) == 1

    def test_cache(self, mini_corpus, tmp_path):
        cache = str(tmp_path / "cache.txt")
        seqs1, spk1 = find_all_seqs(str(mini_corpus), extension='.wav',
                                    loadCache=False, cache_path=cache)
        seqs2, spk2 = find_all_seqs(str(mini_corpus), extension='.wav',
                                    loadCache=True, cache_path=cache)
        assert seqs1 == seqs2 and spk1 == spk2

    def test_naming_convention_spkr_id(self, tmp_path):
        root = tmp_path / "db"
        (root / "x").mkdir(parents=True)
        for name in ["b-2-c.wav", "a-1-d.wav", "a-2-e.wav", "b-1-f.wav"]:
            save_wav(str(root / "x" / name), np.zeros(100, np.float32),
                     16000)
        seqs, ids = find_all_seqs(str(root), extension='.wav',
                                  loadCache=False, format='spkr-id')
        # sorted temporally by (speaker, id)
        names = [os.path.basename(p) for _, p in seqs]
        assert names == ["a-1-d.wav", "a-2-e.wav", "b-1-f.wav", "b-2-c.wav"]

    def test_filter_seqs(self, mini_corpus, tmp_path):
        seqs, _ = find_all_seqs(str(mini_corpus), extension='.wav',
                                loadCache=False)
        keep = sorted(os.path.splitext(os.path.basename(p))[0]
                      for _, p in seqs)[:4]
        list_file = tmp_path / "list.txt"
        list_file.write_text("\n".join(keep) + "\n")
        filtered = filter_seqs(str(list_file), seqs)
        assert len(filtered) == 4
        got = sorted(os.path.splitext(os.path.basename(p))[0]
                     for _, p in filtered)
        assert got == keep


class TestAudioBatchData:

    def _dataset(self, mini_corpus, window=4000, max_size=None, **kw):
        seqs, speakers = find_all_seqs(str(mini_corpus), extension='.wav',
                                       loadCache=False)
        kwargs = dict(nProcessLoader=2)
        if max_size is not None:
            kwargs['MAX_SIZE_LOADED'] = max_size
        kwargs.update(kw)
        return AudioBatchData(str(mini_corpus), window, seqs, None,
                              len(speakers), **kwargs), speakers

    def test_loading(self, mini_corpus):
        ds, speakers = self._dataset(mini_corpus)
        assert ds.getNPacks() == 1
        assert len(ds) == ds.totSize // 4000
        item, label = ds[0]
        assert item.shape == (2, 1, 4000)
        assert 0 <= int(label) < len(speakers)

    def test_pack_splitting(self, mini_corpus):
        """Force multiple packs with a small MAX_SIZE_LOADED (reference
        `unit_tests.py:151-170` pattern)."""
        ds, _ = self._dataset(mini_corpus, max_size=100000)
        assert ds.getNPacks() > 1
        # iterate one full epoch over all packs
        loader = ds.getDataLoader(2, 'uniform', False, numWorkers=0)
        n = sum(1 for _ in loader)
        assert n > 0

    def test_samespeaker_label_homogeneity(self, mini_corpus):
        """All windows of a samespeaker batch share the speaker label
        (reference `unit_tests.py:130-149`)."""
        ds, _ = self._dataset(mini_corpus)
        loader = ds.getDataLoader(2, 'samespeaker', True, numWorkers=0)
        seen = 0
        for batch, labels in loader:
            labels = np.asarray(labels)
            assert (labels == labels[0]).all()
            seen += 1
        assert seen > 0

    def test_sequential_batches(self, mini_corpus):
        ds, _ = self._dataset(mini_corpus)
        loader = ds.getDataLoader(2, 'sequential', False, numWorkers=0)
        first = next(iter(loader))
        batch, labels = first
        assert batch.shape == (2, 2, 1, 4000)

    def test_phone_labels(self, tmp_path):
        """Aligned phone-label lookup at exact offsets (reference
        `unit_tests.py:190-200` pattern)."""
        root = tmp_path / "db"
        (root / "s1" / "c").mkdir(parents=True)
        n = 160 * 100
        save_wav(str(root / "s1" / "c" / "seqA.wav"),
                 np.zeros(n, np.float32), 16000)
        labels_txt = tmp_path / "phones.txt"
        phone_seq = [i % 7 for i in range(100)]
        labels_txt.write_text("seqA " + " ".join(map(str, phone_seq)) + "\n")
        phone_labels, n_phones = parse_seq_labels(str(labels_txt))
        assert n_phones == 7
        seqs, speakers = find_all_seqs(str(root), extension='.wav',
                                       loadCache=False)
        ds = AudioBatchData(str(root), 160 * 4, seqs, phone_labels,
                            len(speakers), nProcessLoader=1)
        item, label = ds[0]
        assert label.tolist() == phone_seq[:4]
        item, label = ds[160 * 8]
        assert label.tolist() == phone_seq[8:12]
        # mid-window offset: idx // 160 indexing
        item, label = ds[160 * 8 + 80]
        assert label.tolist() == phone_seq[8:12]

    def test_batch_matches_items(self, mini_corpus):
        """Vectorized get_batch == stacked __getitem__."""
        ds, _ = self._dataset(mini_corpus)
        idx = [0, 4000, 12000]
        batch, labels = ds.get_batch(idx)
        for i, j in enumerate(idx):
            item, label = ds[j]
            np.testing.assert_array_equal(batch[i], item)
            assert labels[i] == label


class TestVerboseLoader:

    def test_iter_verbose_flags_artefacts(self, mini_corpus):
        from cpc2_tpu.data.dataset import iter_verbose
        from cpc2_tpu.data.corpus import find_all_seqs
        seqs, speakers = find_all_seqs(str(mini_corpus), extension='.wav',
                                       loadCache=False)
        ds = AudioBatchData(str(mini_corpus), 4000, seqs, None,
                            len(speakers), nProcessLoader=1)
        loader = ds.getDataLoader(2, 'uniform', False, numWorkers=0)
        n = 0
        for (batch, labels), names, artefacts in iter_verbose(loader):
            assert len(names) == batch.shape[0] == len(artefacts)
            assert all(str(mini_corpus) in nm for nm in names)
            n += 1
        assert n > 0


class TestRemoveArtefacts:
    """Reference parity for __remove_artefacts (`dataset.py:486-526`),
    bug-for-bug: the delete flag resets per sequence, so only the LAST
    window's unremovable-artifact status deletes the batch; earlier
    offenders are merely dropped from the batch."""

    class _Sampler:
        def __init__(self, batches):
            self.batches = batches

    def _loader(self):
        from cpc2_tpu.data.dataset import AudioLoader

        class _DS:
            seqLabel = [0, 100, 200]   # two recordings: [0,100), [100,200)
            sizeWindow = 50

        loader = AudioLoader.__new__(AudioLoader)
        loader.dataset = _DS()
        return loader

    def test_mid_batch_offender_keeps_batch(self):
        # 170+50 runs past the LAST boundary (unremovable) but a clean
        # window follows: batch survives minus the offender.
        s = self._loader()._remove_artefacts(self._Sampler([[170, 10]]))
        assert s.batches == [[10]]

    def test_last_window_offender_deletes_batch(self):
        s = self._loader()._remove_artefacts(self._Sampler([[10, 170]]))
        assert s.batches == []

    def test_straddle_shifts_to_next_recording(self):
        # 80+50 crosses into recording 2 (not the last boundary): the
        # window shifts to start at the boundary.
        s = self._loader()._remove_artefacts(self._Sampler([[80, 10]]))
        assert s.batches == [[100, 10]]
