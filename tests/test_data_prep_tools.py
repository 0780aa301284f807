"""Direct coverage for the data-preparation tools (`cpc2_tpu/tools/`):
RTTM segment extraction, power-of-two curriculum builder, SNR/C50 filtering
(reference `cpc/eval/utils/*`, `data_preparation/*`)."""

import os

import numpy as np
import pytest

from cpc2_tpu.data.audio_io import load_wav, save_wav


@pytest.fixture
def rttm_corpus(tmp_path):
    """Two wav files + matching .rttm annotations."""
    audio = tmp_path / "audio"
    rttm = tmp_path / "rttm"
    audio.mkdir(), rttm.mkdir()
    sr = 16000
    for name in ("rec1", "rec2"):
        x = np.sin(np.arange(6 * sr) * 0.01).astype(np.float32)
        save_wav(str(audio / f"{name}.wav"), x, sr)
        # RTTM: SPEAKER file 1 onset duration <NA> <NA> speaker <NA> <NA>
        lines = [
            f"SPEAKER {name} 1 0.50 1.20 <NA> <NA> KCHI <NA> <NA>",
            f"SPEAKER {name} 1 2.00 0.05 <NA> <NA> KCHI <NA> <NA>",  # short
            f"SPEAKER {name} 1 3.00 1.00 <NA> <NA> FEM <NA> <NA>",
            f"SPEAKER {name} 1 4.50 0.80 <NA> <NA> MAL <NA> <NA>",  # class out
        ]
        (rttm / f"{name}.rttm").write_text("\n".join(lines) + "\n")
    return audio, rttm


class TestExtractSegments:

    def test_load_all_rttm_filters(self, rttm_corpus):
        from cpc2_tpu.tools.extract_segments import load_all_rttm
        audio, rttm = rttm_corpus
        segs = load_all_rttm(str(rttm), classes={"KCHI", "FEM"}, regex="",
                             min_dur=0.1, path_audios=str(audio))
        # per file: 1.20s KCHI + 1.00s FEM (0.05s filtered by min_dur,
        # MAL filtered by class)
        assert len(segs) == 4
        assert all(s[3] in ("KCHI", "FEM") for s in segs)
        assert all(s[2] >= 0.1 for s in segs)

    def test_cut_wave_file(self, rttm_corpus, tmp_path):
        from cpc2_tpu.tools.extract_segments import cut_wave_file
        audio, _ = rttm_corpus
        out = tmp_path / "cut"
        (out / "KCHI").mkdir(parents=True)
        cut_wave_file(str(audio / "rec1.wav"), onset=0.5, duration=1.2,
                      spkr="KCHI", output_path=str(out))
        got, sr = load_wav(str(out / "KCHI" / "rec1_KCHI_0.50_1.70.wav"))
        assert got.shape[0] == int(1.2 * sr)
        full, _ = load_wav(str(audio / "rec1.wav"))
        np.testing.assert_allclose(got, full[int(0.5 * sr):int(1.7 * sr)],
                                   atol=1e-4)

    def test_longest_sampler_and_symlinks(self, rttm_corpus, tmp_path):
        from cpc2_tpu.tools.extract_segments import (create_symlink,
                                                     segment_sampler)
        audio, _ = rttm_corpus
        out = tmp_path / "tiers"
        # hour-scale annotated durations so the 1h/2h tiers are distinct
        # (the wav slice just clamps to the end of the file)
        segs = [[str(audio / "rec1.wav"), 0.0, 3600.0 + 10 * k, "KCHI"]
                for k in range(4)]
        with pytest.raises(ValueError):
            segment_sampler(segs, [100 * 3600], 'longest', str(out / "x"))
        durations = np.asarray([3600, 7200])
        segment_sampler(segs, durations, 'longest', str(out))
        h1 = list((out / "1h").rglob("*.wav"))
        assert len(h1) == 1  # longest-first: first pick already >= 1h
        assert len(list((out / "2h").rglob("*.wav"))) == 3
        create_symlink(str(out), durations, ["KCHI"])
        # the 1h tier is now included in the 2h tier via symlinks
        for f in h1:
            assert (out / "2h" / "KCHI" / f.name).is_symlink()

    def test_random_sampler(self, rttm_corpus, tmp_path):
        from cpc2_tpu.tools.extract_segments import (load_all_rttm,
                                                     segment_sampler)
        audio, rttm = rttm_corpus
        segs = load_all_rttm(str(rttm), {"KCHI", "FEM"}, "", 0.1, str(audio))
        np.random.seed(0)
        out = tmp_path / "rand"
        segment_sampler(segs, np.asarray([2]), 'random', str(out))
        assert len(list((out / "0h").rglob("*.wav"))) >= 1


class TestPowerTwoBuilder:

    def test_packets_partition_and_double(self, tmp_path, monkeypatch):
        import cpc2_tpu.tools.build_power_two_training as b2
        audio = tmp_path / "db"
        (audio / "spk").mkdir(parents=True)
        sr = 16000
        for i in range(8):
            save_wav(str(audio / "spk" / f"u{i}.wav"),
                     np.zeros(sr, np.float32), sr)
        # pretend each file is 30 min so tier names (1h, 2h, 4h) are distinct
        monkeypatch.setattr(b2, 'get_audio_duration', lambda p: 1800.0)
        out = tmp_path / "curriculum"
        b2.main(['--audio_path', str(audio), '--duration', '3600',
                 '--nb_packets', '4', '--output_path', str(out)])
        tier1 = out / "1h"
        packets = sorted(p.name for p in tier1.iterdir())
        assert packets == ['0', '1', '2', '3']
        seen = set()
        for p in tier1.iterdir():
            files = {f.name for f in p.rglob("*.wav")}
            assert len(files) == 2
            assert not (files & seen)  # mutually exclusive
            seen |= files
        assert len(seen) == 8
        # gathered tiers double duration, halve packet count
        assert sorted(p.name for p in (out / "2h").iterdir()) == ['0', '1']
        files_2h0 = {f.name for f in (out / "2h" / "0").rglob("*.wav")}
        assert len(files_2h0) == 4
        assert sorted(p.name for p in (out / "4h").iterdir()) == ['0']
        assert len(list((out / "4h" / "0").rglob("*.wav"))) == 8

    def test_existing_output_rejected(self, tmp_path):
        from cpc2_tpu.tools.build_power_two_training import main
        out = tmp_path / "exists"
        out.mkdir()
        with pytest.raises(ValueError):
            main(['--audio_path', str(tmp_path), '--duration', '4',
                  '--nb_packets', '2', '--output_path', str(out)])


class TestSnrC50Filter:

    @pytest.fixture
    def scored_segments(self, tmp_path):
        pd = pytest.importorskip("pandas")
        seg = tmp_path / "segments" / "no_filter"
        pred = tmp_path / "pred"
        seg.mkdir(parents=True), pred.mkdir()
        names, snrs, c50s = [], [], []
        for i in range(10):
            name = f"utt{i}"
            save_wav(str(seg / f"{name}.wav"),
                     np.zeros(1600, np.float32), 16000)
            names.append(name)
            snrs.append(float(i))          # utt9 best snr
            c50s.append(float(9 - i))      # utt0 best c50
        (pred / "mean_snr_labels.txt").write_text(
            "".join(f"{n} {v}\n" for n, v in zip(names, snrs)))
        (pred / "reverb_labels.txt").write_text(
            "".join(f"{n} {v}\n" for n, v in zip(names, c50s)))
        return tmp_path / "segments", pred

    def test_table_and_filtering(self, scored_segments):
        from cpc2_tpu.tools.filter import (create_snr_c50_table,
                                           create_symlinks, filter_data)
        seg_dir, pred_dir = scored_segments
        table = create_snr_c50_table(str(seg_dir), str(pred_dir))
        assert len(table) == 10
        assert os.path.exists(seg_dir / "no_filter" /
                              "brouhaha_snr_c50_scores.csv")
        # normalized columns span [0, 1]
        assert table["snr_normalized"].min() == 0.0
        assert table["snr_normalized"].max() == 1.0

        top20 = filter_data(table, "snr", 20)
        assert list(top20["uri"]) == ["utt9", "utt8"]
        top_c50 = filter_data(table, "c50", 10)
        assert list(top_c50["uri"]) == ["utt0"]

        create_symlinks(top20, str(seg_dir), "snr", 20)
        links = list((seg_dir / "snr" / "20").rglob("*.wav"))
        assert sorted(x.stem for x in links) == ["utt8", "utt9"]

    def test_prediction_count_mismatch(self, scored_segments, tmp_path):
        from cpc2_tpu.tools.filter import create_snr_c50_table
        seg_dir, pred_dir = scored_segments
        extra = seg_dir / "no_filter" / "extra.wav"
        save_wav(str(extra), np.zeros(160, np.float32), 16000)
        with pytest.raises(ValueError):
            create_snr_c50_table(str(seg_dir), str(pred_dir))

    def test_random_filter(self, scored_segments):
        from cpc2_tpu.tools.filter import (create_snr_c50_table,
                                           randomly_filter_data)
        seg_dir, pred_dir = scored_segments
        table = create_snr_c50_table(str(seg_dir), str(pred_dir))
        sampled = randomly_filter_data(table, "random", 50)
        assert len(sampled) == 5
