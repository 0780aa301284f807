"""In-RAM chunked audio corpus + streaming loader
(reference `cpc/dataset.py:23-600`).

Host-side by design: the TPU never sees files, only fixed-shape float32
batches. Structure kept from the reference:

* **packs** — the sequence list is split so each pack's total length fits
  `MAX_SIZE_LOADED`; one pack lives in RAM as a single concatenated float32
  array (`dataset.py:174-191, 256`);
* **double buffering** — the next pack is decoded by a worker pool while the
  current one is being consumed (`dataset.py:197-220`);
* per-pack prefix-sum label indexes (`speakerLabel`, `seqLabel`) for O(log n)
  speaker lookup (`dataset.py:222-265`);
* `__getitem__` returns the reference's `(2, 1, W)` stacked (past, future)
  views with independent augmentation (`dataset.py:291-330`);
* batches are gathered **vectorized** (one fancy-index per batch) instead of
  per-item Dataset `__getitem__` calls — with a single-digit-core host this
  is the difference between feeding a TPU and starving it.
"""

from __future__ import annotations

import csv
import functools
import os
import random
import time
from concurrent.futures import ThreadPoolExecutor
from copy import deepcopy
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .audio_io import audio_info, load_audio
from .samplers import (BatchSampler, SameSpeakerSampler, SequentialSampler,
                       TemporalSameSpeakerSampler, UniformAudioSampler)


def extract_length(couple) -> int:
    _speaker, loc_path = couple
    n_frames, _sr = audio_info(str(loc_path))
    return n_frames


def load_file(data, signal_quality_step: Optional[int] = None):
    """Decode one file (reference `dataset.py:411-431`). Returns
    (speaker, seqName, waveform float32[, signal_quality])."""
    info1, info2 = data
    if isinstance(info1, (int, np.integer)):
        seq_info, signal_quality_path = (info1, info2), None
    else:
        seq_info, signal_quality_path = info1, info2

    speaker, full_path = seq_info
    seq_name = Path(full_path).stem
    seq, _sr = load_audio(str(full_path))
    seq = np.asarray(seq, dtype=np.float32)
    if signal_quality_path is not None:
        import torch
        sq = torch.load(signal_quality_path, weights_only=False)
        sq = np.concatenate([np.asarray(t) for t in sq], axis=1)
        seq = seq[:sq.shape[0] * signal_quality_step]
        return speaker, seq_name, seq, sq
    return speaker, seq_name, seq


class PeakNorm:
    """Per-sequence peak normalization (reference `dataset.py:433-438`)."""

    def __call__(self, x: np.ndarray) -> np.ndarray:
        max_val = np.abs(x).max(axis=-1, keepdims=True)
        return x / (max_val + 1e-8)


class AudioBatchData:

    def __init__(self,
                 path,
                 sizeWindow: int,
                 seqNames: Sequence[Tuple[int, str]],
                 phoneLabelsDict: Optional[dict],
                 nSpeakers: int,
                 nProcessLoader: int = 10,
                 MAX_SIZE_LOADED: int = 4000000000,
                 transform: Optional[Callable] = None,
                 augment_past: bool = False,
                 augment_future: bool = False,
                 augmentation: Optional[Callable] = None,
                 keep_temporality: bool = True,
                 past_equal_future: bool = False,
                 signal_quality_path: Optional[str] = None,
                 signal_quality_step: int = 1600,
                 signal_quality_mode: Optional[str] = None):
        self.MAX_SIZE_LOADED = MAX_SIZE_LOADED
        self.nProcessLoader = nProcessLoader
        self.dbPath = Path(path)
        self.sizeWindow = sizeWindow
        self.seqNames = [(s, self.dbPath / x) for s, x in seqNames]
        self.reload_pool = ThreadPoolExecutor(max_workers=max(
            1, nProcessLoader))
        self.transform = transform
        self.keep_temporality = keep_temporality

        self.signal_quality_path = (Path(signal_quality_path)
                                    if signal_quality_path is not None
                                    else None)
        self.signal_quality_step = signal_quality_step
        self.signal_quality_size = self.sizeWindow // self.signal_quality_step
        self.signal_quality_mode = signal_quality_mode
        if self.signal_quality_path is not None:
            self.init_min_max_signal_quality()

        self.augment_past = augment_past
        self.augment_future = augment_future
        self.augmentation = augmentation
        self.past_equal_future = past_equal_future
        if self.past_equal_future and not self.augment_past:
            raise ValueError(
                "Can only apply the same transformation on past and future "
                "sequences, when past sequence is augmented. Here "
                "--augment_past = False")

        self.doubleLabels = False

        self.prepare()
        self.speakers = list(range(nSpeakers))
        self.data = np.zeros(0, dtype=np.float32)
        self.data_quality = np.zeros((0, 3), dtype=np.float32)

        self.phoneSize = 0 if phoneLabelsDict is None else \
            phoneLabelsDict["step"]
        self.phoneStep = 0 if phoneLabelsDict is None else \
            self.sizeWindow // self.phoneSize
        self.phoneLabelsDict = deepcopy(phoneLabelsDict)
        self.loadNextPack(first=True)
        self.loadNextPack()

    # ------------------------------------------------------------------
    # Pack management
    # ------------------------------------------------------------------

    def init_min_max_signal_quality(self):
        file_path = self.signal_quality_path / 'min_max.csv'
        if not file_path.is_file():
            raise FileNotFoundError(
                'Can not find file containing min/max values of snr and c50 '
                'under: %s' % file_path)
        with open(file_path, 'r') as fin:
            reader = csv.reader(fin)
            keys = next(reader)
            values = next(reader)
            data = {k: v for k, v in zip(keys, values)}
            try:
                self.min_snr = float(data['min_snr'])
                self.max_snr = float(data['max_snr'])
                self.min_c50 = float(data['min_c50'])
                self.max_c50 = float(data['max_c50'])
            except Exception:
                raise ValueError(
                    "min_max.csv should contain the following keys: min_snr, "
                    "max_snr, min_c50, max_c50.")

    def resetPhoneLabels(self, newPhoneLabels, step):
        self.phoneSize = step
        self.phoneStep = self.sizeWindow // self.phoneSize
        self.phoneLabelsDict = deepcopy(newPhoneLabels)
        self.loadNextPack()

    def getSeqNames(self) -> List[str]:
        return [str(x[1]) for x in self.seqNames]

    def clear(self):
        self.data = np.zeros(0, dtype=np.float32)
        self.speakerLabel = [0]
        self.seqLabel = [0]
        self.phoneLabels = []

    def prepare(self):
        if self.keep_temporality:
            # Shuffle whole same-session blocks, preserving temporal order
            # inside each block (reference `dataset.py:149-160`).
            blocks = []
            curr = None
            for seq_id, seq_path in self.seqNames:
                if curr != seq_id:
                    blocks.append([(seq_id, seq_path)])
                    curr = seq_id
                else:
                    blocks[-1].append((seq_id, seq_path))
            random.shuffle(blocks)
            self.seqNames = [item for b in blocks for item in b]
        else:
            random.shuffle(self.seqNames)

        if self.signal_quality_path is not None:
            self.signal_quality_names = [
                self.signal_quality_path /
                os.path.relpath(x, self.dbPath).replace('.wav', '.pt')
                for s, x in self.seqNames]

        start_time = time.time()
        print("Checking length...")
        all_length = list(self.reload_pool.map(extract_length, self.seqNames))

        self.seqLengths = list(all_length)
        self.packageIndex, self.totSize = [], 0
        start, package_size = 0, 0
        for index, length in enumerate(all_length):
            package_size += length
            if package_size > self.MAX_SIZE_LOADED:
                self.packageIndex.append([start, index])
                self.totSize += package_size
                start, package_size = index, 0
        if package_size > 0:
            self.packageIndex.append([start, len(self.seqNames)])
            self.totSize += package_size

        print(f'Scanned {len(self.seqNames)} sequences '
              f'in {time.time() - start_time:.2f} seconds')
        print(f"{len(self.packageIndex)} chunks computed")
        self.currentPack = -1
        self.nextPack = 0
        self._future = None

    def getNPacks(self):
        return len(self.packageIndex)

    def max_pack_samples(self) -> int:
        """Largest pack's total sample count (from the scan lengths,
        without loading any pack) — the multi-process `DeviceCorpus`
        sizes its pod-uniform HBM slab from the pod max of this."""
        return max(sum(self.seqLengths[a:b])
                   for a, b in self.packageIndex)

    def loadNextPack(self, first: bool = False):
        self.clear()
        if not first:
            self.currentPack = self.nextPack
            start_time = time.time()
            self.nextData = self._future.result()
            print(f'Joined process, elapsed={time.time()-start_time:.3f} '
                  f'secs')
            self.parseNextDataBlock()
            del self.nextData

        self.nextPack = (self.currentPack + 1) % len(self.packageIndex)
        seq_start, seq_end = self.packageIndex[self.nextPack]
        if self.nextPack == 0 and len(self.packageIndex) > 1:
            self.prepare()
            seq_start, seq_end = self.packageIndex[self.nextPack]

        if self.signal_quality_path is not None:
            loader = functools.partial(
                load_file, signal_quality_step=self.signal_quality_step)
            items = list(zip(self.seqNames[seq_start:seq_end],
                             self.signal_quality_names[seq_start:seq_end]))
        else:
            loader = load_file
            items = self.seqNames[seq_start:seq_end]
        self._future = self.reload_pool.submit(
            lambda: list(map(loader, items)))

    def parseNextDataBlock(self):
        self.speakerLabel = [0]
        self.seqLabel = [0]
        self.phoneLabels = []
        speaker_size = 0
        index_speaker = 0

        self.nextData.sort(key=lambda x: (x[0], x[1]))
        tmp_data = []
        tmp_quality = []

        for speaker, seq_name, seq, *signal_quality in self.nextData:
            while self.speakers[index_speaker] < speaker:
                index_speaker += 1
                self.speakerLabel.append(speaker_size)
            if self.speakers[index_speaker] != speaker:
                raise ValueError(f'{speaker} invalid speaker')

            if self.phoneLabelsDict is not None:
                self.phoneLabels += self.phoneLabelsDict[seq_name]
                new_size = (len(self.phoneLabelsDict[seq_name])
                            * self.phoneSize)
                seq = seq[:new_size]
            size_seq = seq.shape[0]
            tmp_data.append(seq)
            if signal_quality:
                tmp_quality.append(signal_quality[0])
            self.seqLabel.append(self.seqLabel[-1] + size_seq)
            speaker_size += size_seq

        self.speakerLabel.append(speaker_size)
        self.data = (np.concatenate(tmp_data, axis=0) if tmp_data
                     else np.zeros(0, np.float32))
        if tmp_quality:
            q = np.concatenate(tmp_quality, axis=0).astype(np.float32)
            q[:, 0] = (q[:, 0] - self.min_snr) / (self.max_snr - self.min_snr)
            q[:, 1] = (q[:, 1] - self.min_c50) / (self.max_c50 - self.min_c50)
            q = np.concatenate([q, q.mean(axis=1, keepdims=True)], axis=1)
            self.data_quality = q
        # Cached array form of the speaker prefix sums for the per-batch
        # searchsorted lookups (side='right' − 1 over the FULL boundary
        # list, final bound included).
        self._speaker_label_arr = np.asarray(self.speakerLabel)
        self._phone_label_arr = (np.asarray(self.phoneLabels, dtype=np.int64)
                                 if self.phoneLabels else None)

    # ------------------------------------------------------------------
    # Item / batch access
    # ------------------------------------------------------------------

    def getPhonem(self, idx: int):
        id_phone = idx // self.phoneSize
        return self.phoneLabels[id_phone:(id_phone + self.phoneStep)]

    def getSignalQuality(self, idx: int):
        i = idx // self.signal_quality_step
        est = self.data_quality[i:i + self.signal_quality_size]
        col = {'snr': 0, 'c50': 1, 'snr_c50': 2}.get(self.signal_quality_mode)
        if col is None:
            raise ValueError(
                "--signal_quality_mode should be in "
                "['snr', 'c50', 'snr_c50'].")
        return est[:, col]

    def getSpeakerLabel(self, idx: int) -> int:
        return int(np.searchsorted(self._speaker_label_arr, idx,
                                   side='right') - 1)

    def __len__(self):
        return self.totSize // self.sizeWindow

    def __getitem__(self, idx: int):
        if idx < 0 or idx >= len(self.data) - self.sizeWindow - 1:
            print(idx)
            print("upper bound %d" % (len(self.data) - self.sizeWindow - 1))

        out_data = self.data[idx:self.sizeWindow + idx].reshape(1, -1)
        label = np.int64(self.getSpeakerLabel(idx))
        if self.phoneSize > 0:
            label_phone = np.asarray(self.getPhonem(idx), dtype=np.int64)
            if not self.doubleLabels:
                label = label_phone
        else:
            label_phone = np.zeros(1, np.float32)

        if self.transform is not None:
            out_data = self.transform(out_data)

        x1, x2 = out_data, out_data
        if self.augment_past and self.augmentation:
            x1 = self.augmentation(x1)
        if (not self.past_equal_future and self.augment_future
                and self.augmentation):
            x2 = self.augmentation(x2)
        if self.past_equal_future:
            x2 = x1

        out_data = np.stack([x1, x2], axis=0)  # (2, 1, W)
        res = (out_data, label)
        if self.doubleLabels:
            res = res + (label_phone,)
        if self.signal_quality_path:
            res = res + (self.getSignalQuality(idx),)
        return res

    def get_batch(self, indices: Sequence[int]):
        """Vectorized batch gather: one fancy-index for the waveforms, then
        per-item augmentation. Returns the same tuple structure as iterating
        `__getitem__` + stacking."""
        idx = np.asarray(indices, dtype=np.int64)
        window = np.arange(self.sizeWindow, dtype=np.int64)
        wave = self.data[idx[:, None] + window[None, :]]   # (B, W)
        b = wave.shape[0]

        if self.phoneSize > 0:
            id_phone = idx // self.phoneSize
            steps = np.arange(self.phoneStep, dtype=np.int64)
            phone = self._phone_label_arr[id_phone[:, None] + steps[None, :]]
        speaker = (np.searchsorted(self._speaker_label_arr, idx,
                                   side='right') - 1).astype(np.int64)

        if self.phoneSize > 0 and not self.doubleLabels:
            label = phone
        else:
            label = speaker

        wave = wave[:, None, :]                            # (B, 1, W)
        if self.transform is not None:
            wave = np.stack([self.transform(wave[i]) for i in range(b)])

        x1, x2 = wave, wave
        if self.augment_past and self.augmentation:
            x1 = np.stack([self.augmentation(wave[i]) for i in range(b)])
        if (not self.past_equal_future and self.augment_future
                and self.augmentation):
            x2 = np.stack([self.augmentation(wave[i]) for i in range(b)])
        if self.past_equal_future:
            x2 = x1

        out = np.stack([x1, x2], axis=1)                   # (B, 2, 1, W)
        res = (out, label)
        if self.doubleLabels and self.phoneSize > 0:
            res = res + (phone,)
        if self.signal_quality_path:
            q = np.stack([self.getSignalQuality(int(i)) for i in idx])
            res = res + (q,)
        return res

    def get_batch_meta(self, indices):
        """Labels/quality for a batch of window offsets WITHOUT gathering
        the waveforms — the companion of `--corpus_on_device`, where the
        audio is resident on the accelerator (`parallel/mesh.DeviceCorpus`)
        and only the tiny per-window metadata crosses from the host. Tuple
        structure matches `get_batch(indices)[1:]`."""
        idx = np.asarray(indices, dtype=np.int64)
        if self.phoneSize > 0:
            id_phone = idx // self.phoneSize
            steps = np.arange(self.phoneStep, dtype=np.int64)
            phone = self._phone_label_arr[id_phone[:, None] + steps[None, :]]
        speaker = (np.searchsorted(self._speaker_label_arr, idx,
                                   side='right') - 1).astype(np.int64)
        if self.phoneSize > 0 and not self.doubleLabels:
            label = phone
        else:
            label = speaker
        res = (label,)
        if self.doubleLabels and self.phoneSize > 0:
            res = res + (phone,)
        if self.signal_quality_path:
            q = np.stack([self.getSignalQuality(int(i)) for i in idx])
            res = res + (q,)
        return res

    def gather_windows(self, indices):
        """Host-side clean-window gather: (B, 2, 1, W) float32 with the
        past/future views duplicated, NO transform/augmentation (used for
        the rare ragged-tail batches under `--corpus_on_device`, whose
        fixed-shape device gather programs only exist for the main batch
        size)."""
        if self.transform is not None or (
                self.augmentation is not None
                and (self.augment_past or self.augment_future)):
            raise ValueError("gather_windows is for clean (untransformed, "
                             "unaugmented-on-host) corpora only")
        idx = np.asarray(indices, dtype=np.int64)
        window = np.arange(self.sizeWindow, dtype=np.int64)
        wave = self.data[idx[:, None] + window[None, :]][:, None, :]
        return np.stack([wave, wave], axis=1).astype(np.float32)

    def getNSpeakers(self):
        return len(self.speakers)

    def getNSeqs(self):
        return len(self.seqLabel) - 1

    def getNLoadsPerEpoch(self):
        return len(self.packageIndex)

    def getBaseSampler(self, type: str, batchSize: int, offset: int,
                       batchSizePerGPU: Optional[int] = None):
        if type == "samespeaker":
            return SameSpeakerSampler(batchSize, self.speakerLabel,
                                      self.sizeWindow, offset)
        if type == "samesequence":
            return SameSpeakerSampler(batchSize, self.seqLabel,
                                      self.sizeWindow, offset)
        if type == "temporalsamespeaker":
            return TemporalSameSpeakerSampler(
                batchSize, self.speakerLabel, self.sizeWindow, offset,
                batch_size_per_gpu=batchSizePerGPU)
        if type == "sequential":
            return SequentialSampler(len(self.data), self.sizeWindow,
                                     offset, batchSize)
        if type == "uniform":
            sampler = UniformAudioSampler(len(self.data), self.sizeWindow,
                                          offset)
            return BatchSampler(sampler, batchSize, True)
        raise ValueError("--samplingType should belong to %s" %
                         ["samespeaker", "samesequence",
                          "temporalsamespeaker", "sequential", "uniform"])

    def getDataLoader(self, batchSize: int, type: str, randomOffset: bool,
                      numWorkers: int = 0, onLoop: int = -1, nLoops: int = -1,
                      remove_artefacts: bool = False,
                      batch_size_per_gpu: Optional[int] = None,
                      yield_indices: bool = False):
        """Iterator over batches for one epoch
        (reference `dataset.py:366-408`)."""
        tot_size = self.totSize // (self.sizeWindow * batchSize)
        if onLoop >= 0:
            self.currentPack = onLoop - 1
            self.loadNextPack()
            nLoops = 1 if nLoops <= 0 else nLoops
        elif nLoops <= 0:
            nLoops = len(self.packageIndex)

        def sampler_call():
            if randomOffset:
                if type == "temporalsamespeaker":
                    offset = random.randint(0, self.sizeWindow * batchSize)
                else:
                    offset = random.randint(0, self.sizeWindow // 2)
            else:
                offset = 0
            return self.getBaseSampler(type, batchSize, offset,
                                       batch_size_per_gpu)

        return AudioLoader(self, sampler_call, nLoops, self.loadNextPack,
                           tot_size, numWorkers, remove_artefacts,
                           yield_indices=yield_indices)


class AudioLoader:
    """Loops over packs, yielding vectorized batches
    (reference `dataset.py:440-600`)."""

    def __init__(self, dataset: AudioBatchData, samplerCall: Callable,
                 nLoop: int, updateCall: Callable, size: int,
                 numWorkers: int = 0, remove_artefacts: bool = False,
                 yield_indices: bool = False):
        self.samplerCall = samplerCall
        self.updateCall = updateCall
        self.nLoop = nLoop
        self.size = size
        self.dataset = dataset
        self.numWorkers = numWorkers
        self.remove_artefacts = remove_artefacts
        # yield (offsets, *labels) instead of gathered waveforms —
        # `--corpus_on_device` keeps the audio resident on the accelerator
        self.yield_indices = yield_indices

    def __len__(self):
        return self.size

    def _remove_artefacts(self, sampler):
        """Shift/drop windows straddling recording boundaries
        (reference `dataset.py:486-526`)."""
        seq_labels = self.dataset.seqLabel
        window_size = self.dataset.sizeWindow
        new_batches = []
        for batch in sampler.batches:
            new_batch = []
            offset = 0
            delete_batch = False
            for beg_seq in batch:
                beg_seq += offset
                # Reference parity (bug-for-bug): the flag resets per
                # sequence, so only the LAST sequence's out-of-bounds
                # status decides whether the whole batch is deleted —
                # earlier offending windows are just dropped from
                # new_batch (reference `dataset.py:506-523`).
                delete_batch = False
                for i in range(1, len(seq_labels)):
                    if seq_labels[i - 1] <= beg_seq < seq_labels[i]:
                        if beg_seq + window_size > seq_labels[i]:
                            if i != len(seq_labels) - 1:
                                new_batch.append(seq_labels[i])
                            else:
                                print("warning, deleting batch because "
                                      "artifact cannot be removed without "
                                      "going out of bounds")
                                delete_batch = True
                            if isinstance(sampler,
                                          TemporalSameSpeakerSampler):
                                offset += seq_labels[i] - beg_seq
                        else:
                            new_batch.append(beg_seq)
            if not delete_batch:
                new_batches.append(new_batch)
        sampler.batches = new_batches
        return sampler

    def _iter_pack(self):
        sampler = self.samplerCall()
        if self.remove_artefacts:
            sampler = self._remove_artefacts(sampler)
        for batch_idx in sampler:
            if len(batch_idx) == 0:
                continue
            if self.yield_indices:
                yield ((np.asarray(batch_idx, dtype=np.int64),)
                       + self.dataset.get_batch_meta(batch_idx))
            else:
                yield self.dataset.get_batch(batch_idx)

    def __iter__(self):
        for i in range(self.nLoop):
            for x in self._iter_pack():
                yield x
            if i < self.nLoop - 1:
                self.updateCall()


# ---------------------------------------------------------------------------
# Debug helpers (reference `dataset.py:537-600`)
# ---------------------------------------------------------------------------

def _find_audio_name(seq_labels, seq_names, beg_seq, window_size):
    for i in range(1, len(seq_labels)):
        if seq_labels[i - 1] <= beg_seq < seq_labels[i]:
            artefact_created = beg_seq + window_size > seq_labels[i]
            return seq_names[i - 1], artefact_created
    raise ValueError("I got beg_seq = %s but my seqLabels is %s"
                     % (beg_seq, seq_labels))


def iter_verbose(loader: AudioLoader):
    """Debug iterator (reference `dataset.py:583-600`): yields
    (batch, sequence_names, has_artefact_flags) and raises on overlapping
    temporal windows — the framework's 'race detector' for the sampler
    logic."""
    ds = loader.dataset
    for loop in range(loader.nLoop):
        sampler = loader.samplerCall()
        if loader.remove_artefacts:
            sampler = loader._remove_artefacts(sampler)
        seq_labels = ds.seqLabel
        seq_names = ds.getSeqNames()
        window = ds.sizeWindow
        batches = getattr(sampler, 'batches', None)
        if batches is None:
            batches = list(iter(sampler))
        for batch_idx in batches:
            if len(batch_idx) == 0:
                continue
            names, artefacts = [], []
            prev = -window
            for beg_seq in batch_idx:
                if prev + window > beg_seq and isinstance(
                        sampler, TemporalSameSpeakerSampler):
                    raise ValueError(
                        "Overlap detected [%d,%d] with [%d,%d]"
                        % (prev, prev + window, beg_seq, beg_seq + window))
                name, created = _find_audio_name(seq_labels, seq_names,
                                                 beg_seq, window)
                names.append(name)
                artefacts.append(created)
                prev = beg_seq
            yield ds.get_batch(batch_idx), names, artefacts
        if loop < loader.nLoop - 1:
            loader.updateCall()
