"""ABX triplet construction (reference `cpc/eval/ABX/abx_iterators.py`).

Host-side: .item parsing, time->frame mapping, nested
context->speaker->phone grouping, and the within/across triplet iterators.
Feature slices live in one flat numpy matrix; groups are materialized as
padded (N, S_max, D) blocks for the batched device-side DTW.
"""

from __future__ import annotations

import math
import random
from typing import Callable, Dict, List

import numpy as np


def normalize_with_singularity(x: np.ndarray) -> np.ndarray:
    """Normalize across channels; extend by one dim so the null vector sits
    at maximal cosine distance from any non-null vector
    (reference `abx_iterators.py:11-41`).

    NOTE: the reference's 3-D branch adds 1e-12 to the norm *before* testing
    `norm_x == 0`, so its zero-vector handling never triggers — which
    contradicts the reference's own unit-test expectations
    (`ABX/unit_tests.py:58-82`). We implement the intended behaviour (zero
    detection on the raw norm), which reproduces those expectations."""
    x = np.array(x, dtype=np.float32, copy=True)
    if x.ndim == 3:
        n, s, h = x.shape
        raw_norm = (x ** 2).sum(axis=2, keepdims=True)
        zero_vals = (raw_norm == 0).reshape(n, s)
        x /= np.sqrt(raw_norm + 1e-12)
        x[zero_vals] = 1 / math.sqrt(h)
        border = np.zeros((n, s, 1), dtype=x.dtype) + 1e-12
        border[zero_vals] = -2 * 1e12
        return np.concatenate([x, border], axis=2)
    s, h = x.shape
    raw_norm = (x ** 2).sum(axis=1, keepdims=True)
    zero_vals = (raw_norm == 0).reshape(s)
    x /= np.sqrt(raw_norm + 1e-12)
    x[zero_vals] = 1 / math.sqrt(h)
    border = np.zeros((s, 1), dtype=x.dtype) + 1e-12
    border[zero_vals] = -2 * 1e12
    return np.concatenate([x, border], axis=1)


def load_item_file(path_item_file):
    """Parse a .item triplet file (reference `abx_iterators.py:44-92`).
    Line format: `#file_ID onset offset #phone prev-phone next-phone
    speaker`."""
    with open(path_item_file, 'r') as f:
        data = f.readlines()[1:]
    data = [x.replace('\n', '') for x in data]

    out: Dict[str, List] = {}
    phone_match: Dict[str, int] = {}
    speaker_match: Dict[str, int] = {}
    context_match: Dict[str, int] = {}

    for line in data:
        items = line.split()
        assert len(items) == 7
        file_id = items[0]
        if file_id not in out:
            out[file_id] = []
        onset, offset = float(items[1]), float(items[2])
        context = '+'.join([items[4], items[5]])
        phone = items[3]
        speaker = items[6]
        if phone not in phone_match:
            phone_match[phone] = len(phone_match)
        phone_id = phone_match[phone]
        if context not in context_match:
            context_match[context] = len(context_match)
        context_id = context_match[context]
        if speaker not in speaker_match:
            speaker_match[speaker] = len(speaker_match)
        speaker_id = speaker_match[speaker]
        out[file_id].append([onset, offset, context_id, phone_id, speaker_id])

    return out, context_match, phone_match, speaker_match


def get_features_group(in_data, index_order):
    """Nested grouping by the given key order
    (reference `abx_iterators.py:95-126`)."""
    in_index = list(range(len(in_data)))
    in_index.sort(key=lambda x: [in_data[x][i] for i in index_order])
    out_groups = []
    last_values = [in_data[in_index[0]][i] for i in index_order]
    i_s = 0
    curr_group = [[] for _ in index_order]
    n_orders = len(index_order) - 1
    tmp = [in_data[i] for i in in_index]

    for index, item in enumerate(tmp):
        for order_index, order in enumerate(index_order):
            if item[order] != last_values[order_index]:
                curr_group[-1].append((i_s, index))
                for i in range(n_orders, order_index, -1):
                    curr_group[i - 1].append(curr_group[i])
                    curr_group[i] = []
                if order_index == 0:
                    out_groups += curr_group[0]
                    curr_group[0] = []
                last_values = [item[i] for i in index_order]
                i_s = index
                break

    if i_s < len(in_data):
        curr_group[-1].append((i_s, len(in_data)))
        for i in range(n_orders, 0, -1):
            curr_group[i - 1].append(curr_group[i])
        out_groups += curr_group[0]

    return in_index, out_groups


class ABXFeatureLoader:
    """Extract per-phone-interval feature slices
    (reference `abx_iterators.py:129-261`)."""

    def __init__(self, path_item_file, seqList, featureMaker: Callable,
                 stepFeature: float, normalize: bool):
        files_data, self.context_match, self.phone_match, \
            self.speaker_match = load_item_file(path_item_file)
        self.seqNorm = True
        self.stepFeature = stepFeature
        self.loadFromFileData(files_data, seqList, featureMaker, normalize)

    def loadFromFileData(self, files_data, seqList, feature_maker, normalize):
        # features[i]: [index_start, size, context_id, phone_id, speaker_id]
        self.features = []
        self.INDEX_CONTEXT = 2
        self.INDEX_PHONE = 3
        self.INDEX_SPEAKER = 4
        data = []
        tot_size = 0

        print("Building the input features...")
        for index, vals in enumerate(seqList):
            file_id, file_path = vals
            if file_id not in files_data:
                continue
            features = np.asarray(feature_maker(file_path))
            if normalize:
                features = normalize_with_singularity(features)
            if features.ndim > 2:
                features = features.reshape(features.shape[1],
                                            features.shape[2])
            phone_data = files_data[file_id]
            for phone_start, phone_end, context_id, phone_id, speaker_id \
                    in phone_data:
                index_start = max(
                    0, int(math.ceil(self.stepFeature * phone_start - 0.5)))
                index_end = min(
                    features.shape[0],
                    int(math.floor(self.stepFeature * phone_end - 0.5)))
                if index_start >= features.shape[0] \
                        or index_end <= index_start:
                    continue
                loc_size = index_end - index_start
                self.features.append([tot_size, loc_size, context_id,
                                      phone_id, speaker_id])
                data.append(features[index_start:index_end])
                tot_size += loc_size
        print("...done")

        self.data = np.concatenate(data, axis=0).astype(np.float32)
        self.feature_dim = self.data.shape[1]

    def get_max_group_size(self, i_group, i_sub_group):
        id_start, id_end = self.group_index[i_group][i_sub_group]
        return max(self.features[i][1] for i in range(id_start, id_end))

    def get_ids(self, index):
        context_id, phone_id, speaker_id = self.features[index][2:]
        return context_id, phone_id, speaker_id

    def __getitem__(self, index):
        i_data, out_size, context_id, phone_id, speaker_id = \
            self.features[index]
        return (self.data[i_data:i_data + out_size], out_size,
                (context_id, phone_id, speaker_id))

    def __len__(self):
        return len(self.features)

    def get_n_speakers(self):
        return len(self.speaker_match)

    def get_n_context(self):
        return len(self.context_match)

    def get_n_phone(self):
        return len(self.phone_match)

    def get_iterator(self, mode, max_size_group, max_x_across=5):
        if mode == 'within':
            return ABXWithinGroupIterator(self, max_size_group)
        if mode == 'across':
            return ABXAcrossGroupIterator(self, max_size_group, max_x_across)
        raise ValueError(f"Invalid mode: {mode}")


class ABXIterator:
    """Base class building ABX triplets
    (reference `abx_iterators.py:264-312`)."""

    def __init__(self, abxDataset, max_size_group):
        self.max_size_group = max_size_group
        self.dataset = abxDataset
        self.len = 0
        self.index_csp, self.groups_csp = get_features_group(
            abxDataset.features,
            [abxDataset.INDEX_CONTEXT, abxDataset.INDEX_SPEAKER,
             abxDataset.INDEX_PHONE])

    def get_group(self, i_start, i_end):
        data = []
        max_size = 0
        to_take = list(range(i_start, i_end))
        if i_end - i_start > self.max_size_group:
            to_take = random.sample(to_take, k=self.max_size_group)
        loc_id = None
        for i in to_take:
            loc_data, loc_size, loc_id = self.dataset[self.index_csp[i]]
            max_size = max(loc_size, max_size)
            data.append(loc_data)

        n = len(to_take)
        out_data = np.zeros((n, max_size, self.dataset.feature_dim),
                            dtype=np.float32)
        out_size = np.zeros(n, dtype=np.int64)
        for i in range(n):
            size = data[i].shape[0]
            out_data[i, :size] = data[i]
            out_size[i] = size
        return out_data, out_size, loc_id

    def __len__(self):
        return self.len

    def get_board_size(self):
        pass


class ABXWithinGroupIterator(ABXIterator):
    """Within-speaker triplets (reference `abx_iterators.py:315-364`)."""

    def __init__(self, abxDataset, max_size_group):
        super().__init__(abxDataset, max_size_group)
        self.symmetric = True
        for context_group in self.groups_csp:
            for speaker_group in context_group:
                if len(speaker_group) > 1:
                    for i_start, i_end in speaker_group:
                        if i_end - i_start > 1:
                            self.len += len(speaker_group) - 1

    def __iter__(self):
        for i_c, context_group in enumerate(self.groups_csp):
            for i_s, speaker_group in enumerate(context_group):
                n_phones = len(speaker_group)
                if n_phones == 1:
                    continue
                for i_a in range(n_phones):
                    i_start_a, i_end_a = self.groups_csp[i_c][i_s][i_a]
                    if i_end_a - i_start_a == 1:
                        continue
                    for i_b in range(n_phones):
                        if i_b == i_a:
                            continue
                        i_start_b, i_end_b = self.groups_csp[i_c][i_s][i_b]
                        data_b, size_b, id_b = self.get_group(i_start_b,
                                                              i_end_b)
                        data_a, size_a, id_a = self.get_group(i_start_a,
                                                              i_end_a)
                        out_coords = id_a[2], id_a[1], id_b[1], id_a[0]
                        yield out_coords, (data_a, size_a), \
                            (data_b, size_b), (data_a, size_a)

    def get_board_size(self):
        return (self.dataset.get_n_speakers(), self.dataset.get_n_phone(),
                self.dataset.get_n_phone(), self.dataset.get_n_context())


class ABXAcrossGroupIterator(ABXIterator):
    """Across-speaker triplets (reference `abx_iterators.py:367-448`)."""

    def __init__(self, abxDataset, max_size_group, max_x_across):
        super().__init__(abxDataset, max_size_group)
        self.symmetric = False
        self.get_speakers_from_cp = {}
        self.max_x = max_x_across

        for context_group in self.groups_csp:
            for speaker_group in context_group:
                for i_start, i_end in speaker_group:
                    c_id, p_id, s_id = self.dataset.get_ids(
                        self.index_csp[i_start])
                    self.get_speakers_from_cp.setdefault(c_id, {}) \
                        .setdefault(p_id, {})[s_id] = (i_start, i_end)

        for context_group in self.groups_csp:
            for speaker_group in context_group:
                if len(speaker_group) > 1:
                    for i_start, i_end in speaker_group:
                        c_id, p_id, s_id = self.dataset.get_ids(
                            self.index_csp[i_start])
                        self.len += (len(speaker_group) - 1) * (
                            min(self.max_x,
                                len(self.get_speakers_from_cp[c_id][p_id])
                                - 1))

    def get_other_speakers_in_group(self, i_start_group):
        c_id, p_id, s_id = self.dataset.get_ids(
            self.index_csp[i_start_group])
        return [v for k, v in self.get_speakers_from_cp[c_id][p_id].items()
                if k != s_id]

    def get_abx_triplet(self, i_a, i_b, i_x):
        i_start_a, i_end_a = i_a
        data_a, size_a, id_a = self.get_group(i_start_a, i_end_a)
        i_start_b, i_end_b = i_b
        data_b, size_b, id_b = self.get_group(i_start_b, i_end_b)
        i_start_x, i_end_x = i_x
        data_x, size_x, id_x = self.get_group(i_start_x, i_end_x)
        out_coords = id_a[2], id_a[1], id_b[1], id_a[0], id_x[2]
        return out_coords, (data_a, size_a), (data_b, size_b), \
            (data_x, size_x)

    def __iter__(self):
        for i_c, context_group in enumerate(self.groups_csp):
            for i_s, speaker_group in enumerate(context_group):
                n_phones = len(speaker_group)
                if n_phones == 1:
                    continue
                for i_a in range(n_phones):
                    i_start_a, i_end_a = self.groups_csp[i_c][i_s][i_a]
                    ref = self.get_other_speakers_in_group(i_start_a)
                    if len(ref) > self.max_x:
                        speakers_a = random.sample(ref, k=self.max_x)
                    else:
                        speakers_a = ref
                    for i_start_x, i_end_x in speakers_a:
                        for i_b in range(n_phones):
                            if i_b == i_a:
                                continue
                            i_start_b, i_end_b = \
                                self.groups_csp[i_c][i_s][i_b]
                            yield self.get_abx_triplet(
                                (i_start_a, i_end_a), (i_start_b, i_end_b),
                                (i_start_x, i_end_x))

    def get_board_size(self):
        return (self.dataset.get_n_speakers(), self.dataset.get_n_phone(),
                self.dataset.get_n_phone(), self.dataset.get_n_context(),
                self.dataset.get_n_speakers())
