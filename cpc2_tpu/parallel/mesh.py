"""Device mesh and sharding helpers.

The reference's two parallelism strategies (single-node DataParallel,
multi-node NCCL DDP — `cpc/train.py:523-532`, `distributed_mode.py`) both
reduce to data parallelism. Here that is ONE program: a `shard_map` over a
1-D `('data',)` mesh — per-device batches, replicated params, gradient
`psum` compiled by XLA onto ICI. Across slices the mesh grows to an
explicit 2-level ('dcn_data', 'ici_data') layout
(`make_mesh(dcn_axis_size=...)`, `--dcn_axis_size`) without touching the
step function: steps address `data_axes(mesh)`, which names either the
flat axis or the pair (tests/test_dcn_mesh.py pins trajectory equality
between the two).

Per-shard InfoNCE negative sampling falls out of shard_map for free and
matches the reference's per-GPU negative pool semantics
(`criterion.py:247-267` under DDP).
"""

from __future__ import annotations

import functools as _functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    _shard_map = _functools.partial(jax.shard_map, check_vma=False)
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map as _sm
    _shard_map = _functools.partial(_sm, check_rep=False)


def make_mesh(data_axis_size: int = -1, devices=None,
              dcn_axis_size: int = 0) -> Mesh:
    """Data-parallel mesh. data_axis_size == -1 uses all devices.

    dcn_axis_size <= 1 (default): a flat 1-D ('data',) mesh. On
    multi-slice pods, devices are ordered slice-major so the gradient
    psum's reduction tree keeps intra-slice hops on ICI and crosses DCN
    once per slice (the multi-slice analogue of the reference's NCCL ring,
    `/root/reference/cpc/distributed_training/distributed_mode.py:138-142`).

    dcn_axis_size > 1: an explicit 2-level ('dcn_data', 'ici_data') mesh —
    the outer axis spans slices (DCN links), the inner axis the chips of
    one slice (ICI links). The train step is UNCHANGED: its collectives
    and batch specs address `data_axes(mesh)`, which resolves to the axis
    pair here, so XLA lowers the gradient pmean to an ICI
    reduce-scatter/all-gather within each slice plus one DCN cross-slice
    reduction — the hierarchy is expressed in the mesh, not the program.
    `dcn_axis_size` must divide the device count (slice count on real
    pods; simulated freely on a virtual CPU mesh)."""
    devices = list(devices if devices is not None else jax.devices())
    if len({getattr(d, 'slice_index', 0) for d in devices}) > 1:
        devices.sort(key=lambda d: (getattr(d, 'slice_index', 0), d.id))
    if data_axis_size > 0:
        devices = devices[:data_axis_size]
    if dcn_axis_size and dcn_axis_size > 1:
        if len(devices) % dcn_axis_size:
            raise ValueError(
                f"dcn_axis_size={dcn_axis_size} does not divide the "
                f"{len(devices)}-device data mesh")
        return Mesh(
            np.asarray(devices).reshape(dcn_axis_size, -1),
            ('dcn_data', 'ici_data'))
    return Mesh(np.asarray(devices), ('data',))


def data_axes(mesh: Mesh):
    """The data-parallel axis name(s) of `mesh`: 'data' on the flat mesh,
    ('dcn_data', 'ici_data') on the 2-level multi-slice mesh. Valid
    anywhere an axis name is accepted — PartitionSpec entries,
    `lax.pmean`/`psum`, `lax.axis_index` — so step functions written
    against `data_axes(mesh)` run unchanged on either mesh."""
    return (('dcn_data', 'ici_data') if 'dcn_data' in mesh.axis_names
            else 'data')


def batch_pspec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec sharding axis 0 over the mesh's data axes."""
    return P(data_axes(mesh), *([None] * (ndim - 1)))


def data_extent(mesh: Mesh) -> int:
    """Total device count across the mesh's data axes (the batch-axis
    divisor, whatever the mesh level count)."""
    if 'dcn_data' in mesh.axis_names:
        return mesh.shape['dcn_data'] * mesh.shape['ici_data']
    return mesh.shape.get('data', mesh.devices.size)


def make_mesh_2d(data_axis_size: int, model_axis_size: int,
                 devices=None) -> Mesh:
    """('data','model') mesh for head-sharded model parallelism
    (`training.build_steps_2d`). Devices are laid out model-axis-minor so
    the head all_gather/psum collectives ride neighbouring ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = data_axis_size * model_axis_size
    if len(devices) < n:
        raise ValueError(f"mesh ({data_axis_size}x{model_axis_size}) needs "
                         f"{n} devices, found {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(data_axis_size,
                                                model_axis_size),
                ('data', 'model'))


def local_batch_size(batch_size_per_device: int, mesh: Mesh) -> int:
    return batch_size_per_device * data_extent(mesh)


def shard_batch(mesh: Mesh, *arrays):
    """Assemble host batches into global arrays sharded over axis 0.

    Single-process: a plain `device_put`. Multi-host (process_count > 1):
    each process holds only its per-host slice of the global batch (fed by
    per-host file sharding, `train.py`), and the global array is assembled
    with `jax.make_array_from_process_local_data` — the TPU-pod analogue of
    the reference's per-rank DataLoader shards
    (`cpc/train.py:387-401`). Per-host batch shapes must match across
    processes (the framework keeps batch shapes static by design).
    """
    n_proc = jax.process_count()
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        sharding = NamedSharding(mesh, batch_pspec(mesh, np.ndim(a)))
        if n_proc > 1:
            a = np.asarray(a)
            global_shape = (a.shape[0] * n_proc,) + a.shape[1:]
            out.append(jax.make_array_from_process_local_data(
                sharding, a, global_shape))
        else:
            out.append(jax.device_put(a, sharding))
    return out if len(out) != 1 else out[0]


def pcm16_wire(arr):
    """Shared losslessness invariant behind the int16 wire format.

    If every value of `arr` (float32) sits exactly on the PCM16 grid
    (value * 32768 is an integer in [-32768, 32767]), return the int16
    wire array and True; otherwise return `arr` unchanged and False.
    One rint pass + one compare. Both `WireStager.to_wire` (per-batch
    host->device staging) and `DeviceCorpus.ensure` (pack-resident
    staging) call this — they must agree for the staged values to be
    bit-identical in every mode."""
    scaled = arr * 32768.0
    rounded = np.rint(scaled)
    if (np.array_equal(rounded, scaled)
            and float(rounded.min(initial=0.0)) >= -32768.0
            and float(rounded.max(initial=0.0)) <= 32767.0):
        return rounded.astype(np.int16), True
    return arr, False


class WireStager:
    """Minimizes host->device bytes for the (B, 2, 1, W) audio batch.

    Two lossless reductions, chosen per batch from the data itself:

    * **view dedup** — without asymmetric augmentation the past and future
      views are byte-identical (`dataset.py` stacks the same window), so
      one copy crosses the wire and the device duplicates it;
    * **int16 wire** — unaugmented audio sits exactly on the PCM16 grid
      (`x * 32768` integral), so the wire carries int16 and the device
      rescales to float32, bit-exactly.

    On a remote/tunneled accelerator the per-step upload is the real-data
    training bottleneck (measured ~31 ms for the 1.3 MB float batch vs
    9.8 ms compute on the chip); the combined reductions cut it 4x. On
    co-located hosts (PCIe) the gain is noise but the path is harmless.
    Batches that fail either invariant (augmented audio, off-grid values)
    fall back automatically — staged values are identical in every mode.
    """

    def __init__(self, mesh: Mesh):
        self._mesh = mesh
        self._restore = {}

    @staticmethod
    def to_wire(sequence):
        """Host side: pick the cheapest lossless wire format.

        Returns (wire_array, mode). Cheap (one memcmp + one rint pass);
        safe to run on a prefetch thread."""
        seq = np.asarray(sequence, np.float32)
        dedup = np.array_equal(seq[:, 0], seq[:, 1])
        if dedup:
            seq = seq[:, :1]
        wire, i16 = pcm16_wire(seq)
        if i16:
            return wire, ('i16d' if dedup else 'i16')
        return seq, ('f32d' if dedup else 'f32')

    def _restore_fn(self, mode):
        if mode not in self._restore:
            import jax.numpy as jnp
            out_sharding = NamedSharding(self._mesh,
                                         batch_pspec(self._mesh, 4))

            def restore(x):
                if mode.startswith('i16'):
                    x = x.astype(jnp.float32) / 32768.0
                if mode.endswith('d'):
                    x = jnp.concatenate([x, x], axis=1)
                return x
            self._restore[mode] = jax.jit(restore,
                                          out_shardings=out_sharding)
        return self._restore[mode]

    def put(self, sequence):
        """Stage a host (B, 2, 1, W) batch onto the mesh as float32."""
        wire_arr, mode = self.to_wire(sequence)
        staged = shard_batch(self._mesh, wire_arr)
        if mode == 'f32':
            return staged
        return self._restore_fn(mode)(staged)


def device_gather_windows(corpus, indices, size_window: int):
    """Gather a (B, 2, 1, W) float32 batch from a device-resident flat
    waveform at per-window `indices` — the device-side half of the
    `DeviceCorpus` wire format (int16 packs rescale bit-exactly; past and
    future views duplicate like `WireStager`'s dedup mode). Pure jnp: also
    usable INSIDE a larger program (the multi-step scan body)."""
    import jax.numpy as jnp
    win = jax.vmap(
        lambda i: jax.lax.dynamic_slice(corpus, (i,), (size_window,))
    )(indices)
    if corpus.dtype == jnp.int16:
        win = win.astype(jnp.float32) / 32768.0
    x = win[:, None, None, :]
    return jnp.concatenate([x, x], axis=1)


class DeviceCorpus:
    """Device-resident corpus (`--corpus_on_device`): each data pack's flat
    waveform uploads to HBM ONCE; per-step host->device traffic becomes a
    (B,) int32 window-offset vector (~32 bytes) instead of the (B, 2, 1, W)
    audio batch (~330 KB as PCM16 at the recipe batch).

    A tiny jitted program gathers the batch on device: a vmapped
    `dynamic_slice` over the replicated corpus, then the same int16->f32
    rescale + past/future view duplication the `WireStager` wire format
    performs — the staged batch is bit-identical to the host path's, so
    training trajectories match exactly (`tests/test_corpus_on_device.py`).

    When to use: remote/tunneled accelerators, where the per-step upload is
    the real-data bottleneck (the reference's equivalent data movement is
    the per-batch `.cuda()` copy, `cpc/train.py:89`). The pack must fit in
    HBM next to the model state (PCM-grid audio uploads as int16: half the
    f32 pack bytes; `--max_size_loaded` controls pack size). Pack switches
    re-upload, so single-pack corpora (< MAX_SIZE_LOADED) benefit most.
    The trainer keeps one DeviceCorpus per split, so budget HBM for the
    train pack AND the val pack together — both stay resident across
    epochs (the val pack is typically the 5% split, but a separate
    --pathVal corpus can be arbitrarily large; lower --max_size_loaded if
    the pair doesn't fit).

    Host-side preparation (`ensure`) costs one rint/compare pass over the
    pack to prove the int16 wire lossless; it runs once per pack, not per
    step.
    """

    def __init__(self, mesh: Mesh, size_window: int):
        self._mesh = mesh
        self._w = int(size_window)
        self._host_data = None
        self._corpus = None
        self._i16 = False
        self._gather = {}
        self._pod_plan = None

    def plan_pod(self, max_pack_samples: int, first_pack_i16: bool) -> None:
        """Multi-process setup — ONE collective, before the first ensure().

        Each host uploads its OWN pack shard (per-rank file sharding means
        packs differ across hosts), so the global corpus is a
        (n_devices, cap) array sharded row-per-device over the data axis:
        device i holds its host's pack, and the sharded gather program
        reads only the local row — per-host sampling and per-shard
        negatives already match this layout. The pod must agree ONCE on
        (a) `cap`, the slab length every pack pads to (pod max of the
        scan-derived largest pack), and (b) the wire dtype (int16 iff
        every host's first pack sits on the PCM16 grid) — per-pack
        collectives are impossible because hosts cross pack boundaries at
        different steps. Later packs that break the agreed int16 wire
        raise instead of silently quantizing."""
        from jax.experimental import multihost_utils
        agreed = multihost_utils.process_allgather(
            np.asarray([max_pack_samples, 1 if first_pack_i16 else 0],
                       np.int64))
        agreed = agreed.reshape(-1, 2)
        self._pod_plan = (int(agreed[:, 0].max()),
                          bool(agreed[:, 1].min()))

    def ensure(self, data) -> None:
        """Upload `data` (the pack's flat 1-D waveform) if not resident.

        Residency is keyed on an `is` check against a STRONG reference to
        the cached pack: holding the array itself (not its `id()`) is what
        makes the check sound — after a pack swap frees the old array, a
        new pack allocated at the recycled address would otherwise be
        mistaken for the resident one and training would silently gather
        stale audio."""
        if data is self._host_data:
            return
        arr = np.asarray(data, np.float32)
        if arr.size >= 2 ** 31:
            raise ValueError(
                "--corpus_on_device indexes packs with int32 offsets; "
                f"pack has {arr.size} samples (>= 2**31). Lower "
                "--max_size_loaded.")
        if jax.process_count() > 1:
            self._ensure_pod(data, arr)
            return
        wire, self._i16 = pcm16_wire(arr)
        self._corpus = jax.device_put(wire, NamedSharding(self._mesh, P()))
        self._host_data = data

    def _ensure_pod(self, data, arr: np.ndarray) -> None:
        """Multi-process upload: this host's pack into its devices' rows of
        the pod-uniform (n_devices, cap) slab. Pure-local work (device_puts
        + metadata assembly) — hosts hit pack boundaries at different
        steps, so nothing here may be collective."""
        if self._pod_plan is None:
            raise RuntimeError(
                "multi-process DeviceCorpus.ensure() before plan_pod()")
        cap, use_i16 = self._pod_plan
        if arr.size > cap:
            raise ValueError(
                f"pack has {arr.size} samples but the pod agreed on a "
                f"{cap}-sample slab — the scan lengths and the decoded "
                f"pack disagree")
        if use_i16:
            wire, ok = pcm16_wire(arr)
            if not ok:
                raise ValueError(
                    "the pod agreed on the int16 corpus wire (every "
                    "host's first pack sat on the PCM16 grid) but a "
                    "later pack does not — mixed-precision corpora "
                    "cannot use --corpus_on_device multi-process")
            self._i16 = True
        else:
            wire, self._i16 = arr, False
        if wire.shape[0] < cap:
            wire = np.concatenate(
                [wire, np.zeros(cap - wire.shape[0], wire.dtype)])
        sharding = NamedSharding(self._mesh,
                                 P(data_axes(self._mesh), None))
        shape = (self._mesh.devices.size, cap)
        idx_map = sharding.addressable_devices_indices_map(shape)
        row = wire[None]
        arrays = [jax.device_put(row, d) for d in idx_map]
        self._corpus = jax.make_array_from_single_device_arrays(
            shape, sharding, arrays)
        self._host_data = data

    @property
    def resident(self):
        """The device-resident pack array (None before the first ensure).
        Callers that buffer work across pack swaps hold this reference so
        in-flight offsets keep addressing the pack they were drawn from."""
        return self._corpus

    def put(self, indices, corpus=None):
        """Stage the batch at `indices` as a (B, 2, 1, W) float32 global
        array sharded over the 'data' axis (same layout `WireStager.put`
        returns). `corpus` overrides the resident pack (used to drain
        offsets buffered before a pack swap). `indices` is this process's
        LOCAL batch of window starts into its own pack; multi-process,
        each device's shard of the gather program reads its own corpus
        row."""
        corpus = corpus if corpus is not None else self._corpus
        if corpus is None:
            raise RuntimeError("DeviceCorpus.put before ensure()")
        idx = np.asarray(indices, dtype=np.int32)
        key = (idx.shape[0], str(corpus.dtype), corpus.ndim)
        if key not in self._gather:
            w = self._w
            out_sharding = NamedSharding(self._mesh,
                                         batch_pspec(self._mesh, 4))
            if corpus.ndim == 2:
                DATA = data_axes(self._mesh)

                def body(c_row, ii):
                    return device_gather_windows(c_row[0], ii, w)
                self._gather[key] = jax.jit(_shard_map(
                    body, mesh=self._mesh,
                    in_specs=(P(DATA, None), P(DATA)),
                    out_specs=batch_pspec(self._mesh, 4)))
            else:
                self._gather[key] = jax.jit(
                    lambda c, ii: device_gather_windows(c, ii, w),
                    out_shardings=out_sharding)
        return self._gather[key](corpus, shard_batch(self._mesh, idx))


def eval_mesh(devices=None) -> Mesh:
    """1-D data mesh over this process's local devices for evaluation
    workloads.

    The reference DataParallel-izes its eval stack — k-means accumulation
    (`cpc/clustering/clustering.py:132-134`), the separability probe's
    feature maker and criterion (`cpc/eval/linear_separability.py:203,223`),
    the CTC eval model (`cpc/eval/common_voices_eval.py:542,549`). The TPU
    analogue is batch-sharded jit programs over this mesh: inputs committed
    with `batch_pspec` shardings, params replicated, and XLA's SPMD
    partitioner inserts the cross-device reductions. Eval CLIs are
    single-process, so the mesh spans `jax.local_devices()` only."""
    if devices is None:
        devices = jax.local_devices()
    return make_mesh(devices=devices)


def pad_rows(*arrays, multiple: int):
    """Pad axis 0 of each array up to a multiple of `multiple` (zero rows)
    and return `(*padded, weights)` where weights is (N_padded,) float32
    with 1.0 on real rows, 0.0 on pad rows. With `multiple` == 1 or an
    already-divisible axis the arrays pass through unchanged (weights all
    ones). Weighted reductions over the padded batch are exactly the
    unpadded reductions — the device-count-invariance workhorse for eval
    sharding (pad rows may be *assigned* — to a cluster, a class — but
    contribute nothing)."""
    n = arrays[0].shape[0]
    n_pad = (-n) % max(multiple, 1)
    w = np.ones((n + n_pad,), np.float32)
    if n_pad == 0:
        return (*arrays, w)
    w[n:] = 0.0
    out = []
    for a in arrays:
        a = np.asarray(a)
        pad_widths = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(np.pad(a, pad_widths))
    return (*out, w)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-host, every process holds the full (identical, same-seed) value,
    so the replicated global array is exactly "process-local data == global
    data"."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)
