"""Per-group ABX score computation
(reference `cpc/eval/ABX/abx_group_computation.py`).

TPU-first: the pairwise frame distance matrix is one batched matmul on the
MXU (cosine: `a1 @ a2ᵀ` on pre-normalized features), and the DTW DP runs as
the batched wavefront scan in `ops/dtw.py` — no per-pair host loop, no
device<->host round-trip between distances and DTW.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.dtw import dtw_normalized_auto as dtw_normalized, _bucket


def get_distance_function_from_name(name_str: str):
    if name_str == 'euclidian':
        return get_euclidian_distance_batch
    if name_str == 'cosine':
        return get_cosine_distance_batch
    raise ValueError("Invalid distance mode")


def check_dtw_group_validity(a, b, x):
    assert a.ndim == b.ndim == x.ndim
    assert a.shape[2] == x.shape[2] == b.shape[2]


@jax.jit
def _cosine_dist(a1, a2):
    prod = jnp.einsum('xsd,ytd->xyst', a1, a2,
                      preferred_element_type=jnp.float32)
    return jnp.arccos(jnp.clip(prod, -1.0, 1.0)) / math.pi


def get_cosine_distance_batch(a1, a2, epsilon=1e-8):
    """a1 (N1,S1,D), a2 (N2,S2,D) pre-normalized -> (N1,N2,S1,S2) angular
    distance (reference `abx_group_computation.py:26-35`)."""
    return _cosine_dist(jnp.asarray(a1), jnp.asarray(a2))


@jax.jit
def _euclid_dist(a1, a2):
    n1 = jnp.sum(jnp.square(a1), axis=2)                 # (N1,S1)
    n2 = jnp.sum(jnp.square(a2), axis=2)                 # (N2,S2)
    cross = jnp.einsum('xsd,ytd->xyst', a1, a2,
                       preferred_element_type=jnp.float32)
    sq = n1[:, None, :, None] - 2 * cross + n2[None, :, None, :]
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def get_euclidian_distance_batch(a1, a2):
    return _euclid_dist(jnp.asarray(a1), jnp.asarray(a2))


def _bucket_small(n: int) -> int:
    """Bucket group counts to limit shape-triggered recompiles (ABX groups
    have highly variable sizes; every distinct shape is a fresh XLA
    compile)."""
    for s in (1, 2, 4, 8, 16, 24, 32, 48, 64, 96, 128):
        if n <= s:
            return s
    return int(np.ceil(n / 128) * 128)


def get_distance_group_dtw(a1, a2, size1, size2, ignore_diag=False,
                           symmetric=False,
                           distance_function=get_cosine_distance_batch):
    """(N1,S1,D) x (N2,S2,D) -> (N1,N2) DTW-averaged distances
    (reference `abx_group_computation.py:45-60`), fully on device.

    All four shape dimensions are padded to buckets so the whole ABX run
    compiles a handful of kernels instead of one per distinct group shape;
    padded pairs get length-1 DTWs and are sliced away."""
    n1_, s1, d = a1.shape
    n2_, s2, _ = a2.shape
    assert size1.shape[0] == n1_ and size2.shape[0] == n2_

    bn1, bn2 = _bucket_small(n1_), _bucket_small(n2_)
    p1, p2 = _bucket(s1), _bucket(s2)
    a1p = np.zeros((bn1, p1, d), np.float32)
    a1p[:n1_, :s1] = np.asarray(a1)
    a2p = np.zeros((bn2, p2, d), np.float32)
    a2p[:n2_, :s2] = np.asarray(a2)
    len1 = np.ones(bn1, np.int32)
    len1[:n1_] = np.asarray(size1)
    len2 = np.ones(bn2, np.int32)
    len2[:n2_] = np.asarray(size2)

    dist_mat = distance_function(jnp.asarray(a1p), jnp.asarray(a2p))
    flat = dist_mat.reshape(bn1 * bn2, p1, p2)
    l1 = jnp.repeat(jnp.asarray(len1), bn2)
    l2 = jnp.tile(jnp.asarray(len2), bn1)
    out = np.array(dtw_normalized(flat, l1, l2)).reshape(bn1, bn2)
    out = out[:n1_, :n2_]
    if ignore_diag:
        np.fill_diagonal(out, 0.0)
    return out


def _make_fused_theta(dist_name: str, symmetric: bool):
    dist_fn = _cosine_dist if dist_name == 'cosine' else _euclid_dist

    def dtw_pairs(q, r, lq, lr):
        """(NQ,SQ,D) x (NR,SR,D) on-device distances + DTW -> (NQ, NR)."""
        dist = dist_fn(q, r)
        nq, nr, sq, sr = dist.shape
        flat = dist.reshape(nq * nr, sq, sr)
        l1 = jnp.repeat(lq, nr)
        l2 = jnp.tile(lr, nq)
        return dtw_normalized(flat, l1, l2).reshape(nq, nr)

    def fused(a, b, x, la, lb, lx, va, vb, vx):
        dxb = dtw_pairs(x, b, lx, lb)                     # (NX, NB)
        dxa = dtw_pairs(x, a, lx, la)                     # (NX, NA)
        w_xb = vx[:, None] & vb[None, :]
        w_xa = vx[:, None] & va[None, :]
        if symmetric:
            # reference: positives exclude the x==a pair; filling the
            # diagonal with (max over dxb) + 1 makes every diagonal
            # comparison lose (`abx_group_computation.py:74-78`)
            max_val = jnp.max(jnp.where(w_xb, dxb, -jnp.inf))
            eye = jnp.eye(dxa.shape[0], dxa.shape[1], dtype=bool)
            dxa = jnp.where(eye, max_val + 1, dxa)
        w = (w_xa[:, :, None] & w_xb[:, None, :]).astype(jnp.float32)
        dxa_e = dxa[:, :, None]
        dxb_e = dxb[:, None, :]
        wins = (dxa_e < dxb_e).astype(jnp.float32) \
            + 0.5 * (dxa_e == dxb_e).astype(jnp.float32)
        return jnp.sum(wins * w)
    return jax.jit(fused)


def _make_fused_core(dist_name: str, symmetric: bool):
    """Traceable body scoring G same-shape triplet groups in one program:
    (G, N, S, D) features, (G, N) lengths/valid masks -> (G,) win/tie
    numerators."""
    dist_fn = _cosine_dist_g if dist_name == 'cosine' else _euclid_dist_g

    def dtw_pairs(q, r, lq, lr):
        dist = dist_fn(q, r)                              # (G,NQ,NR,SQ,SR)
        g, nq, nr, sq, sr = dist.shape
        flat = dist.reshape(g * nq * nr, sq, sr)
        l1 = jnp.broadcast_to(lq[:, :, None], (g, nq, nr)).reshape(-1)
        l2 = jnp.broadcast_to(lr[:, None, :], (g, nq, nr)).reshape(-1)
        return dtw_normalized(flat, l1, l2).reshape(g, nq, nr)

    def fused(a, b, x, la, lb, lx, va, vb, vx):
        dxb = dtw_pairs(x, b, lx, lb)                     # (G, NX, NB)
        dxa = dtw_pairs(x, a, lx, la)                     # (G, NX, NA)
        w_xb = vx[:, :, None] & vb[:, None, :]
        w_xa = vx[:, :, None] & va[:, None, :]
        if symmetric:
            max_val = jnp.max(jnp.where(w_xb, dxb, -jnp.inf), axis=(1, 2),
                              keepdims=True)
            eye = jnp.eye(dxa.shape[1], dxa.shape[2], dtype=bool)[None]
            dxa = jnp.where(eye, max_val + 1, dxa)
        w = (w_xa[:, :, :, None] & w_xb[:, :, None, :]).astype(jnp.float32)
        dxa_e = dxa[:, :, :, None]
        dxb_e = dxb[:, :, None, :]
        wins = (dxa_e < dxb_e).astype(jnp.float32) \
            + 0.5 * (dxa_e == dxb_e).astype(jnp.float32)
        return jnp.sum(wins * w, axis=(1, 2, 3))
    return fused


def _make_fused_theta_batched(dist_name: str, symmetric: bool):
    return jax.jit(_make_fused_core(dist_name, symmetric))


def _unpack_flush_buffer(buf, sa, sb, sx):
    """Split one flat flush buffer into the nine per-flush arrays: three
    (G, N, S[, D]) blocks, then lengths and valid masks ((G, N) each) —
    the single layout both the value-packed and index-gather scorers
    consume."""
    out = []
    off = 0
    for shape in (sa, sb, sx, sa[:2], sb[:2], sx[:2],
                  sa[:2], sb[:2], sx[:2]):
        size = 1
        for d in shape:
            size *= d
        out.append(buf[off:off + size].reshape(shape))
        off += size
    return out


def _shard_groups(mesh, arrays):
    """Constrain the leading (G) axis of each unpacked array over the
    mesh's data axis — ONE compiled program whose per-device share is a
    G/n_dev stack of groups (the across-chips analogue of the reference
    DataParallel-izing its distance batches). Groups are independent until
    the per-group numerator, so the scores are bit-identical to the
    unsharded program. No-op when G does not divide the mesh."""
    if mesh is None or arrays[0].shape[0] % mesh.devices.size:
        return arrays
    from jax.sharding import NamedSharding
    from ...parallel.mesh import batch_pspec
    return tuple(jax.lax.with_sharding_constraint(
        t, NamedSharding(mesh, batch_pspec(mesh, t.ndim)))
        for t in arrays)


def _make_fused_theta_gather(dist_name: str, symmetric: bool, mesh=None):
    """The batched scorer fed by token-row INDICES into a device-resident
    (T, D) feature matrix: per flush the host uploads one int32 buffer
    (indices + lengths + valid masks, ~D x fewer bytes than the
    materialized feature blocks) and the program gathers/pads on device.
    Junk rows gathered beyond a token's true length never reach the DTW
    answer cell (monotone paths through (n1-1, n2-1) only visit
    in-length cells), exactly like the zero padding they replace — the
    host-value path and this one produce identical scores
    (tests/test_abx.py pins it)."""
    core = _make_fused_core(dist_name, symmetric)

    def gathered(feats, buf, sa, sb, sx):
        ia, ib, ix, la, lb, lx, va, vb, vx = _shard_groups(
            mesh, _unpack_flush_buffer(buf, sa, sb, sx))
        return core(feats[ia], feats[ib], feats[ix], la, lb, lx,
                    va != 0, vb != 0, vx != 0)
    return jax.jit(gathered, static_argnums=(2, 3, 4))


def _make_fused_theta_packed(dist_name: str, symmetric: bool, mesh=None):
    """The batched scorer behind ONE flat float32 operand: the host packs
    all nine per-flush arrays (three (G,N,S,D) feature blocks, lengths,
    valid masks — lengths/masks are exact in f32) into a single buffer,
    so a flush costs one upload + one dispatch instead of nine uploads.
    On remote-dispatch backends each upload is a ~100 ms round trip —
    with ~7 flushes x 9 arrays this WAS the entire ABX wall (device busy
    measured 0.5% before, scripts/profile_eval.py)."""
    core = _make_fused_core(dist_name, symmetric)

    def packed(buf, sa, sb, sx):
        a, b, x, la, lb, lx, va, vb, vx = _shard_groups(
            mesh, _unpack_flush_buffer(buf, sa, sb, sx))
        return core(a, b, x,
                    la.astype(jnp.int32), lb.astype(jnp.int32),
                    lx.astype(jnp.int32), va != 0, vb != 0, vx != 0)
    return jax.jit(packed, static_argnums=(1, 2, 3))


@jax.jit
def _cosine_dist_g(a1, a2):
    prod = jnp.einsum('gxsd,gytd->gxyst', a1, a2,
                      preferred_element_type=jnp.float32)
    return jnp.arccos(jnp.clip(prod, -1.0, 1.0)) / math.pi


@jax.jit
def _euclid_dist_g(a1, a2):
    n1 = jnp.sum(jnp.square(a1), axis=3)                 # (G,N1,S1)
    n2 = jnp.sum(jnp.square(a2), axis=3)                 # (G,N2,S2)
    cross = jnp.einsum('gxsd,gytd->gxyst', a1, a2,
                       preferred_element_type=jnp.float32)
    sq = n1[:, :, None, :, None] - 2 * cross + n2[:, None, :, None, :]
    return jnp.sqrt(jnp.maximum(sq, 0.0))


_FUSED_CACHE = {}


def _fused_theta(dist_name: str, symmetric: bool):
    key = (dist_name, symmetric)
    if key not in _FUSED_CACHE:
        _FUSED_CACHE[key] = _make_fused_theta(dist_name, symmetric)
    return _FUSED_CACHE[key]


_SCORER_MAKERS = {'batched': _make_fused_theta_batched,
                  'packed': _make_fused_theta_packed,
                  'gather': _make_fused_theta_gather}
_SCORER_CACHE = {}


def _scorer(kind: str, dist_name: str, symmetric: bool, mesh=None):
    key = (kind, dist_name, symmetric, mesh)
    if key not in _SCORER_CACHE:
        maker = _SCORER_MAKERS[kind]
        if kind == 'batched':
            _SCORER_CACHE[key] = maker(dist_name, symmetric)
        else:
            _SCORER_CACHE[key] = maker(dist_name, symmetric, mesh)
    return _SCORER_CACHE[key]


def _fused_theta_batched(dist_name: str, symmetric: bool):
    return _scorer('batched', dist_name, symmetric)


def _fused_theta_packed(dist_name: str, symmetric: bool, mesh=None):
    return _scorer('packed', dist_name, symmetric, mesh)


def _fused_theta_gather(dist_name: str, symmetric: bool, mesh=None):
    return _scorer('gather', dist_name, symmetric, mesh)


def _pad_group(g, sizes):
    n, s, d = g.shape
    bn, ps = _bucket_small(n), _bucket(s)
    gp = np.zeros((bn, ps, d), np.float32)
    gp[:n, :s] = np.asarray(g)
    lp = np.ones(bn, np.int32)
    lp[:n] = np.asarray(sizes)
    valid = np.zeros(bn, bool)
    valid[:n] = True
    return gp, lp, valid


def get_theta_group_dtw(a, b, x, sa, sb, sx, distance_function, symmetric):
    """Asymmetric ABX score θ for one triplet group
    (reference `abx_group_computation.py:63-90`).

    The whole triplet — both distance matrices, both batched DTWs, and the
    win/tie count — runs as ONE jitted program returning a scalar: on
    remote-dispatch backends the per-group cost is a single round-trip
    instead of four dispatches plus two matrix fetches."""
    check_dtw_group_validity(a, b, x)
    if distance_function is get_cosine_distance_batch:
        dist_name = 'cosine'
    elif distance_function is get_euclidian_distance_batch:
        dist_name = 'euclidian'
    else:
        return _theta_group_dtw_host(a, b, x, sa, sb, sx, distance_function,
                                     symmetric)

    ap, la, va = _pad_group(a, sa)
    bp, lb, vb = _pad_group(b, sb)
    xp, lx, vx = _pad_group(x, sx)
    numerator = _fused_theta(dist_name, symmetric)(
        ap, bp, xp, jnp.asarray(la), jnp.asarray(lb), jnp.asarray(lx),
        jnp.asarray(va), jnp.asarray(vb), jnp.asarray(vx))

    na, nb, nx = a.shape[0], b.shape[0], x.shape[0]
    n_pos = na * (na - 1) if symmetric else na * nx
    # Returned as a DEVICE scalar: the caller's loop stays fully
    # asynchronous (no per-group round-trip) and fetches every score in
    # one transfer at the end.
    return numerator / (n_pos * nb)


def _theta_group_dtw_host(a, b, x, sa, sb, sx, distance_function, symmetric):
    """Generic-callable fallback: per-matrix dispatches + host-side count."""
    dxb = get_distance_group_dtw(x, b, sx, sb,
                                 distance_function=distance_function)
    dxa = get_distance_group_dtw(x, a, sx, sa, ignore_diag=symmetric,
                                 symmetric=symmetric,
                                 distance_function=distance_function)
    nx, na = dxa.shape
    nx, nb = dxb.shape

    if symmetric:
        n_pos = na * (na - 1)
        max_val = dxb.max()
        np.fill_diagonal(dxa, max_val + 1)
    else:
        n_pos = na * nx

    dxb_e = dxb.reshape(nx, 1, nb)
    dxa_e = dxa.reshape(nx, na, 1)
    sc = float((dxa_e < dxb_e).sum() + 0.5 * (dxa_e == dxb_e).sum())
    sc /= n_pos * nb
    return sc


def loc_dtw(data, distance_function, symmetric):
    coords, group_a, group_b, group_x = data
    theta = get_theta_group_dtw(group_a[0], group_b[0], group_x[0],
                                group_a[1], group_b[1], group_x[1],
                                distance_function, symmetric)
    return coords, 1 - theta


# Triplet groups stacked per program. Real ABX runs have thousands of
# small groups; per-group programs are dispatch-bound on remote backends.
# Kept modest because the wavefront DTW materializes (n_diag, G*N1*N2, S1)
# cost/length stacks.
_GROUP_BATCH = 32


def _bucket_g(n: int, cap: int = _GROUP_BATCH) -> int:
    g = 1
    while g < n:
        g *= 2
    return min(g, cap)


def get_abx_scores_dtw_on_group(group_iterator, distance_function,
                                symmetric):
    """Accumulate θ scores into a sparse (coords -> score) map
    (reference returns a torch sparse tensor; here (coords array, values
    array, board_size) with identical contents).

    Groups are padded to shape buckets and scored in stacks of up to
    `_GROUP_BATCH` same-shape groups per program; every program's (G,)
    numerator vector stays on device until one final fetch, so the whole
    pass is a pipelined stream of a few dozen distinct compilations."""
    if distance_function is get_cosine_distance_batch:
        dist_name = 'cosine'
    elif distance_function is get_euclidian_distance_batch:
        dist_name = 'euclidian'
    else:
        return _abx_scores_host_loop(group_iterator, distance_function,
                                     symmetric)

    n = len(group_iterator)
    coords_list = [None] * n
    denoms = np.empty(n, np.float64)
    pending = []                  # (device (G,) numerators, [indices])
    buffers = {}                  # shape key -> list of (index, padded...)

    # Group-axis sharding over the local devices: each flush stacks up to
    # n_dev x _GROUP_BATCH groups (per-device share unchanged) and the
    # scorer constrains the G axis over the mesh — scores are identical to
    # the single-device program, wall-clock divides by the chip count.
    mesh = None
    if jax.process_count() == 1 and len(jax.local_devices()) > 1:
        from ...parallel.mesh import eval_mesh
        mesh = eval_mesh()
    group_batch = _GROUP_BATCH * (1 if mesh is None else mesh.devices.size)

    # Device-resident feature matrix for the index-gather fast path: the
    # loader's flat (T, D) block uploads ONCE; each flush then ships only
    # int32 indices/lengths/masks and the program gathers the padded
    # blocks on device. Re-uploading materialized feature values per
    # flush measured ~1.7 s/flush over the remote tunnel (the whole ABX
    # wall; scripts/profile_eval.py) — the same values were already on
    # the wire once during feature extraction.
    feats_np = getattr(getattr(group_iterator, 'dataset', None), 'data',
                       None)
    feats_dev = None
    if isinstance(feats_np, np.ndarray) and feats_np.ndim == 2:
        feats_host = np.ascontiguousarray(feats_np, np.float32)
        if mesh is not None:
            from ...parallel.mesh import replicate
            feats_dev = replicate(mesh, jnp.asarray(feats_host))
        else:
            feats_dev = jnp.asarray(feats_host)
    fused_gather = _fused_theta_gather(dist_name, symmetric, mesh)
    fused_packed = _fused_theta_packed(dist_name, symmetric, mesh)

    def flush(key):
        items = buffers.pop(key)
        g_true = len(items)
        gb = _bucket_g(g_true, group_batch)
        idxs = [it[0] for it in items]

        def stack(pos):
            arrs = [it[pos] for it in items]
            if gb > g_true:  # pad with all-invalid dummy groups
                arrs += [np.zeros_like(arrs[0])] * (gb - g_true)
            return np.stack(arrs)

        use_gather = feats_dev is not None and all(
            it[10] is not None and it[11] is not None and it[12] is not None
            for it in items)
        if use_gather:
            t_rows = feats_dev.shape[0]

            def idx_block(pos_start, pos_feat):
                st = stack(pos_start)                     # (G, N)
                s_pad = items[0][pos_feat].shape[1]
                idx = st[:, :, None] + np.arange(s_pad)[None, None, :]
                return np.clip(idx, 0, t_rows - 1)

            ia = idx_block(10, 1)
            ib = idx_block(11, 4)
            ix = idx_block(12, 7)
            buf = np.concatenate([t.astype(np.int32).ravel() for t in (
                ia, ib, ix, stack(2), stack(5), stack(8),
                stack(3), stack(6), stack(9))])
            out = fused_gather(feats_dev, jnp.asarray(buf),
                               ia.shape, ib.shape, ix.shape)
        else:
            # fallback: ONE flat f32 value upload per flush (lengths and
            # masks are exact in f32)
            a, b, x = stack(1), stack(4), stack(7)
            buf = np.concatenate([t.astype(np.float32).ravel() for t in (
                a, b, x, stack(2), stack(5), stack(8),
                stack(3), stack(6), stack(9))])
            out = fused_packed(jnp.asarray(buf), a.shape, b.shape, x.shape)
        pending.append((out, idxs))

    done = 0
    for index, group in enumerate(group_iterator):
        coords, group_a, group_b, group_x = group
        a, sa = group_a
        b, sb = group_b
        x, sx = group_x
        check_dtw_group_validity(a, b, x)
        ap, la, va = _pad_group(a, sa)
        bp, lb, vb = _pad_group(b, sb)
        xp, lx, vx = _pad_group(x, sx)
        na, nb, nx = a.shape[0], b.shape[0], x.shape[0]
        n_pos = na * (na - 1) if symmetric else na * nx
        coords_list[index] = coords
        denoms[index] = n_pos * nb

        def pad_starts(g, bn):
            st = getattr(g, 'token_starts', None)
            if st is None:
                return None
            out = np.zeros(bn, np.int64)
            out[:len(st)] = st
            return out

        key = (ap.shape, bp.shape, xp.shape)
        buffers.setdefault(key, []).append(
            (index, ap, la, va, bp, lb, vb, xp, lx, vx,
             pad_starts(a, ap.shape[0]), pad_starts(b, bp.shape[0]),
             pad_starts(x, xp.shape[0])))
        if len(buffers[key]) >= group_batch:
            flush(key)
        done += 1
        if done % 500 == 0:
            print(f"  {done}/{n} groups")
    for key in list(buffers):
        flush(key)

    scores = np.empty(n, np.float64)
    # ONE device->host transfer for every program's numerators: a list
    # fetch pays one round trip per array on remote-dispatch backends
    # (measured ~100 ms each over the tunnel), a single concatenated
    # fetch pays one.
    if pending:
        all_out = np.asarray(jnp.concatenate([p[0] for p in pending]))
        off = 0
        for out_dev, idxs in pending:
            block = all_out[off:off + out_dev.shape[0]]
            off += out_dev.shape[0]
            for pos, idx in enumerate(idxs):
                scores[idx] = block[pos]
    scores = 1.0 - scores / denoms
    return (np.array(coords_list, dtype=np.int64),
            np.array(scores, dtype=np.float32),
            group_iterator.get_board_size())


def _abx_scores_host_loop(group_iterator, distance_function, symmetric):
    """Original per-group path for generic (non-jittable) distance
    callables."""
    data_list = []
    coords_list = []
    n = len(group_iterator)
    for index, group in enumerate(group_iterator):
        coords, abx = loc_dtw(group, distance_function, symmetric)
        data_list.append(abx)
        coords_list.append(coords)
        if (index + 1) % 500 == 0:
            print(f"  {index + 1}/{n} groups")
    data_list = jax.device_get(data_list)
    return (np.array(coords_list, dtype=np.int64),
            np.array(data_list, dtype=np.float32),
            group_iterator.get_board_size())
