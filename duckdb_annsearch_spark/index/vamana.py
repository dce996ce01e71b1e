"""Pure-numpy Vamana (DiskANN-style) graph build + greedy beam search.

Algorithm parity with the reference's patched Microsoft DiskANN crate:

* insert = greedy search for visited set -> RobustPrune -> bidirectional
  edges, re-pruning overfull neighbors
  (``/root/reference/rust_lib/diskann-patch/src/graph/index.rs:348-478``);
* RobustPrune with occlusion factor alpha
  (``.../graph/index.rs:3185-3239``);
* defaults max_degree(R)=64, build_complexity(L)=128, alpha=1.2
  (``/root/reference/src/include/diskann_index.hpp:21-26``);
* search beam width L = max(k, search_complexity or build_complexity)
  (``/root/reference/rust_lib/src/index_manager.rs:344-349``);
* entry point = medoid (closest point to the centroid).

This module is plain library code that runs EITHER on the driver (small
builds, single-query probes) or inside executor python workers
(``mapInPandas`` batch probes with a process-level graph cache) — the same
role the Rust core plays for the reference.
"""

from __future__ import annotations

import numpy as np

DEFAULT_MAX_DEGREE = 64
DEFAULT_BUILD_COMPLEXITY = 128
DEFAULT_ALPHA = 1.2
NO_NEIGHBOR = -1

# C einsum entry point: skips the python wrapper's per-call subscript parse
# (~2 µs) — this sits inside every beam-search hop. Same guarded import as
# kernels.py (kept local so this module stays dependency-free).
try:
    from numpy.core.multiarray import c_einsum as _c_einsum
except Exception:  # pragma: no cover - numpy version dependent
    try:
        from numpy._core.multiarray import c_einsum as _c_einsum
    except Exception:
        _c_einsum = np.einsum


def _dists(metric: str, x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Distances from q (dim,) to rows of x (n, dim); lower = better."""
    if metric == "ip":
        return -(x @ q)
    if metric == "cosine":
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        qn = q / max(np.linalg.norm(q), 1e-30)
        return 1.0 - xn @ qn
    d = x - q
    return _c_einsum("ij,ij->i", d, d)


class VamanaGraph:
    def __init__(
        self,
        vectors: np.ndarray,
        neighbors: list[np.ndarray] | np.ndarray,
        entry_point: int,
        metric: str = "l2",
        row_ids: np.ndarray | None = None,
    ):
        self.vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.neighbors = neighbors  # list of int arrays, or padded 2-D array
        self.entry_point = int(entry_point)
        self.metric = metric
        self.row_ids = row_ids

    def _nbrs(self, label: int) -> np.ndarray:
        nb = self.neighbors[label]
        if isinstance(self.neighbors, np.ndarray):
            return nb[nb != NO_NEIGHBOR]
        return nb

    def beam_search(
        self, query: np.ndarray, k: int, L: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Greedy best-first search; returns (labels, distances) of top-k.

        Mirrors the visited-set + bounded candidate pool loop of
        ``rust_lib/src/provider.rs:442-518``; the visited/expanded sets are
        numpy bool masks so each hop is a handful of vectorized ops (the
        python-set version dominated build time).
        """
        L = max(L, k)
        q = np.asarray(query, dtype=np.float32)
        n = self.vectors.shape[0]
        if n == 0:
            # an index over zero indexable rows is legal; searches are empty
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        visited = np.zeros(n, dtype=bool)
        expanded = np.zeros(n, dtype=bool)
        ep = self.entry_point
        d0 = float(_dists(self.metric, self.vectors[ep : ep + 1], q)[0])
        # pool: sorted arrays of (dist, label), capped at L
        pool_d = np.array([d0], dtype=np.float32)
        pool_l = np.array([ep], dtype=np.int64)
        visited[ep] = True
        while True:
            unexp = ~expanded[pool_l]
            nxt = int(np.argmax(unexp))
            if not unexp[nxt]:
                break
            cur = int(pool_l[nxt])
            expanded[cur] = True
            nbrs = self._nbrs(cur)
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                visited[nbrs] = True
                nd = _dists(self.metric, self.vectors[nbrs], q)
                pool_d = np.concatenate([pool_d, nd.astype(np.float32)])
                pool_l = np.concatenate([pool_l, nbrs])
                order = np.argsort(pool_d, kind="stable")[:L]
                pool_d, pool_l = pool_d[order], pool_l[order]
        top = min(k, len(pool_l))
        return pool_l[:top], pool_d[:top]

    def _padded_neighbors(self) -> np.ndarray:
        """Fixed-width (n, R) int32 adjacency, NO_NEIGHBOR-padded, cached.
        The lock-step batch search gathers whole frontier rows at once —
        list-of-arrays adjacency would force a per-query Python loop."""
        pad = getattr(self, "_padded", None)
        if pad is None:
            if isinstance(self.neighbors, np.ndarray):
                pad = self.neighbors.astype(np.int32, copy=False)
            else:
                r = max((len(nb) for nb in self.neighbors), default=1) or 1
                pad = np.full((len(self.neighbors), r), NO_NEIGHBOR, np.int32)
                for i, nb in enumerate(self.neighbors):
                    pad[i, : len(nb)] = nb
            self._padded = pad
        return pad

    def beam_search_batch(
        self,
        queries: np.ndarray,
        k: int,
        L: int,
        visited_budget_bytes: int = 64 << 20,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Lock-step multi-query beam search (R2 parity —
        ``rust_lib/src/provider.rs:243-440``): every active query advances
        one BFS hop per round and the round's distance work runs as ONE
        vectorized kernel over all (query, frontier-neighbor) pairs, instead
        of a Python loop per query per hop.

        Produces bit-identical results to ``beam_search`` per query: the
        pool merge is the same stable argsort over [sorted pool ++ new
        candidates in adjacency order], the visited discipline marks nodes
        when pooled, and expansion picks the first unexpanded pool slot.

        Queries are chunked so the (chunk, n) visited bitmap stays under
        ``visited_budget_bytes`` — bounded memory at any graph size.
        """
        qs = np.ascontiguousarray(queries, dtype=np.float32)
        m = qs.shape[0]
        n = self.vectors.shape[0]
        if m == 0:
            return []
        if n == 0:
            e = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
            return [e] * m
        chunk = max(1, min(m, visited_budget_bytes // max(n, 1)))
        out: list[tuple[np.ndarray, np.ndarray]] = []
        for s in range(0, m, chunk):
            out.extend(self._beam_batch_chunk(qs[s : s + chunk], k, max(L, k)))
        return out

    def _beam_batch_chunk(
        self, qs: np.ndarray, k: int, L: int
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        n = self.vectors.shape[0]
        m = qs.shape[0]
        nbr_mat = self._padded_neighbors()
        R = nbr_mat.shape[1]
        ep = self.entry_point
        INF = np.float32(np.inf)
        W = L + R

        # per-query state lives in fixed-width (m, L+R) buffers: the first L
        # slots are the sorted pool, the R-slot tail is per-round scratch —
        # no per-round concatenate allocations
        buf_d = np.full((m, W), INF, dtype=np.float32)
        buf_l = np.full((m, W), -1, dtype=np.int64)
        buf_e = np.zeros((m, W), dtype=bool)
        visited = np.zeros(m * n, dtype=bool)  # flat (row, node) bitmap
        buf_d[:, 0] = _dists_pairs(
            self.metric, np.broadcast_to(self.vectors[ep], qs.shape), qs
        )
        buf_l[:, 0] = ep
        visited[np.arange(m) * n + ep] = True

        alive = np.arange(m)  # original query index of each live row
        while alive.size:
            # first unexpanded non-empty pool slot per live query
            unexp = (buf_l[alive, :L] != -1) & ~buf_e[alive, :L]
            slot = unexp.argmax(axis=1)
            has = unexp[np.arange(alive.size), slot]
            if not has.any():
                break
            # retire finished queries from every state array
            if not has.all():
                alive = alive[has]
                slot = slot[has]
            rows = alive
            a = rows.size
            cur = buf_l[rows, slot]
            buf_e[rows, slot] = True

            nb = nbr_mat[cur]  # (a, R) int32
            fresh = nb != NO_NEIGHBOR
            flat_idx = (rows[:, None] * n + np.where(fresh, nb, 0)).ravel()
            fresh &= ~visited[flat_idx].reshape(a, R)
            hit = flat_idx[fresh.ravel()]
            visited[hit] = True

            if not hit.size:
                continue
            # rows whose expansion produced no fresh candidates keep their
            # (already sorted) pool — only rows with new work pay the merge
            grew = fresh.any(axis=1)
            rows_g = rows[grew]
            fresh_g = fresh[grew]
            nb_g = nb[grew]

            # one vectorized distance kernel for every fresh pair this round
            nd = np.full((rows_g.size, R), INF, dtype=np.float32)
            qrow = hit // n  # original query index of each fresh pair
            nd[fresh_g] = _dists_pairs(
                self.metric, self.vectors[nb[fresh]], qs[qrow]
            )

            # stable merge in place: scratch tail <- new candidates
            # (adjacency order), then rowwise stable argsort of the whole
            # buffer; [sorted pool ++ fresh] preserves beam_search's order
            buf_d[rows_g, L:] = nd
            buf_l[rows_g, L:] = np.where(fresh_g, nb_g, -1)
            buf_e[rows_g, L:] = False
            sub_d = buf_d[rows_g]
            sub_l = buf_l[rows_g]
            sub_e = buf_e[rows_g]
            order = np.argsort(sub_d, axis=1, kind="stable")
            ar = np.arange(rows_g.size)[:, None]
            buf_d[rows_g] = sub_d[ar, order]
            buf_l[rows_g] = sub_l[ar, order]
            buf_e[rows_g] = sub_e[ar, order]
            # anything sorted past L is out of the beam
            buf_d[rows_g, L:] = INF
            buf_l[rows_g, L:] = -1

        res = []
        for i in range(m):
            valid = buf_l[i, :L] != -1
            top = min(k, int(valid.sum()))
            res.append((buf_l[i, :top], buf_d[i, :top]))
        return res


def _dists_pairs(metric: str, x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-paired distances: d[i] = dist(x[i], q[i]) for (A, dim) inputs —
    the lock-step batch kernel (all pairs of one hop in one einsum)."""
    if metric == "ip":
        return (-_c_einsum("ij,ij->i", x, q)).astype(np.float32, copy=False)
    if metric == "cosine":
        # normalize-then-dot, matching _dists' rounding exactly
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        return (1.0 - _c_einsum("ij,ij->i", xn, qn)).astype(np.float32, copy=False)
    d = x - q
    return _c_einsum("ij,ij->i", d, d).astype(np.float32, copy=False)


def _pairwise_matrix(metric: str, X: np.ndarray) -> np.ndarray:
    """(m, m) all-pairs distance matrix among candidate vectors — ONE GEMM
    per RobustPrune call instead of one einsum per selected neighbor."""
    if metric == "ip":
        return -(X @ X.T)
    if metric == "cosine":
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        return 1.0 - Xn @ Xn.T
    sq = _c_einsum("ij,ij->i", X, X)
    D = sq[:, None] - 2.0 * (X @ X.T) + sq[None, :]
    return np.maximum(D, 0.0, out=D)


def robust_prune(
    p: int,
    candidates: np.ndarray,
    cand_dists: np.ndarray,
    vectors: np.ndarray,
    alpha: float,
    max_degree: int,
    metric: str,
) -> np.ndarray:
    """DiskANN RobustPrune: pick closest, occlude its alpha-shadow, repeat.

    The occlusion distances d(p*, v) come from one precomputed all-pairs
    matrix (GEMM identity) — the loop itself is pure boolean masking."""
    order = np.argsort(cand_dists, kind="stable")
    cands = candidates[order]
    dists = cand_dists[order]
    # drop p at the SAME positions in both arrays — p typically sorts first
    # (self-distance 0), and truncating dists from the tail instead would
    # shift every d(p, v) one slot and corrupt the occlusion test
    mask = cands != p
    cands, dists = cands[mask], dists[mask]
    m = len(cands)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    D = _pairwise_matrix(metric, vectors[cands])
    alive = np.ones(m, dtype=bool)
    out: list[int] = []
    for i in range(m):
        if not alive[i]:
            continue
        out.append(int(cands[i]))
        if len(out) >= max_degree:
            break
        # v (alive, after i) is occluded when alpha * d(p*, v) <= d(p, v)
        occl = (alpha * D[i] <= dists) & alive
        occl[: i + 1] = False
        alive[occl] = False
    return np.asarray(out, dtype=np.int64)


def batched_insert(
    x: np.ndarray,
    nbr_buf: np.ndarray,
    deg: np.ndarray,
    entry_point: int,
    metric: str,
    positions: np.ndarray,
    max_degree: int,
    build_complexity: int,
    alpha: float,
    start_size: int,
    max_batch: int = 128,
    touched_below: int | None = None,
) -> set[int]:
    """Insert ``positions`` into the graph held in ``(nbr_buf, deg)`` using
    lock-step batched candidate searches.

    The reference inserts one-by-one (``src/diskann_index.cpp:202-300``);
    semantically this does too — RobustPrune and backedge updates apply
    per point in insertion order — but the *candidate searches* for a
    batch of upcoming points run as ONE lock-step multi-query beam search
    over the pre-batch graph (standard parallel-DiskANN batching; the
    reference's patched crate batches inserts the same way). Points in a
    batch don't see each other as search candidates; backedges still
    connect them, and recall floors are test-asserted. ``max_batch=1``
    reproduces the sequential loop exactly (the lock-step kernel is
    bit-identical to ``beam_search`` per query).

    ``nbr_buf`` is ONE preallocated (n, >=slack+1) int32 NO_NEIGHBOR-padded
    matrix shared with the lock-step kernel as its padded adjacency — no
    per-batch re-padding. ``deg`` is the per-node degree. ``start_size``
    sizes the batch ramp (near-sequential while the graph is tiny).
    Returns the set of pre-existing nodes (< ``touched_below``) whose
    adjacency changed — the streaming builder emits those as patches.
    """
    slack = int(max_degree * 1.3)  # graph slack 1.3x (defaults.rs:14-34)
    g = VamanaGraph(x, nbr_buf, entry_point, metric)
    g._padded = nbr_buf  # the kernel reads this; in-place edits are visible
    touched: set[int] = set()

    def set_row(p: int, arr: np.ndarray) -> None:
        m = len(arr)
        nbr_buf[p, :m] = arr
        nbr_buf[p, m:] = NO_NEIGHBOR
        deg[p] = m

    i = 0
    n_ins = len(positions)
    while i < n_ins:
        sz = start_size + i
        b = 1 if sz < 64 else min(max_batch, max(1, sz // 8))
        pts = positions[i : i + b]
        i += b
        results = g.beam_search_batch(x[pts], build_complexity, build_complexity)
        for p, (labels, dists) in zip(pts, results):
            p = int(p)
            if len(labels) == 0 or (len(labels) == 1 and labels[0] == p):
                continue
            nbrs = robust_prune(
                p, np.asarray(labels), np.asarray(dists), x, alpha, max_degree, metric
            )
            set_row(p, nbrs)
            for nb in nbrs:
                nb = int(nb)
                cur = nbr_buf[nb, : deg[nb]]
                if p in cur:
                    continue
                if deg[nb] < slack:
                    nbr_buf[nb, deg[nb]] = p
                    deg[nb] += 1
                else:
                    cand = np.concatenate([cur.astype(np.int64), [p]])
                    cd = _dists(metric, x[cand], x[nb])
                    set_row(nb, robust_prune(nb, cand, cd, x, alpha, max_degree, metric))
                if touched_below is not None and nb < touched_below:
                    touched.add(nb)
    return touched


def build_vamana(
    vectors: np.ndarray,
    metric: str = "l2",
    max_degree: int = DEFAULT_MAX_DEGREE,
    build_complexity: int = DEFAULT_BUILD_COMPLEXITY,
    alpha: float = DEFAULT_ALPHA,
    seed: int = 42,
    max_batch: int = 128,
) -> VamanaGraph:
    """Vamana construction from scratch via :func:`batched_insert`
    (entry = medoid, randomized insertion order)."""
    x = np.ascontiguousarray(vectors, dtype=np.float32)
    n = x.shape[0]
    if n == 0:
        return VamanaGraph(x, [], 0, metric)
    mean = x.mean(axis=0)
    medoid = int(np.argmin(_dists("l2", x, mean)))
    slack = int(max_degree * 1.3)
    nbr_buf = np.full((n, slack + 1), NO_NEIGHBOR, dtype=np.int32)
    deg = np.zeros(n, dtype=np.int32)
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    batched_insert(
        x, nbr_buf, deg, medoid, metric, order, max_degree, build_complexity,
        alpha, start_size=1, max_batch=max_batch,
    )
    return VamanaGraph(
        x,
        [nbr_buf[j, : deg[j]].astype(np.int64) for j in range(n)],
        medoid,
        metric,
    )


def prune_to_degree(
    g: VamanaGraph, max_degree: int, alpha: float = DEFAULT_ALPHA
) -> None:
    """RobustPrune every over-full adjacency list down to ``max_degree``.

    The build lets backedge lists grow to 1.3·R slack; persisting by
    truncation would drop the most recent backedges in arbitrary order
    (the reference prunes before save — occlusion order, not recency).
    Call before ``pad_neighbors`` at any artifact/broadcast boundary."""
    for p, nb in enumerate(g.neighbors):
        if len(nb) > max_degree:
            d = _dists(g.metric, g.vectors[nb], g.vectors[p])
            g.neighbors[p] = robust_prune(
                p, np.asarray(nb, dtype=np.int64), d, g.vectors, alpha,
                max_degree, g.metric,
            )


def pad_neighbors(neighbors: list[np.ndarray], max_degree: int) -> np.ndarray:
    """Fixed-width adjacency with -1 padding — the DANN file layout uses
    u32::MAX sentinel padding (``rust_lib/src/file_format.rs:3-18``)."""
    out = np.full((len(neighbors), max_degree), NO_NEIGHBOR, dtype=np.int64)
    for i, nb in enumerate(neighbors):
        m = min(len(nb), max_degree)
        out[i, :m] = nb[:m]
    return out


def build_pruned_adjacency(
    x: np.ndarray,
    metric: str,
    max_degree: int,
    build_L: int,
    alpha: float,
    prune: bool = False,
) -> tuple[list, int]:
    """``build_vamana`` (optionally + ``prune_to_degree``) returning only
    ``(neighbors, entry_point)`` — the payload a remote builder ships back
    (``index/remote.py``): vectors stay with the caller, and the adjacency
    is identical to calling the two functions locally."""
    g = build_vamana(x, metric, max_degree, build_L, alpha)
    if prune:
        prune_to_degree(g, max_degree, alpha)
    return [g.neighbors[i] for i in range(x.shape[0])], g.entry_point
