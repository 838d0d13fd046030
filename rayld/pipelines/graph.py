"""Graph analytics over the constructed knowledge graph.

Operates on the flagship triples Dataset (kg.build_triples output): entities
are IRIs plus conversation-qualified blank nodes (bnode labels are c14n-
scoped PER conversation, so cross-conversation label collisions must not
merge graph nodes).

- entity_degrees / degree_histogram: in/out-degree per entity + the degree
  histogram (one unbounded-key aggregate, then a bounded-key combine).
- pagerank: damped PageRank with dangling-mass redistribution, COST-BASED
  like dedup.minhash_dedup's verification: when the node count fits the
  broadcast threshold, each iteration is ONE map over the materialized edge
  list with the rank vector broadcast via ray.put plus one bucketed combine
  of the per-dst partials (the driver holds only the node-sized rank
  vector); beyond the threshold it switches to the fully distributed
  rank-join path (two bucketed exchanges per iteration, the
  connected_components shuffle shape — nothing node-sized ever reaches the
  driver). Both paths are value-identical (parity-tested).
  DETERMINISM: every float sum runs over a frame sorted by all grouping
  columns first, so identical value multisets fold in one order regardless
  of block arrival — retries are value-identical (CLAUDE.md contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _wedge_pair_sums(w: np.ndarray, x: np.ndarray, weight_fn=None,
                     max_per_center: int | None = None,
                     chunk_pairs: int = 16_000_000):
    """Aggregate sum-of-weights over all per-center neighbor pairs, pure
    numpy, bounded memory: for each center value in ``w`` the deduped
    sorted neighbor set from ``x`` contributes all C(deg, 2) pairs
    (a < b), each weighted ``weight_fn(deg)`` (1 when None; the weight is
    per CENTER, the common-neighbor / resource-allocation family).

    Returns (p, q, sums, n_capped) int64 arrays (+ capped-center count).
    The wedge multiset never materializes as a frame: neighbor values are
    factorized to ranks (always < 2^31 in-task), each pair packs into ONE
    int64 code, and codes reduce via np.unique + np.add.at in chunks of
    ``chunk_pairs``, so peak memory is the chunk plus the distinct-pair
    output — not the multiset. At sf0.1 the projection graph carries
    1.08e9 wedges; the previous pandas groupby over the materialized
    multiset measured 370-480s per query, this path is ~20x faster.

    HUB-SAFE (verdict-r4 item 2): a single center's emission is itself
    sliced into <= ``chunk_pairs``-sized row strips, so one degree-100k
    hub (C(d,2) ~ 5e9 pairs ~ 40 GB of codes) can never allocate its full
    pair set in one array — peak allocation is O(chunk_pairs + deg)
    regardless of skew, and the reduction is order-independent int64
    sums, so results are bit-identical to the unchunked emission. Exact
    CN-family output stays inherently quadratic in hub degree in TIME
    (every pair must be counted); ``max_per_center`` is the documented
    100-TB knob for bounding that work when an approximate score is
    acceptable (capped centers are counted and logged by callers)."""
    order = np.lexsort((x, w))
    w, x = w[order], x[order]
    keep = np.ones(len(w), dtype=bool)
    keep[1:] = (w[1:] != w[:-1]) | (x[1:] != x[:-1])
    w, x = w[keep], x[keep]
    uniq, xr = np.unique(x, return_inverse=True)
    xr = xr.astype(np.int64)
    starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
    ends = np.r_[starts[1:], len(w)]

    acc_codes = acc_sums = None
    buf_codes: list = []
    buf_wts: list = []
    buffered = 0
    n_capped = 0

    def flush():
        nonlocal acc_codes, acc_sums, buf_codes, buf_wts, buffered
        if not buf_codes:
            return
        codes = np.concatenate(buf_codes)
        wts = np.concatenate(buf_wts)
        uc, inv = np.unique(codes, return_inverse=True)
        sums = np.zeros(len(uc), np.int64)
        np.add.at(sums, inv, wts)
        if acc_codes is None:
            acc_codes, acc_sums = uc, sums
        else:
            both = np.concatenate([acc_codes, uc])
            bsum = np.concatenate([acc_sums, sums])
            u2, inv2 = np.unique(both, return_inverse=True)
            s2 = np.zeros(len(u2), np.int64)
            np.add.at(s2, inv2, bsum)
            acc_codes, acc_sums = u2, s2
        buf_codes, buf_wts, buffered = [], [], 0

    for s, e in zip(starts, ends):
        nb = xr[s:e]  # sorted unique ranks (lexsort minor key + dedup)
        if max_per_center is not None and len(nb) > max_per_center:
            n_capped += 1
            nb = nb[:max_per_center]
        deg = len(nb)
        if deg < 2:
            continue
        wt = 1 if weight_fn is None else int(weight_fn(deg))
        if deg * (deg - 1) // 2 <= chunk_pairs:
            # common case: the whole center fits one bounded allocation
            iu, iv = np.triu_indices(deg, k=1)
            buf_codes.append((nb[iu] << np.int64(32)) | nb[iv])
            buf_wts.append(np.full(len(iu), wt, np.int64))
            buffered += len(iu)
            if buffered >= chunk_pairs:
                flush()
            continue
        # hub center: emit the upper triangle in row strips of
        # <= ~chunk_pairs pairs each (strip rows r0..r1-1 pair with all
        # later neighbors), flushing between strips — identical pair
        # multiset, bounded peak allocation
        step = max(1, chunk_pairs // (deg - 1))
        for r0 in range(0, deg - 1, step):
            r1 = min(r0 + step, deg - 1)
            rows = np.arange(r0, r1, dtype=np.int64)
            counts = deg - 1 - rows
            total = int(counts.sum())
            rep_rows = np.repeat(rows, counts)
            offs = np.cumsum(counts) - counts
            jj = (np.arange(total, dtype=np.int64)
                  - np.repeat(offs, counts) + rep_rows + 1)
            buf_codes.append((nb[rep_rows] << np.int64(32)) | nb[jj])
            buf_wts.append(np.full(total, wt, np.int64))
            buffered += total
            if buffered >= chunk_pairs:
                flush()
    flush()
    if acc_codes is None:
        z = np.zeros(0, np.int64)
        return z, z, z, n_capped
    return (uniq[acc_codes >> np.int64(32)],
            uniq[acc_codes & np.int64(0xFFFFFFFF)],
            acc_sums, n_capped)


def _qualify(subj_col, conv_col) -> np.ndarray:
    """Blank-node labels are conversation-scoped: qualify them with conv_id
    so '_:c14n0' in two conversations stays two graph nodes."""
    subj = np.asarray(subj_col, dtype=object)
    conv = np.asarray(conv_col, dtype=object)
    is_bnode = np.char.startswith(subj.astype(str), "_:")
    out = subj.copy()
    if is_bnode.any():
        out[is_bnode] = conv[is_bnode] + "|" + subj[is_bnode]
    return out


def triples_to_edges(triples_ds):
    """Entity->entity edge list from a triples Dataset: subject -> object
    for node-valued objects (IRI / blank node), quarantine graph excluded."""

    def edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.is_in(batch["obj_kind"],
                     value_set=pa.array(["IRI", "blank node"])),
            pc.not_equal(batch["graph"], "@error"),
        )
        batch = batch.filter(keep)
        conv = batch["conv_id"].to_pylist()
        src = _qualify(batch["subj"].to_pylist(), conv)
        dst = _qualify(batch["obj_value"].to_pylist(), conv)
        return pa.table({
            "src": pa.array(src, pa.string()),
            "dst": pa.array(dst, pa.string()),
        })

    return triples_ds.map_batches(edges, batch_format="pyarrow")


def entity_degrees(triples_ds):
    """(entity, out_degree, in_degree) over the KG edge list. Entities are
    unbounded keys, so the one exchange is Ray's hash aggregate (it spills);
    per-batch value_counts pre-aggregate first, so the shuffle moves one row
    per distinct entity per block."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df["src"].value_counts()
        inn = df["dst"].value_counts()
        g = pd.concat(
            [out.rename("out_p"), inn.rename("in_p")], axis=1
        ).fillna(0).reset_index(names="entity")
        return pa.table({
            "entity": pa.array(g["entity"].astype(str), pa.string()),
            "out_p": pa.array(g["out_p"].astype("int64"), pa.int64()),
            "in_p": pa.array(g["in_p"].astype("int64"), pa.int64()),
        })

    partials = triples_to_edges(triples_ds).map_batches(
        partial, batch_format="pyarrow"
    )
    return partials.groupby("entity").aggregate(
        Sum("out_p", alias_name="out_degree"),
        Sum("in_p", alias_name="in_degree"),
    )


def degree_histogram(triples_ds, num_partitions: int | None = None):
    """(degree, n_entities) histogram of total degree — bounded cardinality,
    so the second exchange is the bucketed combine."""
    from .common import bucketed_sum_combine

    def hist_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        deg = (df["out_degree"] + df["in_degree"]).astype("int64")
        g = deg.value_counts().reset_index()
        g.columns = ["degree", "n_entities"]
        return pa.table({
            "degree": pa.array(g["degree"].astype("int64"), pa.int64()),
            "n_entities": pa.array(
                g["n_entities"].astype("int64"), pa.int64()
            ),
        })

    partials = entity_degrees(triples_ds).map_batches(
        hist_partial, batch_format="pyarrow"
    )
    return bucketed_sum_combine(
        partials, keys=["degree"], sum_cols=["n_entities"],
        schema=pa.schema(
            [("degree", pa.int64()), ("n_entities", pa.int64())]
        ),
        num_partitions=num_partitions,
    )


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

_RANK_SCHEMA = pa.schema([
    ("node", pa.string()), ("rank", pa.float64()), ("out_deg", pa.int64()),
])
_CONTRIB_SCHEMA = pa.schema([
    ("node", pa.string()), ("contrib", pa.float64()), ("part", pa.int32()),
])


def _crc32_bucketer(P: int):
    import zlib

    def bucket_str(vals) -> np.ndarray:
        return np.fromiter(
            (zlib.crc32(v.encode()) % P for v in vals),
            dtype=np.int32, count=len(vals),
        )

    return bucket_str


def pagerank(edges_ds, damping: float = 0.85, n_iter: int = 10,
             num_partitions: int | None = None,
             broadcast_threshold: int = 2_000_000,
             force_path: str | None = None):
    """Damped PageRank over a (src, dst) string edge Dataset, dangling mass
    redistributed uniformly. Returns (node, rank) with sum(rank) == 1.
    Path selection is cost-based on the (already materialized, free-to-
    count) node table; ``force_path`` ("broadcast" | "join") pins it for
    parity tests."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)
    P = num_partitions
    bucket_str = _crc32_bucketer(P)

    edges = edges_ds.materialize()

    # node table with out-degrees (dangling nodes keep out_deg = 0)
    def node_partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df["src"].value_counts().rename("out_p")
        inn = df["dst"].value_counts().rename("in_p")
        g = pd.concat([out, inn], axis=1).fillna(0).reset_index(names="node")
        return pa.table({
            "node": pa.array(g["node"].astype(str), pa.string()),
            "out_p": pa.array(g["out_p"].astype("int64"), pa.int64()),
            "part": pa.array(bucket_str(g["node"].tolist()), pa.int32()),
        })

    def node_merge(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([("node", pa.string()), ("out_deg", pa.int64())])
        if len(df) == 0:
            return sch.empty_table()
        g = df.groupby("node", as_index=False)["out_p"].sum()
        return pa.table({
            "node": pa.array(g["node"].astype(str), pa.string()),
            "out_deg": pa.array(g["out_p"].astype("int64"), pa.int64()),
        }, schema=sch)

    nodes = (
        edges.map_batches(node_partials, batch_format="pyarrow")
        .groupby("part").map_groups(node_merge, batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd

        # a Dataset like every other path, not a bare pa.Table — callers
        # use Dataset-only APIs (.count/.materialize) on the result
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64()),
        }))

    path = force_path or (
        "broadcast" if n_nodes <= broadcast_threshold else "join"
    )
    if path == "broadcast":
        return _pagerank_broadcast(
            edges, nodes, n_nodes, damping, n_iter, P, bucket_str
        )
    return _pagerank_join(
        edges, nodes, n_nodes, damping, n_iter, P, bucket_str
    )


def _pagerank_broadcast(edges, nodes, n_nodes, damping, n_iter, P,
                        bucket_str):
    """One exchange per iteration: rank/out_deg weights broadcast via
    ray.put, the per-edge-block contribution partials fold through one
    bucketed crc32(dst) combine, and the node-sized result returns to the
    driver for the next broadcast. Valid exactly when the rank vector fits
    driver memory (the caller's threshold)."""
    import ray
    import ray.data as rd

    node_df = nodes.to_pandas().sort_values("node").reset_index(drop=True)
    rank = np.full(n_nodes, 1.0 / n_nodes)
    out_deg = node_df["out_deg"].to_numpy(np.int64)
    pos = pd.Series(np.arange(n_nodes), index=node_df["node"])
    base = (1.0 - damping) / n_nodes

    def combine(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([("node", pa.string()), ("contrib", pa.float64())])
        if len(df) == 0:
            return sch.empty_table()
        df = df.sort_values(["node", "contrib"], kind="mergesort")
        g = df.groupby("node", as_index=False)["contrib"].sum()
        return pa.table({
            "node": pa.array(g["node"].astype(str), pa.string()),
            "contrib": pa.array(g["contrib"].to_numpy(np.float64)),
        }, schema=sch)

    for _ in range(n_iter):
        w = pd.Series(
            np.where(out_deg > 0, rank / np.maximum(out_deg, 1), 0.0),
            index=node_df["node"],
        )
        ref = ray.put(w)

        def contrib_partial(df: pd.DataFrame) -> pa.Table:
            wts = ray.get(ref)
            df = df.assign(val=df["src"].map(wts).to_numpy(np.float64))
            df = df.sort_values(["dst", "src"], kind="mergesort")
            g = df.groupby("dst", as_index=False)["val"].sum()
            return pa.table({
                "node": pa.array(g["dst"].astype(str), pa.string()),
                "contrib": pa.array(g["val"].to_numpy(np.float64)),
                "part": pa.array(bucket_str(g["dst"].tolist()), pa.int32()),
            }, schema=_CONTRIB_SCHEMA)

        got = (
            edges.map_batches(contrib_partial, batch_format="pandas")
            .groupby("part")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
        contrib = np.zeros(n_nodes)
        if "node" in got.columns and len(got):
            contrib[pos[got["node"]].to_numpy()] = got["contrib"].to_numpy()
        dangling = float(rank[out_deg == 0].sum())
        rank = base + damping * (contrib + dangling / n_nodes)

    return rd.from_pandas(
        pd.DataFrame({"node": node_df["node"], "rank": rank})
    )


def _pagerank_join(edges, nodes, n_nodes, damping, n_iter, P, bucket_str):
    """Fully distributed path: per iteration, ONE bucketed crc32(src)
    exchange joins the rank table to the pre-bucketed edge list and emits
    per-dst contribution partials; ONE bucketed crc32(node) exchange folds
    partials with the static node table into the next rank vector. The rank
    table is node-sized and materialized per round (lineage cut); the
    driver sees only the dangling-mass scalar."""

    def tag_static_edges(t: pa.Table) -> pa.Table:
        src = t["src"].to_pylist()
        return pa.table({
            "key": t["src"].cast(pa.string()),
            "dst": t["dst"].cast(pa.string()),
            "val": pa.array(np.zeros(t.num_rows, np.float64)),
            "is_rank": pa.array(np.zeros(t.num_rows, np.int8)),
            "part": pa.array(bucket_str(src), pa.int32()),
        })

    tagged_edges = edges.map_batches(
        tag_static_edges, batch_format="pyarrow"
    ).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "node": t["node"],
            "rank": pa.array(np.full(n, 1.0 / n_nodes)),
            "out_deg": t["out_deg"].cast(pa.int64()),
        }, schema=_RANK_SCHEMA)

    ranks = nodes.map_batches(
        init_ranks, batch_format="pyarrow"
    ).materialize()
    base = (1.0 - damping) / n_nodes

    def tag_ranks(t: pa.Table) -> pa.Table:
        """Rank rows keyed by node for the edge join; dangling nodes (no
        outgoing edges) contribute nothing here — their mass is the
        scalar."""
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t["out_deg"], 0))
        node = t["node"].to_pylist()
        contrib = (
            np.asarray(t["rank"].to_numpy(zero_copy_only=False))
            / np.asarray(t["out_deg"].to_numpy(zero_copy_only=False))
        )
        return pa.table({
            "key": pa.array(node, pa.string()),
            "dst": pa.array([""] * len(node), pa.string()),
            "val": pa.array(contrib, pa.float64()),
            "is_rank": pa.array(np.ones(len(node), np.int8)),
            "part": pa.array(bucket_str(node), pa.int32()),
        })

    _contrib_plain = pa.schema([
        ("node", pa.string()), ("contrib", pa.float64()),
    ])

    def contribute(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "is_rank" not in df.columns:
            return _contrib_plain.empty_table()
        r = df[df["is_rank"] == 1][["key", "val"]]
        e = df[df["is_rank"] == 0][["key", "dst"]]
        m = e.merge(r, on="key")
        if len(m) == 0:
            return _contrib_plain.empty_table()
        # deterministic float sums: sort before grouping
        m = m.sort_values(["dst", "key"], kind="mergesort")
        g = m.groupby("dst", as_index=False)["val"].sum()
        return pa.table({
            "node": pa.array(g["dst"].astype(str), pa.string()),
            "contrib": pa.array(g["val"].to_numpy(np.float64)),
        }, schema=_contrib_plain)

    def tag_nodes(t: pa.Table) -> pa.Table:
        """Static node rows ride the second exchange so every node gets a
        next-round rank even with zero inbound contributions. -1 SENTINELS
        (not nulls) in unused cells: a nullable int64 converts to float64
        in pandas and rounds ids above 2^53 (the connected_components
        finding)."""
        node = t["node"].to_pylist()
        return pa.table({
            "node": pa.array(node, pa.string()),
            "contrib": pa.array(np.zeros(len(node), np.float64)),
            "out_deg": t["out_deg"].cast(pa.int64()),
            "is_node": pa.array(np.ones(len(node), np.int8)),
            "part": pa.array(bucket_str(node), pa.int32()),
        })

    def tag_contribs(t: pa.Table) -> pa.Table:
        node = t["node"].to_pylist()
        return pa.table({
            "node": pa.array(node, pa.string()),
            "contrib": t["contrib"].cast(pa.float64()),
            "out_deg": pa.array(np.full(len(node), -1, np.int64)),
            "is_node": pa.array(np.zeros(len(node), np.int8)),
            "part": pa.array(bucket_str(node), pa.int32()),
        })

    for _ in range(n_iter):
        # dangling mass: scalar streamed from the node-sized rank table
        dang_df = ranks.map_batches(
            lambda df: pd.DataFrame({
                "d": [float(df.loc[df["out_deg"] == 0, "rank"].sum())]
            }),
            batch_format="pandas",
        ).to_pandas()
        dangling = float(dang_df["d"].sum()) if "d" in dang_df.columns else 0.0
        add = base + damping * dangling / n_nodes

        contribs = (
            tagged_edges.union(
                ranks.map_batches(tag_ranks, batch_format="pyarrow")
            )
            .groupby("part")
            .map_groups(contribute, batch_format="pandas")
        )

        def next_rank(df: pd.DataFrame, _add=add) -> pa.Table:
            if len(df) == 0 or "is_node" not in df.columns:
                return _RANK_SCHEMA.empty_table()
            df = df.sort_values(["node", "contrib"], kind="mergesort")
            g = df.groupby("node", as_index=False).agg(
                contrib=("contrib", "sum"), out_deg=("out_deg", "max")
            )
            return pa.table({
                "node": pa.array(g["node"].astype(str), pa.string()),
                "rank": pa.array(
                    _add + damping * g["contrib"].to_numpy(np.float64)
                ),
                "out_deg": pa.array(
                    g["out_deg"].astype("int64"), pa.int64()
                ),
            }, schema=_RANK_SCHEMA)

        ranks = (
            nodes.map_batches(tag_nodes, batch_format="pyarrow")
            .union(
                contribs.map_batches(tag_contribs, batch_format="pyarrow")
            )
            .groupby("part")
            .map_groups(next_rank, batch_format="pandas")
            .materialize()
        )

    return ranks.drop_columns(["out_deg"])


def pagerank_reference(edges: pd.DataFrame, damping: float = 0.85,
                       n_iter: int = 10) -> pd.DataFrame:
    """Single-process numpy PageRank (the parity oracle for the gate)."""
    nodes = pd.Index(
        pd.unique(pd.concat([edges["src"], edges["dst"]], ignore_index=True))
    ).sort_values()
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    src = edges["src"].map(idx).to_numpy(np.int64)
    dst = edges["dst"].map(idx).to_numpy(np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = rank[out_deg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] / out_deg[src])
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    return pd.DataFrame({"node": nodes, "rank": rank})


def pagerank_check(n_conversations: int = 100, damping: float = 0.85,
                   n_iter: int = 5) -> pd.DataFrame:
    """Gate: distributed PageRank == single-process numpy PageRank on the
    same bounded conversation sample (same shape as kg.kg_parity_check —
    a spot-check harness, not a data path; the driver holds O(sample)
    edges only). Emits typed flags a constant SQL oracle pins."""
    from .kg import build_triples
    from ..sources.transcripts import transcripts_dataset

    triples = build_triples(transcripts_dataset(n_conversations))
    edges_ds = triples_to_edges(triples).materialize()
    got = pagerank(
        edges_ds, damping=damping, n_iter=n_iter
    ).to_pandas().sort_values("node").reset_index(drop=True)
    want = pagerank_reference(
        edges_ds.to_pandas(), damping=damping, n_iter=n_iter
    ).sort_values("node").reset_index(drop=True)
    max_diff = float(np.abs(got["rank"].to_numpy()
                            - want["rank"].to_numpy()).max()) \
        if len(got) == len(want) else float("inf")
    return pd.DataFrame({
        "parity_ok": [int(len(got) == len(want) and max_diff < 1e-9)],
        "rank_sums_to_one": [
            int(abs(float(got["rank"].sum()) - 1.0) < 1e-9)
        ],
    })


# ---------------------------------------------------------------------------
# Basic graph pattern (SPARQL-lite) matching over the triples table
# ---------------------------------------------------------------------------

def bgp_match(triples_ds, patterns, num_partitions: int | None = None):
    """Subject-shared basic-graph-pattern join (the SPARQL BGP core): every
    pattern is {"pred": IRI, "obj": constant-or-None, "capture":
    column-name-or-None}; a subject matches when ALL patterns hold, and
    each capture pattern contributes its object values (cartesian per
    subject across capture legs, standard BGP semantics). Output:
    (conv_id, subj, <capture columns...>).

    Scale shape: ONE map prunes the triples to pattern-relevant rows
    (predicate + constant-object filters applied batch-local, so only
    matching legs leave the scan) and buckets by crc32(subj) % P; the
    multi-way join runs as in-task pandas merges per bucket — no per-key
    Ray groups, no repeated exchanges for extra patterns."""
    import zlib

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    captures = [p["capture"] for p in patterns if p.get("capture")]

    _leg_schema = pa.schema([
        ("conv_id", pa.string()), ("subj", pa.string()),
        ("leg", pa.int8()), ("obj_value", pa.string()),
        ("part", pa.int32()),
    ])

    def legs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        for i, p in enumerate(patterns):
            keep = pc.equal(batch["pred"], p["pred"])
            if p.get("obj") is not None:
                keep = pc.and_(keep, pc.equal(batch["obj_value"], p["obj"]))
            t = batch.filter(keep)
            subj = t["subj"].to_pylist()
            parts = np.fromiter(
                (zlib.crc32(s.encode()) % num_partitions for s in subj),
                dtype=np.int32, count=len(subj),
            )
            outs.append(pa.table({
                "conv_id": t["conv_id"].cast(pa.string()),
                "subj": pa.array(subj, pa.string()),
                "leg": pa.array(np.full(len(subj), i, np.int8)),
                "obj_value": t["obj_value"].cast(pa.string()),
                "part": pa.array(parts, pa.int32()),
            }, schema=_leg_schema))
        return pa.concat_tables(outs)

    out_fields = [("conv_id", pa.string()), ("subj", pa.string())] + [
        (c, pa.string()) for c in captures
    ]
    _out_schema = pa.schema(out_fields)

    def join_legs(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return _out_schema.empty_table()
        base = None
        for i, p in enumerate(patterns):
            li = df[df["leg"] == i]
            if p.get("capture"):
                li = li[["conv_id", "subj", "obj_value"]].rename(
                    columns={"obj_value": p["capture"]}
                )
            else:
                li = li[["conv_id", "subj"]].drop_duplicates()
            base = li if base is None else base.merge(
                li, on=["conv_id", "subj"]
            )
        if base is None or len(base) == 0:
            return _out_schema.empty_table()
        base = base.sort_values(list(base.columns), kind="mergesort")
        return pa.Table.from_pandas(
            base, preserve_index=False
        ).select(_out_schema.names).cast(_out_schema)

    return (
        triples_ds.map_batches(legs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(join_legs, batch_format="pandas")
    )


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def kg_user_turn_mentions(triples_ds, num_partitions: int | None = None):
    """Concrete BGP: every entity a USER turn mentions —
    { ?t rdf:type rayld:Turn . ?t rayld:role "user" . ?t schema:about ?e }
    -> (conv_id, turn, entity)."""
    out = bgp_match(triples_ds, [
        {"pred": _RDF_TYPE, "obj": "https://rayld.dev/vocab#Turn"},
        {"pred": "https://rayld.dev/vocab#role", "obj": "user"},
        {"pred": "http://schema.org/about", "capture": "entity"},
    ], num_partitions=num_partitions)
    return out.map_batches(
        lambda t: t.rename_columns(["conv_id", "turn", "entity"]),
        batch_format="pyarrow",
    )


def entity_cooccurrence(triples_ds, num_partitions: int | None = None,
                        max_entities_per_conv: int = 512):
    """Entity co-occurrence network: for every unordered pair of entities
    mentioned (schema:about) in the same conversation, the number of
    conversations mentioning both.

    Plan (two bucketed exchanges, both bounded):
      1. prune to mention triples at the scan, bucket on hash(conv_id); the
         in-task pandas pass dedups (conv, entity) and emits each
         conversation's sorted within-conv pairs — pair fan-out is capped at
         max_entities_per_conv choose 2 per conversation (capped convs are
         counted in a log line, the embedding_neardup pattern);
      2. pair-count partials ride one bucketed combine keyed (e1, e2) —
         the pair vocabulary is gazetteer-bounded, not corpus-bounded, so
         the combine's in-task groups stay small at any corpus size."""
    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    bucket_str = _crc32_bucketer(num_partitions)

    def mentions(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.equal(batch["pred"], "http://schema.org/about"),
            pc.equal(batch["obj_kind"], "IRI"),
        )
        batch = batch.filter(keep)
        return pa.table({
            "conv_id": batch["conv_id"].cast(pa.string()),
            "entity": batch["obj_value"].cast(pa.string()),
            "part": pa.array(bucket_str(batch["conv_id"].to_pylist()),
                             pa.int32()),
        })

    pair_schema = pa.schema([
        ("e1", pa.string()), ("e2", pa.string()), ("n_convs", pa.int64()),
    ])

    def conv_pairs(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return pair_schema.empty_table()
        df = df[["conv_id", "entity"]].drop_duplicates()
        sizes = df.groupby("conv_id")["entity"].transform("size")
        n_capped = df.loc[sizes > max_entities_per_conv, "conv_id"].nunique()
        if n_capped:
            print(  # no silent caps (the simhash_neardup pattern)
                f"entity_cooccurrence: {n_capped} conversations over "
                f"{max_entities_per_conv} entities dropped from pairing"
            )
        df = df[sizes <= max_entities_per_conv]
        m = df.merge(df, on="conv_id", suffixes=("_1", "_2"))
        m = m[m["entity_1"] < m["entity_2"]]
        g = m.groupby(["entity_1", "entity_2"], as_index=False).size()
        return pa.table({
            "e1": pa.array(g["entity_1"].astype(str), pa.string()),
            "e2": pa.array(g["entity_2"].astype(str), pa.string()),
            "n_convs": pa.array(g["size"].to_numpy(np.int64)),
        }, schema=pair_schema)

    partials = (
        triples_ds.map_batches(mentions, batch_format="pyarrow")
        .groupby("part")
        .map_groups(conv_pairs, batch_format="pandas")
    )
    return bucketed_sum_combine(
        partials, keys=["e1", "e2"], sum_cols=["n_convs"],
        schema=pair_schema,
    )


# ---------------------------------------------------------------------------
# Exact triangle counting (degree-ordered node-iterator)
# ---------------------------------------------------------------------------


def _pair_bucket(num_partitions: int):
    """Vectorized shuffle bucket for (p, q) int64 pair keys — the numpy
    multiply-mix `dedup.bucket_pair` uses (no per-item crc32 loop; this
    runs in the wedge-close hot stage). Same function on both sides of an
    exchange => pair rows and fact rows land in the same bucket."""

    def bucket(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["p"].to_pylist(), dtype=np.int64)
        q = np.asarray(batch["q"].to_pylist(), dtype=np.int64)
        with np.errstate(over="ignore"):
            # numpy % with a positive divisor is non-negative even after
            # signed overflow wrap
            parts = ((p * 1000003 + q) % num_partitions).astype(np.int32)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    return bucket


def _projection_edges(sf_dir: str, event_type: str,
                      num_partitions: int,
                      max_users_per_key: int | None = None,
                      user_mod: int | None = None):
    """Materialized (p, q) p<q edge set of the user projection graph (users
    adjacent when they share a distinct props ``k`` in ``event_type``
    events): one hash(k) exchange generates per-key pairs, one pair-key
    exchange dedups the multiset. Shared by ``user_triangles`` and
    ``user_kcore``.

    ``max_users_per_key`` defaults to None = UNCAPPED, because the
    consumers are SQL/reference-oracled and a silent cap would diverge
    from the capless oracle exactly when a hub key crosses it. A caller
    running at hub-heavy scale opts in explicitly (capped keys are
    logged). Events whose props lack a numeric ``k`` carry no key and
    join nothing (the SQL NULL semantics).

    ``user_mod`` keeps only users with ``user_id % user_mod == 0`` — a
    deterministic node-induced subgraph used by the BENCH variant of the
    CN family (same plan and exchanges at ~1/mod^2 wedge volume); the
    oracled queries leave it None."""
    import json

    import ray.data as rd

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "props"],
    )

    def uk_partial(df: pd.DataFrame) -> pa.Table:
        sel = df[df["event_type"] == event_type]
        if user_mod is not None:
            sel = sel[sel["user_id"] % user_mod == 0]
        # no/invalid props -> no key -> joins nothing (SQL NULL semantics;
        # defaulting to 0 would weld those users into a spurious clique)
        ks = sel["props"].map(
            lambda p: json.loads(p).get("k") if p else None
        )
        sel = sel[ks.notna()]
        ks = ks.dropna().astype("int64")
        g = sel.assign(k=ks).drop_duplicates(["k", "user_id"])
        return pa.table({
            "k": pa.array(g["k"].to_numpy(np.int64)),
            "u": pa.array(g["user_id"].to_numpy(np.int64)),
            "part": pa.array(
                (g["k"].to_numpy(np.int64) % num_partitions).astype(np.int32),
                pa.int32(),
            ),
        })

    pair_sch = pa.schema([("p", pa.int64()), ("q", pa.int64())])

    def key_pairs(df: pd.DataFrame) -> pa.Table:
        ps, qs = [], []
        n_capped = 0
        for _, us in df.groupby("k")["u"]:
            users = np.unique(us.to_numpy(np.int64))
            if max_users_per_key and len(users) > max_users_per_key:
                n_capped += 1
                users = users[:max_users_per_key]
            if len(users) < 2:
                continue
            iu, iv = np.triu_indices(len(users), k=1)
            ps.append(users[iu])
            qs.append(users[iv])
        if n_capped:
            print(f"projection_edges: capped {n_capped} keys "
                  f"at {max_users_per_key} users")
        if not ps:
            return pair_sch.empty_table()
        return pa.table({
            "p": pa.array(np.concatenate(ps)),
            "q": pa.array(np.concatenate(qs)),
        }, schema=pair_sch)

    pair_bucket = _pair_bucket(num_partitions)

    def pair_dedup(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates(["p", "q"])
        return pa.table({
            "p": pa.array(g["p"].to_numpy(np.int64)),
            "q": pa.array(g["q"].to_numpy(np.int64)),
        }, schema=pair_sch)

    return (
        ev.map_batches(uk_partial, batch_format="pandas")
        .groupby("part").map_groups(key_pairs, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("part").map_groups(pair_dedup, batch_format="pandas")
        .materialize()
    )


def _edge_degrees(edges, num_partitions: int):
    """Exact per-node degree table of a (p, q) edge dataset: endpoint-
    explode partials through the bounded combine. Materialized (tiny)."""
    from .common import bucketed_sum_combine

    def endpoint_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            np.asarray(batch["p"].to_pylist(), dtype=np.int64),
            np.asarray(batch["q"].to_pylist(), dtype=np.int64),
        ])
        un, cn = np.unique(nodes, return_counts=True)
        return pa.table({
            "node": pa.array(un), "d": pa.array(cn.astype(np.int64)),
        })

    return bucketed_sum_combine(
        edges.map_batches(endpoint_partial, batch_format="pyarrow"),
        keys=["node"], sum_cols=["d"],
        schema=pa.schema([("node", pa.int64()), ("d", pa.int64())]),
        num_partitions=num_partitions,
    ).materialize()


def user_triangles(sf_dir: str, event_type: str = "purchase",
                   num_partitions: int | None = None,
                   max_users_per_key: int | None = None):
    """Exact triangle/wedge census of the user projection graph — users are
    adjacent when they share a distinct props ``k`` in ``event_type``
    events. The degree-ORDERED node-iterator (MapReduce triangle counting,
    Cohen 2009 lineage): orienting every edge from its (degree, id)-smaller
    endpoint bounds per-node wedge fan-out by O(sqrt(m)) regardless of hub
    degree, which is what keeps the closing exchange's payload near-linear
    on skewed graphs.

    Plan (bucketed exchanges only, nothing node- or edge-sized on the
    driver):
      1. (k, user) dedup partials -> one hash(k) exchange -> per-key
         sorted user pairs (fan-out capped per key with a log line);
      2. pair-key exchange dedups the edge multiset -> edge set E
         (materialized: reused for degrees, orientation, closing);
      3. endpoint-explode partials -> bounded combine = exact degrees;
         attached to E by TWO bucketed hash joins (deg of u, deg of v);
      4. wedge pass: bucket oriented edges by src; each task emits the
         CLOSING queries (a, b) for every out-neighbor pair; union with E
         tagged as facts, one pair-key exchange, in-task set membership
         counts matches = triangles (each triangle closes exactly once:
         its two lowest-ordered edges form the wedge, the third closes).

    Output (one row): n_nodes, n_edges, n_wedges (undirected, sum of
    C(deg,2) — the clustering-coefficient denominator), n_triangles."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    edges = _projection_edges(
        sf_dir, event_type, num_partitions, max_users_per_key
    )
    n_edges = edges.count()
    degs = _edge_degrees(edges, num_partitions)
    pair_bucket = _pair_bucket(num_partitions)

    wed = degs.map_batches(
        lambda b: pa.table({"w": pa.array([
            int((np.asarray(b["d"].to_pylist(), dtype=np.int64)
                 * (np.asarray(b["d"].to_pylist(), dtype=np.int64) - 1)
                 // 2).sum())
        ], pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()
    n_nodes = degs.count()
    n_wedges = int(wed["w"].sum()) if len(wed) else 0

    # attach degrees to both endpoints: two bucketed hash joins
    def deg_side(name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch["node"],
                "p": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "q": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "d": batch["d"],
                "is_deg": pa.array(np.ones(batch.num_rows, np.int8)),
            })
        return fn

    def edge_as(key: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch[key],
                "p": batch["p"], "q": batch["q"],
                "d": pa.array(np.zeros(batch.num_rows, np.int64)),
                "is_deg": pa.array(np.zeros(batch.num_rows, np.int8)),
            })
        return fn

    from ..pipelines.dedup import _bucketed_hash_join

    def merge_deg(out_col: str):
        def fn(df: pd.DataFrame) -> pa.Table:
            dmap = df[df["is_deg"] == 1].set_index("node")["d"]
            e = df[df["is_deg"] == 0]
            return pa.table({
                "p": pa.array(e["p"].to_numpy(np.int64)),
                "q": pa.array(e["q"].to_numpy(np.int64)),
                out_col: pa.array(
                    e["node"].map(dmap).to_numpy(np.int64)
                ),
            })
        return fn

    j1 = _bucketed_hash_join(
        edges.map_batches(edge_as("p"), batch_format="pyarrow"),
        degs.map_batches(deg_side("p"), batch_format="pyarrow"),
        key="node", num_partitions=num_partitions, merge_fn=merge_deg("dp"),
    )

    def edge_as_q(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["q"], "p": batch["p"], "q": batch["q"],
            "dp": batch["dp"],
            "d": pa.array(np.zeros(batch.num_rows, np.int64)),
            "is_deg": pa.array(np.zeros(batch.num_rows, np.int8)),
        })

    def deg_side_q(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "p": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "q": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "dp": pa.array(np.zeros(batch.num_rows, np.int64)),
            "d": batch["d"],
            "is_deg": pa.array(np.ones(batch.num_rows, np.int8)),
        })

    def merge_deg_q(df: pd.DataFrame) -> pa.Table:
        dmap = df[df["is_deg"] == 1].set_index("node")["d"]
        e = df[df["is_deg"] == 0]
        p = e["p"].to_numpy(np.int64)
        q = e["q"].to_numpy(np.int64)
        dp = e["dp"].to_numpy(np.int64)
        dq = e["node"].map(dmap).to_numpy(np.int64)
        # orient from the (degree, id)-smaller endpoint
        fwd = (dp < dq) | ((dp == dq) & (p < q))
        return pa.table({
            "src": pa.array(np.where(fwd, p, q)),
            "dst": pa.array(np.where(fwd, q, p)),
        })

    oriented = _bucketed_hash_join(
        j1.map_batches(edge_as_q, batch_format="pyarrow"),
        degs.map_batches(deg_side_q, batch_format="pyarrow"),
        key="node", num_partitions=num_partitions, merge_fn=merge_deg_q,
    ).materialize()

    def src_bucket(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"].to_pylist(), dtype=np.int64)
        return batch.append_column(
            "part", pa.array((s % num_partitions).astype(np.int32), pa.int32())
        )

    probe_sch = pa.schema([
        ("p", pa.int64()), ("q", pa.int64()), ("n", pa.int64()),
        ("is_edge", pa.int8()),
    ])

    def wedges(df: pd.DataFrame) -> pa.Table:
        # pre-aggregated closing queries: (a, b, wedge multiplicity) —
        # the vectorized pair-sum helper replaces both the per-center
        # pandas loop and the row-per-wedge probe payload (a pair probed
        # by many wedges crosses the wire ONCE with its count)
        p, q, sums, _ = _wedge_pair_sums(
            df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64)
        )
        return pa.table({
            "p": pa.array(p),
            "q": pa.array(q),
            "n": pa.array(sums),
            "is_edge": pa.array(np.zeros(len(p), np.int8)),
        }, schema=probe_sch)

    def edge_fact(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p": batch["p"], "q": batch["q"],
            "n": pa.array(np.zeros(batch.num_rows, np.int64)),
            "is_edge": pa.array(np.ones(batch.num_rows, np.int8)),
        }, schema=probe_sch)

    def close_count(df: pd.DataFrame) -> pa.Table:
        # rank-encode (p, q) within the bucket, then one sorted-membership
        # probe (searchsorted) instead of a Python set + per-wedge loop
        p = df["p"].to_numpy(np.int64)
        q = df["q"].to_numpy(np.int64)
        uniq, inv = np.unique(np.concatenate([p, q]), return_inverse=True)
        inv = inv.astype(np.int64)
        codes = (inv[:len(p)] << np.int64(32)) | inv[len(p):]
        is_edge = df["is_edge"].to_numpy(np.int8) == 1
        facts = np.sort(codes[is_edge])
        probes, wts = codes[~is_edge], df["n"].to_numpy(np.int64)[~is_edge]
        pos = np.searchsorted(facts, probes)
        pos = np.minimum(pos, max(len(facts) - 1, 0))
        hit = (facts[pos] == probes) if len(facts) else np.zeros(
            len(probes), dtype=bool
        )
        n = int(wts[hit].sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    # breaker between the chained all-to-alls (see user_common_neighbors)
    probes = (
        oriented.map_batches(src_bucket, batch_format="pyarrow")
        .groupby("part").map_groups(wedges, batch_format="pandas")
    ).materialize()
    tri = (
        probes.union(edges.map_batches(edge_fact, batch_format="pyarrow"))
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("part").map_groups(close_count, batch_format="pandas")
        .to_pandas()
    )
    n_tri = int(tri["n"].sum()) if len(tri) else 0

    return pd.DataFrame({
        "n_nodes": [n_nodes], "n_edges": [n_edges],
        "n_wedges": [n_wedges], "n_triangles": [n_tri],
    }).astype("int64")


def user_kcore(sf_dir: str, k: int = 100, event_type: str = "purchase",
               num_partitions: int | None = None,
               max_users_per_key: int = 4096, max_rounds: int = 100):
    """k-core of the user projection graph: iterative peeling — drop every
    node whose remaining degree is < k, recompute, repeat to fixpoint.
    The k-core is the canonical "dense-enough subgraph" filter (community
    seeds, spam-ring detection over the co-engagement graph).

    Distributed rounds over the materialized edge set: per round, exact
    degrees (endpoint partials -> bounded combine), then the edge list is
    SEMI-joined against the surviving nodes on both endpoints (the
    `_bucketed_hash_join` plan — the victim set is never broadcast and
    nothing node-sized reaches the driver; the loop scalar is the victim
    COUNT, the connected-components convergence pattern). Round count is
    bounded by the peeling depth (dense cores converge in a few rounds; a
    chain degenerates to O(n) — ``max_rounds`` caps it with a loud error,
    no silent stop).

    Output: (node, core_degree) for every node in the k-core, where
    core_degree is the node's degree WITHIN the core (>= k by
    definition)."""
    from .common import cluster_partitions
    from .dedup import _bucketed_hash_join

    if num_partitions is None:
        num_partitions = cluster_partitions()

    edges = _projection_edges(
        sf_dir, event_type, num_partitions, max_users_per_key
    )
    deg_sch = pa.schema([("node", pa.int64()), ("d", pa.int64())])

    for _ in range(max_rounds):
        degs = _edge_degrees(edges, num_partitions)
        victim_partials = degs.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int((np.asarray(t["d"].to_pylist(),
                                 dtype=np.int64) < k).sum())],
                pa.int64())}),
            batch_format="pyarrow",
        ).to_pandas()  # one partial row per block — bounded
        n_victims = int(victim_partials["n"].sum()) \
            if "n" in victim_partials.columns else 0
        if n_victims == 0:
            break
        def surv_filter(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.greater_equal(t["d"], k)).select(["node", "d"])

        survivors = degs.map_batches(surv_filter, batch_format="pyarrow")

        def _semi(endpoint: str):
            def edge_side(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "node": batch[endpoint],
                    "p": batch["p"], "q": batch["q"],
                    "is_surv": pa.array(
                        np.zeros(batch.num_rows, np.int8), pa.int8()),
                })

            def surv_side(batch: pa.Table) -> pa.Table:
                return pa.table({
                    "node": batch["node"],
                    "p": pa.array(np.full(batch.num_rows, -1, np.int64)),
                    "q": pa.array(np.full(batch.num_rows, -1, np.int64)),
                    "is_surv": pa.array(
                        np.ones(batch.num_rows, np.int8), pa.int8()),
                })

            def keep(df: pd.DataFrame) -> pa.Table:
                sch = pa.schema([("p", pa.int64()), ("q", pa.int64())])
                if "node" not in df.columns:  # schema-less empty group
                    return sch.empty_table()
                have = set(df.loc[df["is_surv"] == 1, "node"])
                e = df[df["is_surv"] == 0]
                e = e[e["node"].isin(have)]
                return pa.table({
                    "p": pa.array(e["p"].to_numpy(np.int64)),
                    "q": pa.array(e["q"].to_numpy(np.int64)),
                }, schema=sch)

            return edge_side, surv_side, keep

        cur = edges
        for ep in ("p", "q"):
            edge_side, surv_side, keep = _semi(ep)
            cur = _bucketed_hash_join(
                cur.map_batches(edge_side, batch_format="pyarrow"),
                survivors.map_batches(surv_side, batch_format="pyarrow"),
                key="node", num_partitions=num_partitions, merge_fn=keep,
            )
        edges = cur.materialize()
        if edges.count() == 0:
            break
    else:
        raise RuntimeError(
            f"user_kcore: no fixpoint after {max_rounds} rounds "
            f"(peeling depth exceeds the cap; raise max_rounds)"
        )

    final = _edge_degrees(edges, num_partitions)
    return final.map_batches(
        lambda t: pa.table({
            "node": t["node"], "core_degree": t["d"],
        }, schema=pa.schema([
            ("node", pa.int64()), ("core_degree", pa.int64()),
        ])),
        batch_format="pyarrow",
    )


def kcore_reference(edge_list, k: int):
    """Single-process peel with identical semantics (the parity oracle):
    returns {node: within-core degree} of the k-core."""
    adj = {}
    for p, q in edge_list:
        adj.setdefault(p, set()).add(q)
        adj.setdefault(q, set()).add(p)
    while True:
        victims = [n for n, nb in adj.items() if len(nb) < k]
        if not victims:
            break
        for n in victims:
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
    return {n: len(nb) for n, nb in adj.items()}


def user_kcore_check(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Gate: distributed peel == single-process peel on the same edges
    (exact node set and within-core degrees), and every surviving degree
    is >= k."""
    import json

    got = user_kcore(sf_dir, k=k).to_pandas()
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "props"],
    )
    sel = ev[ev["event_type"] == "purchase"]
    # null/missing props carry no key — the pipeline's SQL NULL semantics
    ks = sel["props"].map(lambda p: json.loads(p).get("k") if p else None)
    sel = sel[ks.notna()]
    edges = set()
    for _, us in sel.assign(k=ks.dropna()).groupby("k")["user_id"]:
        u = sorted(set(us))
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                edges.add((u[i], u[j]))
    want = kcore_reference(edges, k)
    # an all-empty Ray dataset to_pandas()es to a COLUMN-LESS frame
    got_map = (
        dict(zip(got["node"], got["core_degree"]))
        if "node" in got.columns else {}
    )
    return pd.DataFrame({
        "parity_ok": [int(got_map == {n: d for n, d in want.items()})],
        "all_degrees_ge_k": [
            int(all(d >= k for d in got_map.values())) if got_map else 1
        ],
    })


def user_common_neighbors(sf_dir: str, event_type: str = "purchase",
                          num_partitions: int | None = None,
                          max_neighbors_per_node: int | None = None):
    """Link prediction by common-neighbor counting over the user projection
    graph: for every NON-adjacent user pair (u, v), the number of shared
    neighbors — the classic exact link-prediction score (Adamic-Adar's
    integer-exact little sibling, chosen so the DuckDB oracle matches
    bit-for-bit with no transcendental-float drift).

    Plan (bucketed exchanges only):
      1. reuse the materialized edge set (``_projection_edges``);
      2. explode both directions -> hash(center) exchange -> each task
         emits per-center neighbor pairs (sorted unique => u < v) and
         pre-aggregates (u, v) partial counts in-task;
      3. union with the edge set tagged as facts -> one pair-key exchange
         -> in-task sum + drop pairs that are themselves edges.

    Per-center fan-out is C(deg, 2) — inherent to the score, not the plan.
    ``max_neighbors_per_node`` defaults to None = UNCAPPED because the
    result is SQL-oracled (same contract as ``_projection_edges``); a
    hub-heavy caller opts in explicitly (capped centers are logged)."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    edges = _projection_edges(sf_dir, event_type, num_partitions)
    return _common_neighbor_counts(
        edges, num_partitions, max_neighbors_per_node
    )


def user_common_neighbors_bench(sf_dir: str, user_mod: int = 3,
                                event_type: str = "purchase",
                                num_partitions: int | None = None):
    """BENCH-tracked small-sample CN (verdict-r4 item 5): the exact
    user_common_neighbors plan — explode, rank-encoded wedge-pair
    reduction, the materialize breaker between the two all-to-alls, the
    pair-key exchange — over the deterministic ``user_id % user_mod == 0``
    node-induced subgraph (~1/mod^2 of the full wedge volume), so
    regressions in the breaker/encoding wins show up in BENCH directly
    instead of only in the sf0.1 full gate."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    edges = _projection_edges(
        sf_dir, event_type, num_partitions, user_mod=user_mod
    )
    return _common_neighbor_counts(edges, num_partitions)


def _common_neighbor_counts(edges, num_partitions: int,
                            max_neighbors_per_node: int | None = None,
                            keep: str = "nonedges"):
    """Shared core of the link-prediction family: (u, v) pairs of a
    materialized (p, q) edge set with their exact common-neighbor count.
    ``keep="nonedges"`` (default) returns the NON-adjacent pairs — the
    ``user_common_neighbors`` plan, also feeding the Jaccard score;
    ``keep="edges"`` returns the ADJACENT pairs instead, i.e. per-edge
    triangle counts (the clustering-coefficient numerator)."""
    pair_bucket = _pair_bucket(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["p"].to_pylist(), dtype=np.int64)
        q = np.asarray(batch["q"].to_pylist(), dtype=np.int64)
        w = np.concatenate([p, q])
        x = np.concatenate([q, p])
        return pa.table({
            "w": pa.array(w), "x": pa.array(x),
            "part": pa.array(
                (w % num_partitions).astype(np.int32), pa.int32()
            ),
        })

    tagged_sch = pa.schema([
        ("p", pa.int64()), ("q", pa.int64()),
        ("n_common", pa.int64()), ("is_edge", pa.int8()),
    ])

    def center_pairs(df: pd.DataFrame) -> pa.Table:
        p, q, sums, n_capped = _wedge_pair_sums(
            df["w"].to_numpy(np.int64), df["x"].to_numpy(np.int64),
            max_per_center=max_neighbors_per_node,
        )
        if n_capped:
            print(f"user_common_neighbors: capped {n_capped} centers "
                  f"at {max_neighbors_per_node} neighbors")
        return pa.table({
            "p": pa.array(p),
            "q": pa.array(q),
            "n_common": pa.array(sums),
            "is_edge": pa.array(np.zeros(len(p), np.int8)),
        }, schema=tagged_sch)

    # materialize = pipeline breaker between the TWO all-to-alls: fusing
    # the center sort's output straight into the pair sort measured 431s
    # for the pair exchange at sf0.1 (chained AllToAlls thrash the
    # streaming executor); broken apart the same exchange takes ~5s.
    # CLAUDE.md's breaker rule, same mechanics as the minhash candidates.
    wedge_partials = (
        edges.map_batches(explode, batch_format="pyarrow")
        .groupby("part").map_groups(center_pairs, batch_format="pandas")
    ).materialize()

    def edge_facts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "p": batch["p"], "q": batch["q"],
            "n_common": pa.array(np.zeros(n, np.int64)),
            "is_edge": pa.array(np.ones(n, np.int8)),
        }, schema=tagged_sch)

    out_sch = pa.schema([
        ("u", pa.int64()), ("v", pa.int64()), ("n_common", pa.int64()),
    ])

    def combine(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_sch.empty_table()
        g = df.groupby(["p", "q"], as_index=False).agg(
            n_common=("n_common", "sum"), is_edge=("is_edge", "max")
        )
        want_edge = 1 if keep == "edges" else 0
        g = g[(g["is_edge"] == want_edge) & (g["n_common"] > 0)]
        return pa.table({
            "u": pa.array(g["p"].to_numpy(np.int64)),
            "v": pa.array(g["q"].to_numpy(np.int64)),
            "n_common": pa.array(g["n_common"].to_numpy(np.int64)),
        }, schema=out_sch)

    return (
        wedge_partials.union(
            edges.map_batches(edge_facts, batch_format="pyarrow")
        )
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("part").map_groups(combine, batch_format="pandas")
    )


def user_jaccard_similarity(sf_dir: str, event_type: str = "purchase",
                            num_partitions: int | None = None):
    """Neighborhood Jaccard link prediction over the user projection
    graph: for every NON-adjacent pair (u, v) with at least one common
    neighbor, jac = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the third classic of
    the CN / RA / Jaccard trio, in exact integer MICRO-units
    (floor(1e6 * cn / (deg_u + deg_v - cn) + 0.5), pure integer
    arithmetic on engine and oracle, no float drift).

    Plan: the shared ``_common_neighbor_counts`` core (wedge partials via
    the rank-encoded pair reduction, one pair-key exchange), then the two
    endpoint degrees attach via TWO bucketed hash joins over the
    RESULT-sized pair table (the triangles degree-attach shape — the
    node-sized degree table is never broadcast, nothing node-sized
    reaches the driver)."""
    from .common import cluster_partitions
    from .dedup import _bucketed_hash_join

    if num_partitions is None:
        num_partitions = cluster_partitions()

    edges = _projection_edges(sf_dir, event_type, num_partitions)
    cn = _common_neighbor_counts(edges, num_partitions).materialize()
    degs = _edge_degrees(edges, num_partitions)

    def cn_as(key: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "node": batch[key],
                "u": batch["u"], "v": batch["v"],
                "n_common": batch["n_common"],
                "d": pa.array(np.zeros(n, np.int64)),
                "is_deg": pa.array(np.zeros(n, np.int8)),
            }
            if "du" in batch.column_names:
                cols["du"] = batch["du"]
            else:
                cols["du"] = pa.array(np.zeros(n, np.int64))
            return pa.table(cols)
        return fn

    def deg_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "node": batch["node"],
            "u": pa.array(np.full(n, -1, np.int64)),
            "v": pa.array(np.full(n, -1, np.int64)),
            "n_common": pa.array(np.zeros(n, np.int64)),
            "d": batch["d"],
            "is_deg": pa.array(np.ones(n, np.int8)),
            "du": pa.array(np.zeros(n, np.int64)),
        })

    def merge_deg(out_col: str):
        def fn(df: pd.DataFrame) -> pa.Table:
            dmap = df[df["is_deg"] == 1].set_index("node")["d"]
            e = df[df["is_deg"] == 0]
            cols = {
                "u": pa.array(e["u"].to_numpy(np.int64)),
                "v": pa.array(e["v"].to_numpy(np.int64)),
                "n_common": pa.array(e["n_common"].to_numpy(np.int64)),
                out_col: pa.array(e["node"].map(dmap).to_numpy(np.int64)),
            }
            if out_col != "du":
                cols["du"] = pa.array(e["du"].to_numpy(np.int64))
            return pa.table(cols)
        return fn

    # no breaker between these two joins: A/B'd at sf0.1 (124s vs 140s
    # with one) — the chained-sort thrash needs multi-million-row
    # exchanges; at the result-sized 230k rows the breaker only costs
    j1 = _bucketed_hash_join(
        cn.map_batches(cn_as("u"), batch_format="pyarrow"),
        degs.map_batches(deg_side, batch_format="pyarrow"),
        key="node", num_partitions=num_partitions,
        merge_fn=merge_deg("du"),
    )
    j2 = _bucketed_hash_join(
        j1.map_batches(cn_as("v"), batch_format="pyarrow"),
        degs.map_batches(deg_side, batch_format="pyarrow"),
        key="node", num_partitions=num_partitions,
        merge_fn=merge_deg("dv"),
    )

    def score(batch: pa.Table) -> pa.Table:
        cnv = np.asarray(batch["n_common"].to_pylist(), dtype=np.int64)
        du = np.asarray(batch["du"].to_pylist(), dtype=np.int64)
        dv = np.asarray(batch["dv"].to_pylist(), dtype=np.int64)
        den = du + dv - cnv
        jac = (2_000_000 * cnv + den) // (2 * den)
        return pa.table({
            "u": batch["u"], "v": batch["v"],
            "jac_micro": pa.array(jac, pa.int64()),
        })

    return j2.map_batches(score, batch_format="pyarrow")


def user_resource_allocation(sf_dir: str, event_type: str = "purchase",
                             num_partitions: int | None = None):
    """Resource-allocation link prediction (Zhou-Lü-Zhang 2009) over the
    user projection graph: for every NON-adjacent pair (u, v), the score
    sum over common neighbors w of 1/deg(w) — common-neighbor counting
    weighted down by hub centers.

    Scores are exact INTEGER micro-units: each center contributes
    floor(1e6/deg + 0.5) = (2_000_000 + deg) // (2*deg), pure integer
    arithmetic on both the Ray and the DuckDB side, so the oracle matches
    bit-for-bit with no transcendental/float drift (the reason this engine
    ships RA rather than Adamic-Adar's 1/ln(deg) — same model family,
    exactly testable).

    Plan mirrors ``user_common_neighbors`` (bucketed exchanges only): the
    both-direction explode puts ALL of a center's edges in one hash(w)
    task, so deg(w) is exact in-task; per-center triu pairs pre-aggregate
    weighted partials; one pair-key exchange sums and drops pairs that
    are themselves edges."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    edges = _projection_edges(sf_dir, event_type, num_partitions)
    pair_bucket = _pair_bucket(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["p"].to_pylist(), dtype=np.int64)
        q = np.asarray(batch["q"].to_pylist(), dtype=np.int64)
        w = np.concatenate([p, q])
        x = np.concatenate([q, p])
        return pa.table({
            "w": pa.array(w), "x": pa.array(x),
            "part": pa.array(
                (w % num_partitions).astype(np.int32), pa.int32()
            ),
        })

    tagged_sch = pa.schema([
        ("p", pa.int64()), ("q", pa.int64()),
        ("ra_micro", pa.int64()), ("is_edge", pa.int8()),
    ])

    def center_pairs(df: pd.DataFrame) -> pa.Table:
        p, q, sums, _ = _wedge_pair_sums(
            df["w"].to_numpy(np.int64), df["x"].to_numpy(np.int64),
            weight_fn=lambda deg: (2_000_000 + deg) // (2 * deg),
        )
        return pa.table({
            "p": pa.array(p),
            "q": pa.array(q),
            "ra_micro": pa.array(sums),
            "is_edge": pa.array(np.zeros(len(p), np.int8)),
        }, schema=tagged_sch)

    # breaker between the chained all-to-alls (see user_common_neighbors)
    wedge_partials = (
        edges.map_batches(explode, batch_format="pyarrow")
        .groupby("part").map_groups(center_pairs, batch_format="pandas")
    ).materialize()

    def edge_facts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "p": batch["p"], "q": batch["q"],
            "ra_micro": pa.array(np.zeros(n, np.int64)),
            "is_edge": pa.array(np.ones(n, np.int8)),
        }, schema=tagged_sch)

    out_sch = pa.schema([
        ("u", pa.int64()), ("v", pa.int64()), ("ra_micro", pa.int64()),
    ])

    def combine(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_sch.empty_table()
        g = df.groupby(["p", "q"], as_index=False).agg(
            ra_micro=("ra_micro", "sum"), is_edge=("is_edge", "max")
        )
        g = g[(g["is_edge"] == 0) & (g["ra_micro"] > 0)]
        return pa.table({
            "u": pa.array(g["p"].to_numpy(np.int64)),
            "v": pa.array(g["q"].to_numpy(np.int64)),
            "ra_micro": pa.array(g["ra_micro"].to_numpy(np.int64)),
        }, schema=out_sch)

    return (
        wedge_partials.union(
            edges.map_batches(edge_facts, batch_format="pyarrow")
        )
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("part").map_groups(combine, batch_format="pandas")
    )


def user_bfs_depth(sf_dir: str, event_type: str = "purchase",
                   num_partitions: int | None = None,
                   max_rounds: int = 64):
    """Exact BFS depths from a DETERMINISTIC source (the smallest node id)
    over the user projection graph — distributed single-source shortest
    path on an unweighted graph, the iterative-frontier shape
    (``connected_components``' sibling with per-round semantics instead
    of fixpoint labels).

    Per round: (1) one bucketed hash(w) exchange of the both-orientation
    edge set + the frontier expands the frontier's neighborhoods in-task;
    (2) one bucketed hash(node) exchange against the visited set drops
    already-settled nodes. The driver sees only the frontier COUNT (the
    convergence scalar); rounds = source eccentricity. Edges materialize
    once; visited/frontier materialize per round as pipeline breakers
    (slim 1-2 column tables)."""
    import pyarrow as pa
    import ray.data as rd

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)

    edges = _projection_edges(sf_dir, event_type, num_partitions)

    def both(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["p"].to_pylist(), dtype=np.int64)
        q = np.asarray(batch["q"].to_pylist(), dtype=np.int64)
        w = np.concatenate([p, q])
        x = np.concatenate([q, p])
        return pa.table({
            "w": pa.array(w), "x": pa.array(x),
            "is_edge": pa.array(np.ones(len(w), np.int8), pa.int8()),
        })

    adj = edges.map_batches(both, batch_format="pyarrow").materialize()
    # every edge satisfies p < q, so the global min node id appears as a p
    src = int(adj.min("w"))

    fr_sch = pa.schema([
        ("w", pa.int64()), ("x", pa.int64()), ("is_edge", pa.int8()),
    ])
    out_sch = pa.schema([("user_id", pa.int64()), ("depth", pa.int64())])
    nd_sch = pa.schema([("node", pa.int64()), ("is_seen", pa.int8())])

    def bucket_w(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["w"].to_pylist(), dtype=np.int64)
        return batch.append_column(
            "part", pa.array((k % num_partitions).astype(np.int32),
                             pa.int32())
        )

    def bucket_node(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["node"].to_pylist(), dtype=np.int64)
        return batch.append_column(
            "part", pa.array((k % num_partitions).astype(np.int32),
                             pa.int32())
        )

    def expand(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "is_edge" not in df.columns:
            return nd_sch.empty_table()
        in_frontier = set(df.loc[df["is_edge"] == 0, "w"])
        if not in_frontier:
            return nd_sch.empty_table()
        hits = df[(df["is_edge"] == 1) & df["w"].isin(in_frontier)]
        nbrs = np.unique(hits["x"].to_numpy(np.int64))
        return pa.table({
            "node": pa.array(nbrs),
            "is_seen": pa.array(np.zeros(len(nbrs), np.int8), pa.int8()),
        }, schema=nd_sch)

    def unseen(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "is_seen" not in df.columns:
            return pa.schema([("node", pa.int64())]).empty_table()
        seen = set(df.loc[df["is_seen"] == 1, "node"])
        new = df.loc[
            (df["is_seen"] == 0) & ~df["node"].isin(seen), "node"
        ].drop_duplicates()
        return pa.table({"node": pa.array(new.to_numpy(np.int64))})

    frontier = rd.from_arrow(
        pa.table({"node": pa.array([src], pa.int64())})
    ).materialize()
    visited = rd.from_arrow(pa.table({
        "user_id": pa.array([src], pa.int64()),
        "depth": pa.array([0], pa.int64()),
    })).materialize()

    depth = 0
    while depth < max_rounds:
        depth += 1

        def fr_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "w": batch["node"],
                "x": pa.array(np.zeros(n, np.int64)),
                "is_edge": pa.array(np.zeros(n, np.int8), pa.int8()),
            }, schema=fr_sch)

        candidates = (
            adj.union(frontier.map_batches(fr_rows, batch_format="pyarrow"))
            .map_batches(bucket_w, batch_format="pyarrow")
            .groupby("part")
            .map_groups(expand, batch_format="pandas")
        )

        def seen_rows(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "node": batch["user_id"],
                "is_seen": pa.array(np.ones(n, np.int8), pa.int8()),
            }, schema=nd_sch)

        new_frontier = (
            candidates.union(
                visited.map_batches(seen_rows, batch_format="pyarrow")
            )
            .map_batches(bucket_node, batch_format="pyarrow")
            .groupby("part")
            .map_groups(unseen, batch_format="pandas")
            .materialize()
        )
        if new_frontier.count() == 0:
            break

        def depth_rows(batch: pa.Table, d=depth) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "user_id": batch["node"],
                "depth": pa.array(np.full(n, d, np.int64)),
            }, schema=out_sch)

        visited = visited.union(
            new_frontier.map_batches(depth_rows, batch_format="pyarrow")
        ).materialize()
        frontier = new_frontier
    else:
        raise RuntimeError(
            f"user_bfs_depth: no convergence in {max_rounds} rounds"
        )

    return visited


def user_clustering_coefficient(sf_dir: str, event_type: str = "purchase",
                                num_partitions: int | None = None):
    """Per-node local clustering coefficient of the user projection graph
    in exact integer MICRO-units: for every node with degree >= 2,
    ``lcc_micro = (1e6 * 2*T(u)) // (d * (d - 1))`` where T(u) is the
    node's triangle count (truncating division — both operands are
    non-negative, so engine and DuckDB ``//`` agree exactly).

    Plan: the shared ``_common_neighbor_counts`` core with
    ``keep="edges"`` yields per-EDGE triangle counts t(u,v) = |N(u) ∩
    N(v)| (one wedge exchange + one pair-key exchange, both bucketed);
    endpoint-explode sums them into ``2*T(u)`` per node (every triangle
    at u is counted once via each of its two incident edges); a final
    bucketed union-merge LEFT-joins the (tiny, materialized) degree
    table so zero-triangle nodes still appear. Nothing node- or
    edge-sized ever reaches the driver."""
    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    edges = _projection_edges(sf_dir, event_type, num_partitions)
    degs = _edge_degrees(edges, num_partitions)
    # materialize = breaker between the CN core's pair-key exchange and
    # the two downstream exchanges (sum + join): the unbroken chain
    # measured 173-256s at sf0.1/8cpu vs ~75s for the same core under
    # jaccard, which breaks here too (CLAUDE.md chained-all-to-all rule);
    # the edge-CN table is at most edge-sized, cheap to pin
    ecn = _common_neighbor_counts(
        edges, num_partitions, keep="edges"
    ).materialize()

    def explode_t2(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["u"].to_pylist(), dtype=np.int64)
        v = np.asarray(batch["v"].to_pylist(), dtype=np.int64)
        t = np.asarray(batch["n_common"].to_pylist(), dtype=np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([u, v])),
            "t2": pa.array(np.concatenate([t, t])),
        })

    t2 = bucketed_sum_combine(
        ecn.map_batches(explode_t2, batch_format="pyarrow"),
        keys=["node"], sum_cols=["t2"],
        schema=pa.schema([("node", pa.int64()), ("t2", pa.int64())]),
        num_partitions=num_partitions,
    )

    out_sch = pa.schema([
        ("node", pa.int64()), ("d", pa.int64()),
        ("tri", pa.int64()), ("lcc_micro", pa.int64()),
    ])

    def deg_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "node": batch["node"], "d": batch["d"],
            "t2": pa.array(np.zeros(n, np.int64)),
            "is_deg": pa.array(np.ones(n, np.int8)),
        })

    def t2_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "node": batch["node"],
            "d": pa.array(np.zeros(n, np.int64)),
            "t2": batch["t2"],
            "is_deg": pa.array(np.zeros(n, np.int8)),
        })

    def merge_lcc(df: pd.DataFrame) -> pa.Table:
        dd = df[df["is_deg"] == 1]
        dd = dd[dd["d"] >= 2]
        if len(dd) == 0:
            return out_sch.empty_table()
        tmap = df[df["is_deg"] == 0].set_index("node")["t2"]
        node = dd["node"].to_numpy(np.int64)
        d = dd["d"].to_numpy(np.int64)
        t2v = dd["node"].map(tmap).fillna(0).to_numpy(np.int64)
        return pa.table({
            "node": pa.array(node),
            "d": pa.array(d),
            "tri": pa.array(t2v // 2),
            "lcc_micro": pa.array((1_000_000 * t2v) // (d * (d - 1))),
        }, schema=out_sch)

    from .dedup import _bucketed_hash_join

    return _bucketed_hash_join(
        degs.map_batches(deg_rows, batch_format="pyarrow"),
        t2.map_batches(t2_rows, batch_format="pyarrow"),
        key="node", num_partitions=num_partitions, merge_fn=merge_lcc,
    )


def user_degree_assortativity(sf_dir: str, event_type: str = "purchase",
                              num_partitions: int | None = None):
    """Degree assortativity of the user projection graph as ONE row of
    exact integers: over the DIRECTED-both edge list (each undirected
    edge contributes (deg u, deg v) and (deg v, deg u), so the x/y
    marginals coincide and Pearson needs no square root):

        r = (n*s_xy - s_x^2) / (n*s_xx - s_x^2)

    reported as ``assort_micro`` = 1e6 * r with division TRUNCATED
    toward zero (DuckDB ``//`` semantics — the numerator is negative on
    disassortative hub graphs, where Python ``//`` would floor instead;
    the fold runs in unbounded Python ints so the 100-TB moments cannot
    overflow, and the raw moments are emitted alongside).

    Plan: degrees attach to both edge endpoints via two bucketed hash
    joins over the edge table (the ``user_triangles`` degree-attach
    shape), then one integer moment partial per block folds on the
    driver — block-count rows, never anything edge-sized."""
    from .common import cluster_partitions
    from .dedup import _bucketed_hash_join

    if num_partitions is None:
        num_partitions = cluster_partitions()

    edges = _projection_edges(sf_dir, event_type, num_partitions)
    degs = _edge_degrees(edges, num_partitions)

    def edge_as(key: str, carry: str | None):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "node": batch[key],
                "p": batch["p"], "q": batch["q"],
                "d": pa.array(np.zeros(n, np.int64)),
                "is_deg": pa.array(np.zeros(n, np.int8)),
                "dp": (batch[carry] if carry else
                       pa.array(np.zeros(n, np.int64))),
            }
            return pa.table(cols)
        return fn

    def deg_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "node": batch["node"],
            "p": pa.array(np.full(n, -1, np.int64)),
            "q": pa.array(np.full(n, -1, np.int64)),
            "d": batch["d"],
            "is_deg": pa.array(np.ones(n, np.int8)),
            "dp": pa.array(np.zeros(n, np.int64)),
        })

    def merge_deg(out_col: str):
        def fn(df: pd.DataFrame) -> pa.Table:
            dmap = df[df["is_deg"] == 1].set_index("node")["d"]
            e = df[df["is_deg"] == 0]
            return pa.table({
                "p": pa.array(e["p"].to_numpy(np.int64)),
                "q": pa.array(e["q"].to_numpy(np.int64)),
                "dp": pa.array(e["dp"].to_numpy(np.int64)),
                out_col: pa.array(e["node"].map(dmap).to_numpy(np.int64)),
            })
        return fn

    j1 = _bucketed_hash_join(
        edges.map_batches(edge_as("p", None), batch_format="pyarrow"),
        degs.map_batches(deg_side, batch_format="pyarrow"),
        key="node", num_partitions=num_partitions,
        merge_fn=merge_deg("dp2"),
    ).map_batches(
        lambda b: pa.table({"p": b["p"], "q": b["q"], "dp": b["dp2"]}),
        batch_format="pyarrow",
    )
    j2 = _bucketed_hash_join(
        j1.map_batches(edge_as("q", "dp"), batch_format="pyarrow"),
        degs.map_batches(deg_side, batch_format="pyarrow"),
        key="node", num_partitions=num_partitions,
        merge_fn=merge_deg("dq"),
    )

    def moments(batch: pa.Table) -> pa.Table:
        dp = np.asarray(batch["dp"].to_pylist(), dtype=np.int64)
        dq = np.asarray(batch["dq"].to_pylist(), dtype=np.int64)
        return pa.table({
            "n": pa.array([2 * len(dp)], pa.int64()),
            "sx": pa.array([int(dp.sum() + dq.sum())], pa.int64()),
            "sxx": pa.array([int((dp * dp).sum() + (dq * dq).sum())],
                            pa.int64()),
            "sxy": pa.array([2 * int((dp * dq).sum())], pa.int64()),
        })

    parts = j2.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    sx = int(parts["sx"].sum()) if len(parts) else 0
    sxx = int(parts["sxx"].sum()) if len(parts) else 0
    sxy = int(parts["sxy"].sum()) if len(parts) else 0
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    micro = 0 if den == 0 else (
        (abs(1_000_000 * num) // den) * (1 if num >= 0 else -1)
    )
    return pd.DataFrame({
        "n_pairs": [n], "s_x": [sx], "s_xx": [sxx], "s_xy": [sxy],
        "assort_micro": [micro],
    }).astype("int64")


_RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
_SCHEMA_ABOUT = "http://schema.org/about"


def kg_adjacent_turn_entities(triples_ds, num_partitions: int | None = None):
    """PATH basic-graph-pattern over the KG — extends the star-shaped
    ``bgp_match`` (subject-shared legs only) to object→subject joins:

        ?c  rdf:first ?t1 . ?c rdf:rest ?c2 . ?c2 rdf:first ?t2 .
        ?t1 schema:about ?e1 . ?t2 schema:about ?e2

    i.e. entity pairs mentioned in ADJACENT turns (the conversation's
    rdf list cons chain supplies turn adjacency), counted globally.

    Scale shape: every join variable (?c, ?c2 are conversation-scoped
    blank nodes; ?t1/?t2 are per-conversation turn IRIs) lives inside one
    conversation, so ONE hash(conv_id)-bucketed exchange co-locates all
    five legs and the whole path assembles as in-task pandas merges (the
    flagship's conv-shuffle partitioning reused); per-bucket (e1, e2)
    partial counts then collapse through the bounded house combine (the
    entity vocabulary is gazetteer-bounded). Nothing turn- or edge-sized
    reaches the driver."""
    import zlib

    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    leg_sch = pa.schema([
        ("conv_id", pa.string()), ("s", pa.string()), ("o", pa.string()),
        ("leg", pa.int8()), ("part", pa.int32()),
    ])
    _legs = ((_RDF_FIRST, 0), (_RDF_REST, 1), (_SCHEMA_ABOUT, 2))

    def legs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        for pred, tag in _legs:
            t = batch.filter(pc.equal(batch["pred"], pred))
            conv = t["conv_id"].to_pylist()
            parts = np.fromiter(
                (zlib.crc32(c.encode()) % num_partitions for c in conv),
                dtype=np.int32, count=len(conv),
            )
            outs.append(pa.table({
                "conv_id": pa.array(conv, pa.string()),
                "s": t["subj"].cast(pa.string()),
                "o": t["obj_value"].cast(pa.string()),
                "leg": pa.array(np.full(len(conv), tag, np.int8)),
                "part": pa.array(parts, pa.int32()),
            }, schema=leg_sch))
        return pa.concat_tables(outs)

    pair_sch = pa.schema([
        ("e1", pa.string()), ("e2", pa.string()), ("n", pa.int64()),
    ])

    def assemble(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return pair_sch.empty_table()
        f = df[df["leg"] == 0][["conv_id", "s", "o"]]
        r = df[df["leg"] == 1][["conv_id", "s", "o"]]
        a = df[df["leg"] == 2][["conv_id", "s", "o"]]
        adj = r.merge(
            f.rename(columns={"s": "c", "o": "t1"}),
            left_on=["conv_id", "s"], right_on=["conv_id", "c"],
        ).merge(
            f.rename(columns={"s": "c2", "o": "t2"}),
            left_on=["conv_id", "o"], right_on=["conv_id", "c2"],
        )[["conv_id", "t1", "t2"]]
        pairs = adj.merge(
            a.rename(columns={"s": "t1", "o": "e1"}),
            on=["conv_id", "t1"],
        ).merge(
            a.rename(columns={"s": "t2", "o": "e2"}),
            on=["conv_id", "t2"],
        )
        if len(pairs) == 0:
            return pair_sch.empty_table()
        g = pairs.groupby(["e1", "e2"], as_index=False, sort=False).size()
        return pa.table({
            "e1": pa.array(g["e1"], pa.string()),
            "e2": pa.array(g["e2"], pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
        }, schema=pair_sch)

    partials = (
        triples_ds.map_batches(legs, batch_format="pyarrow")
        .groupby("part").map_groups(assemble, batch_format="pandas")
    )
    return bucketed_sum_combine(
        partials, keys=["e1", "e2"], sum_cols=["n"], schema=pair_sch,
        num_partitions=max(8, num_partitions // 4),
    )


_RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
_SCHEMA_RATING = "http://schema.org/ratingValue"
_VOCAB_TOOL_RESULT = "https://rayld.dev/vocab#toolResult"
_COMENTION_PRED = "https://rayld.dev/vocab#comentionedWith"


def _conv_bucketed_legs(triples_ds, preds, num_partitions,
                        with_kind: bool = False):
    """Shared leg extractor for conversation-scoped BGPs: filter the triples
    stream to the pattern predicates, tag each row with its leg index, and
    add a crc32(conv_id) % P bucket column so ONE exchange co-locates every
    leg of a conversation (all join variables in these patterns are
    conversation-scoped — the flagship's conv-shuffle partitioning reused)."""
    import zlib

    fields = [
        ("conv_id", pa.string()), ("s", pa.string()), ("o", pa.string()),
        ("leg", pa.int8()), ("part", pa.int32()),
    ]
    if with_kind:
        fields.insert(3, ("kind", pa.string()))
    leg_sch = pa.schema(fields)

    def legs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        for tag, pred in enumerate(preds):
            t = batch.filter(pc.equal(batch["pred"], pred))
            conv = t["conv_id"].to_pylist()
            parts = np.fromiter(
                (zlib.crc32(c.encode()) % num_partitions for c in conv),
                dtype=np.int32, count=len(conv),
            )
            cols = {
                "conv_id": pa.array(conv, pa.string()),
                "s": t["subj"].cast(pa.string()),
                "o": t["obj_value"].cast(pa.string()),
            }
            if with_kind:
                cols["kind"] = t["obj_kind"].cast(pa.string())
            cols["leg"] = pa.array(np.full(len(conv), tag, np.int8))
            cols["part"] = pa.array(parts, pa.int32())
            outs.append(pa.table(cols, schema=leg_sch))
        return pa.concat_tables(outs)

    return triples_ds.map_batches(legs, batch_format="pyarrow")


def kg_turn_depth_entities(triples_ds, num_partitions: int | None = None):
    """Property-path BGP over the KG — the SPARQL ``rdf:rest*`` transitive
    closure, answering "which entities are mentioned at turn DEPTH d":

        ?head rdf:rest* ?c . ?c rdf:first ?t . ?t schema:about ?e

    with depth(?c) = the path length from the conversation list's head.
    Oracled by a DuckDB ``WITH RECURSIVE`` chain walk over the same triples
    parquet.

    Scale shape: rdf lists never span conversations, so ONE
    hash(conv_id)-bucketed exchange co-locates each chain; inside the task
    depth is computed by numpy POINTER DOUBLING over the child→parent array
    (O(log max_depth) vectorized gathers — no per-cons-cell Python walk),
    then (depth, entity) partials collapse through the bounded house
    combine (depth ≤ the flagship's per-conversation turn cap, entities are
    gazetteer-bounded)."""
    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    out_sch = pa.schema([
        ("depth", pa.int64()), ("e", pa.string()), ("n", pa.int64()),
    ])

    def assemble(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return out_sch.empty_table()
        f = df[df["leg"] == 0][["conv_id", "s", "o"]]
        r = df[df["leg"] == 1][["conv_id", "s", "o"]]
        a = df[df["leg"] == 2][["conv_id", "s", "o"]]
        if len(f) == 0:
            return out_sch.empty_table()
        # conversation-scoped cell ids (bnode labels collide across convs)
        cells = pd.concat([
            f["conv_id"] + "\x00" + f["s"],
            r["conv_id"] + "\x00" + r["s"],
            r["conv_id"] + "\x00" + r["o"],
        ])
        codes, uniq = pd.factorize(cells)
        n_cells = len(uniq)
        nf, nr = len(f), len(r)
        f_idx = codes[:nf]
        r_src = codes[nf:nf + nr]
        r_dst = codes[nf + nr:]
        # child -> parent pointers; heads (and rdf:nil-free roots) self-point
        parent = np.arange(n_cells, dtype=np.int64)
        parent[r_dst] = r_src
        dist = (parent != np.arange(n_cells)).astype(np.int64)
        # pointer doubling: O(log max_depth) rounds, each one numpy gather
        # (64 rounds bound depth 2^64 — a malformed CYCLE, impossible for
        # well-formed rdf lists, stops instead of spinning)
        for _ in range(64):
            gp = parent[parent]
            if np.array_equal(gp, parent):
                break
            dist = dist + dist[parent]
            parent = gp
        depth = pd.DataFrame({"cell": f_idx, "depth": dist[f_idx]})
        ft = f.reset_index(drop=True).assign(depth=depth["depth"])
        pairs = ft.merge(
            a.rename(columns={"s": "o", "o": "e"}), on=["conv_id", "o"],
        )
        if len(pairs) == 0:
            return out_sch.empty_table()
        g = pairs.groupby(["depth", "e"], as_index=False, sort=False).size()
        return pa.table({
            "depth": pa.array(g["depth"].to_numpy(np.int64)),
            "e": pa.array(g["e"], pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
        }, schema=out_sch)

    partials = _conv_bucketed_legs(
        triples_ds, (_RDF_FIRST, _RDF_REST, _SCHEMA_ABOUT), num_partitions,
    ).groupby("part").map_groups(assemble, batch_format="pandas")
    return bucketed_sum_combine(
        partials, keys=["depth", "e"], sum_cols=["n"], schema=out_sch,
        num_partitions=max(8, num_partitions // 4),
    )


def kg_bgp_optional_tool_labels(triples_ds,
                                num_partitions: int | None = None):
    """OPTIONAL basic-graph-pattern (SPARQL left-join semantics) over the
    KG — tool results grouped by node kind, with two optional legs:

        ?t vocab:toolResult ?r .
        OPTIONAL { ?r rdfs:label ?l } OPTIONAL { ?r schema:ratingValue ?v }

    returning per result-node kind (IRI vs blank node) the total result
    count and how many bind each optional variable. Unmatched optionals
    keep the row (left join), matched duplicates multiply it — exactly the
    SQL ``LEFT JOIN`` + ``count(col)`` the oracle runs.

    Scale shape: ?r is conversation-scoped, so ONE conv-bucketed exchange
    co-locates all three legs; per-bucket (kind, counts) partials collapse
    through the bounded house combine (two kinds)."""
    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    out_sch = pa.schema([
        ("r_kind", pa.string()), ("n_results", pa.int64()),
        ("n_labeled", pa.int64()), ("n_rated", pa.int64()),
    ])

    def assemble(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return out_sch.empty_table()
        tr = df[df["leg"] == 0][["conv_id", "o", "kind"]]
        lbl = df[df["leg"] == 1][["conv_id", "s"]].assign(l=1)
        rat = df[df["leg"] == 2][["conv_id", "s"]].assign(v=1)
        if len(tr) == 0:
            return out_sch.empty_table()
        j = tr.merge(
            lbl.rename(columns={"s": "o"}), on=["conv_id", "o"], how="left",
        ).merge(
            rat.rename(columns={"s": "o"}), on=["conv_id", "o"], how="left",
        )
        g = j.groupby("kind", as_index=False).agg(
            n_results=("o", "size"), n_labeled=("l", "count"),
            n_rated=("v", "count"),
        )
        return pa.table({
            "r_kind": pa.array(g["kind"], pa.string()),
            "n_results": pa.array(g["n_results"].to_numpy(np.int64)),
            "n_labeled": pa.array(g["n_labeled"].to_numpy(np.int64)),
            "n_rated": pa.array(g["n_rated"].to_numpy(np.int64)),
        }, schema=out_sch)

    partials = _conv_bucketed_legs(
        triples_ds, (_VOCAB_TOOL_RESULT, _RDFS_LABEL, _SCHEMA_RATING),
        num_partitions, with_kind=True,
    ).groupby("part").map_groups(assemble, batch_format="pandas")
    return bucketed_sum_combine(
        partials, keys=["r_kind"],
        sum_cols=["n_results", "n_labeled", "n_rated"], schema=out_sch,
        num_partitions=8,
    )


def kg_construct_comention(triples_ds, num_partitions: int | None = None):
    """SPARQL CONSTRUCT over the KG — derive a NEW graph of co-mention
    edges and serialize it through the kernel's N-Quads writer
    (`rayld/kernel/nquads.py` to_nquad, the same serializer the flagship
    export uses; reference parity: JSONLDProcessor.ToRDF output formatting,
    /root/reference/src/json-ld.net/Core/RDFDatasetUtils.cs ToNQuad):

        CONSTRUCT { ?e1 vocab:comentionedWith ?e2 }
        WHERE { ?t schema:about ?e1 . ?t schema:about ?e2 .
                FILTER (STR(?e1) < STR(?e2)) }

    Output: one row per DISTINCT constructed triple with its canonical
    N-Quad line. Entity IRIs are gazetteer-vocabulary (no escapable
    characters), so the oracle reproduces the line by string concatenation.

    Scale shape: pair generation is conversation-local (one conv-bucketed
    exchange, in-task self-merge per turn); global dedup is the bounded
    house combine keyed by the pair itself (gazetteer-bounded vocabulary);
    serialization runs over the RESULT-sized distinct table."""
    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    pair_sch = pa.schema([
        ("e1", pa.string()), ("e2", pa.string()), ("n", pa.int64()),
    ])

    def pairs_in_turn(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return pair_sch.empty_table()
        a = df[df["leg"] == 0][["conv_id", "s", "o"]]
        p = a.merge(a, on=["conv_id", "s"])
        p = p[p["o_x"] < p["o_y"]][["o_x", "o_y"]].drop_duplicates()
        return pa.table({
            "e1": pa.array(p["o_x"], pa.string()),
            "e2": pa.array(p["o_y"], pa.string()),
            "n": pa.array(np.ones(len(p), np.int64)),
        }, schema=pair_sch)

    def construct(batch: pa.Table) -> pa.Table:
        from ..kernel.nquads import to_nquad

        e1 = batch["e1"].to_pylist()
        e2 = batch["e2"].to_pylist()
        lines = [
            to_nquad({
                "subject": {"type": "IRI", "value": a},
                "predicate": {"type": "IRI", "value": _COMENTION_PRED},
                "object": {"type": "IRI", "value": b},
            }, None).rstrip("\n")
            for a, b in zip(e1, e2)
        ]
        return pa.table({
            "e1": pa.array(e1, pa.string()),
            "e2": pa.array(e2, pa.string()),
            "nquad": pa.array(lines, pa.string()),
        })

    partials = _conv_bucketed_legs(
        triples_ds, (_SCHEMA_ABOUT,), num_partitions,
    ).groupby("part").map_groups(pairs_in_turn, batch_format="pandas")
    distinct = bucketed_sum_combine(
        partials, keys=["e1", "e2"], sum_cols=["n"], schema=pair_sch,
        num_partitions=max(8, num_partitions // 4),
    )
    return distinct.map_batches(construct, batch_format="pyarrow")


_SCHEMA_NAME = "http://schema.org/name"
_SCHEMA_TEXT = "http://schema.org/text"
_VOCAB_ROLE = "https://rayld.dev/vocab#role"


def kg_bgp_union_labels(triples_ds):
    """SPARQL UNION over the KG (bag semantics):

        { ?x rdfs:label ?l } UNION { ?x schema:name ?l }

    -> one row per solution, tagged with the branch that produced it.
    UNION is the one SPARQL algebra node that needs NO exchange at all:
    each branch is a predicate-pruned scan and the bag union is block
    concatenation — the plan is embarrassingly parallel and streams.
    Reference parity: the same solutions a SPARQL engine over the
    kernel's ToRDF output (processor.py:324 lineage) would produce."""

    _sch = pa.schema([
        ("x", pa.string()), ("l", pa.string()), ("src", pa.string()),
    ])

    def branches(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        for pred, tag in ((_RDFS_LABEL, "rdfs:label"),
                          (_SCHEMA_NAME, "schema:name")):
            t = batch.filter(pc.equal(batch["pred"], pred))
            outs.append(pa.table({
                "x": t["subj"].cast(pa.string()),
                "l": t["obj_value"].cast(pa.string()),
                "src": pa.array([tag] * len(t), pa.string()),
            }, schema=_sch))
        return pa.concat_tables(outs)

    return triples_ds.map_batches(branches, batch_format="pyarrow")


def kg_bgp_minus_mentions(triples_ds, num_partitions: int | None = None):
    """SPARQL MINUS (negation) over the KG:

        { ?t schema:about ?e  MINUS { ?t vocab:toolResult ?r } }

    -> per entity, how many of its mentioning turns have NO tool result
    (the anti-join form; the oracle runs the equivalent NOT EXISTS).

    Scale shape: both legs are conversation-scoped, so the shared
    _conv_bucketed_legs extractor co-locates them in ONE exchange; the
    per-bucket anti-join is a vectorized isin on (conv, turn) keys, and
    the per-entity counts collapse through the bounded house combine
    (entities are gazetteer-bounded)."""
    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    out_sch = pa.schema([("e", pa.string()), ("n", pa.int64())])

    def anti(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return out_sch.empty_table()
        a = df[df["leg"] == 0]
        tr = df[df["leg"] == 1]
        keep = ~(a["conv_id"] + "\x00" + a["s"]).isin(
            tr["conv_id"] + "\x00" + tr["s"]
        )
        g = a[keep].groupby("o", as_index=False, sort=False).size()
        return pa.table({
            "e": pa.array(g["o"], pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
        }, schema=out_sch)

    partials = _conv_bucketed_legs(
        triples_ds, (_SCHEMA_ABOUT, _VOCAB_TOOL_RESULT), num_partitions,
    ).groupby("part").map_groups(anti, batch_format="pandas")
    return bucketed_sum_combine(
        partials, keys=["e"], sum_cols=["n"], schema=out_sch,
        num_partitions=max(8, num_partitions // 4),
    )


def kg_bgp_filter_questions(triples_ds, pattern: str = r"\?",
                            num_partitions: int | None = None):
    """SPARQL FILTER regex over a two-leg BGP:

        { ?t schema:text ?x . ?t vocab:role ?r . FILTER regex(?x, "\\?") }

    -> how many turns per role ask a question. The BGP core (bgp_match)
    does the subject-shared join on its one crc32(subj) exchange; the
    FILTER is a vectorized pyarrow regex kernel applied to the joined
    solutions (never a Python row loop), and the per-role counts fold
    through the bounded house combine (three roles)."""
    import pyarrow.compute as pc

    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    out_sch = pa.schema([("role", pa.string()), ("n", pa.int64())])

    joined = bgp_match(triples_ds, [
        {"pred": _SCHEMA_TEXT, "capture": "txt"},
        {"pred": _VOCAB_ROLE, "capture": "role"},
    ], num_partitions=num_partitions)

    def filt(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.match_substring_regex(batch["txt"], pattern))
        df = t.select(["role"]).to_pandas()
        g = df.groupby("role", as_index=False, sort=False).size()
        return pa.table({
            "role": pa.array(g["role"].astype(str), pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
        }, schema=out_sch)

    partials = joined.map_batches(filt, batch_format="pyarrow")
    return bucketed_sum_combine(
        partials, keys=["role"], sum_cols=["n"], schema=out_sch,
        num_partitions=8,
    )


_ASK_UNKNOWN_PRED = "https://rayld.dev/vocab#frobnicate"


def kg_ask(triples_ds, rating_gt: float = 4.5,
           num_partitions: int | None = None):
    """SPARQL ASK over the KG — four boolean existence queries in one
    result table (ask, flag):

        ask_high_rating       ASK { ?r schema:ratingValue ?v .
                                    FILTER (xsd:double(?v) > 4.5) }
        ask_tool_turns        ASK { ?t vocab:role "tool" }
        ask_unknown_pred      ASK { ?s vocab:frobnicate ?o }   (false)
        ask_cross_conv_entity ASK { a mention of some ?e in >= 2
                                    distinct conversations }

    Scale shape: the three row-local asks reduce to per-batch 0/1
    partials folded by a max combine (no data ever moves — only flag
    rows); the one JOIN-y ask dedups (entity, conv) per batch and takes
    a per-entity distinct-conversation count on a single bucketed
    exchange over the gazetteer-bounded entity vocabulary."""
    import zlib

    import pyarrow.compute as pc

    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    out_sch = pa.schema([("ask", pa.string()), ("flag", pa.int64())])
    _ASKS = ["ask_cross_conv_entity", "ask_high_rating",
             "ask_tool_turns", "ask_unknown_pred"]

    def local_flags(batch: pa.Table) -> pa.Table:
        rat = batch.filter(
            pc.equal(batch["pred"], _SCHEMA_RATING))["obj_value"]
        vals = pd.to_numeric(pd.Series(rat.to_pylist()), errors="coerce")
        high = int(bool((vals > rating_gt).any()))
        tool = int(pc.any(pc.and_(
            pc.equal(batch["pred"], _VOCAB_ROLE),
            pc.equal(batch["obj_value"], "tool"),
        )).as_py() or False)
        unk = int(pc.any(
            pc.equal(batch["pred"], _ASK_UNKNOWN_PRED)
        ).as_py() or False)
        return pa.table({
            "ask": pa.array(_ASKS, pa.string()),
            "flag": pa.array([0, high, tool, unk], pa.int64()),
        }, schema=out_sch)

    pair_sch = pa.schema([
        ("e", pa.string()), ("conv_id", pa.string()), ("part", pa.int32()),
    ])

    def ent_conv(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], _SCHEMA_ABOUT))
        df = pd.DataFrame({
            "e": t["obj_value"].to_pylist(),
            "conv_id": t["conv_id"].to_pylist(),
        }).drop_duplicates()
        parts = np.fromiter(
            (zlib.crc32(e.encode()) % num_partitions for e in df["e"]),
            dtype=np.int32, count=len(df),
        )
        return pa.table({
            "e": pa.array(df["e"].astype(str), pa.string()),
            "conv_id": pa.array(df["conv_id"].astype(str), pa.string()),
            "part": pa.array(parts, pa.int32()),
        }, schema=pair_sch)

    def cross_conv(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "e" not in df.columns:
            return out_sch.empty_table()
        flag = int((df.groupby("e")["conv_id"].nunique() >= 2).any())
        return pa.table({
            "ask": pa.array(["ask_cross_conv_entity"], pa.string()),
            "flag": pa.array([flag], pa.int64()),
        }, schema=out_sch)

    local = triples_ds.map_batches(local_flags, batch_format="pyarrow")
    crossc = (
        triples_ds.map_batches(ent_conv, batch_format="pyarrow")
        .groupby("part").map_groups(cross_conv, batch_format="pandas")
    )
    return bucketed_sum_combine(
        local.union(crossc), keys=["ask"], sum_cols=["flag"],
        schema=out_sch, num_partitions=8, how="max",
    )


def kg_describe_top_entity(triples_ds, num_partitions: int | None = None):
    """SPARQL DESCRIBE of the most-mentioned entity (ties broken by
    lexicographic min, the same rule the oracle's ORDER BY runs):

        DESCRIBE ?e  where ?e = argmax_e |{ ?t schema:about ?e }|

    -> every triple where the entity is the subject or the (IRI) object,
    i.e. the symmetric concise bounded description without bnode closure
    (this KG attaches no bnode satellites to entity nodes).

    Scale shape: pass 1 folds per-batch mention counts through the
    bounded house combine (entities are gazetteer-bounded) and the driver
    holds ONE winner string; pass 2 is a broadcast-filter scan — no
    exchange moves triple rows at any point."""
    import pyarrow.compute as pc

    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    cnt_sch = pa.schema([("e", pa.string()), ("n", pa.int64())])

    def mention_counts(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], _SCHEMA_ABOUT))
        g = pd.Series(t["obj_value"].to_pylist()).value_counts()
        return pa.table({
            "e": pa.array(g.index.astype(str), pa.string()),
            "n": pa.array(g.to_numpy(np.int64)),
        }, schema=cnt_sch)

    counts = bucketed_sum_combine(
        triples_ds.map_batches(mention_counts, batch_format="pyarrow"),
        keys=["e"], sum_cols=["n"], schema=cnt_sch,
        num_partitions=max(8, num_partitions // 4),
    ).to_pandas()  # gazetteer-bounded vocabulary: one small driver table
    out_sch = pa.schema([
        ("subj", pa.string()), ("pred", pa.string()),
        ("obj_kind", pa.string()), ("obj_value", pa.string()),
        ("obj_datatype", pa.string()), ("obj_lang", pa.string()),
    ])
    if len(counts) == 0:
        import ray.data as rd

        return rd.from_arrow(out_sch.empty_table())
    counts = counts.sort_values(
        ["n", "e"], ascending=[False, True], kind="mergesort"
    )
    target = str(counts["e"].iloc[0])

    def describe(batch: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.equal(batch["subj"], target),
            pc.and_(pc.equal(batch["obj_kind"], "IRI"),
                    pc.equal(batch["obj_value"], target)),
        )
        t = batch.filter(keep)
        return pa.table({
            "subj": t["subj"].cast(pa.string()),
            "pred": t["pred"].cast(pa.string()),
            "obj_kind": t["obj_kind"].cast(pa.string()),
            "obj_value": t["obj_value"].cast(pa.string()),
            "obj_datatype": pc.fill_null(
                t["obj_datatype"].cast(pa.string()), ""),
            "obj_lang": pc.fill_null(t["obj_lang"].cast(pa.string()), ""),
        }, schema=out_sch)

    return triples_ds.map_batches(describe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HITS (hubs & authorities) — the second iterative link-analysis member
# ---------------------------------------------------------------------------

def _spmv_contrib(edges, weights: pd.Series, key_in: str, key_out: str,
                  P: int, bucket_str) -> pd.DataFrame:
    """One SpMV half-step over a (src, dst) edge Dataset: for every node,
    sum ``weights[key_in]`` over its incident edges, grouped by
    ``key_out``. The weight vector broadcasts once via ray.put; per-edge-
    block partials pre-aggregate before the single bucketed combine, so
    the exchange moves one row per (node, block)."""
    import ray

    ref = ray.put(weights)
    sch = pa.schema([
        ("node", pa.string()), ("contrib", pa.float64()),
        ("part", pa.int32()),
    ])
    out_sch = pa.schema([("node", pa.string()), ("contrib", pa.float64())])

    def partial(df: pd.DataFrame) -> pa.Table:
        wts = ray.get(ref)
        df = df.assign(val=df[key_in].map(wts).to_numpy(np.float64))
        df = df.sort_values([key_out, key_in], kind="mergesort")
        g = df.groupby(key_out, as_index=False)["val"].sum()
        return pa.table({
            "node": pa.array(g[key_out].astype(str), pa.string()),
            "contrib": pa.array(g["val"].to_numpy(np.float64)),
            "part": pa.array(bucket_str(g[key_out].tolist()), pa.int32()),
        }, schema=sch)

    def combine(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_sch.empty_table()
        df = df.sort_values(["node", "contrib"], kind="mergesort")
        g = df.groupby("node", as_index=False)["contrib"].sum()
        return pa.table({
            "node": pa.array(g["node"].astype(str), pa.string()),
            "contrib": pa.array(g["contrib"].to_numpy(np.float64)),
        }, schema=out_sch)

    return (
        edges.map_batches(partial, batch_format="pandas")
        .groupby("part").map_groups(combine, batch_format="pandas")
        .to_pandas()
    )


def hits(edges_ds, n_iter: int = 10, num_partitions: int | None = None):
    """HITS hubs & authorities (Kleinberg, JACM 1999) over a (src, dst)
    string edge Dataset. Returns (node, hub, authority), each vector
    L2-normalized after its half-step (the textbook update order:
    a <- A^T h, normalize; h <- A a, normalize).

    Broadcast-vector path — valid exactly while the node vector fits the
    driver (the pagerank-broadcast regime; past that threshold the
    _pagerank_join rank-join shape generalizes verbatim, since both
    half-steps are the same SpMV contribution pattern). Per iteration
    TWO bucketed exchanges, each moving one row per (node, edge-block)."""
    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)
    P = num_partitions
    bucket_str = _crc32_bucketer(P)
    edges = edges_ds.materialize()

    # node table = union of endpoints (one bucketed dedup exchange)
    def endpoints(t: pa.Table) -> pa.Table:
        nodes = pd.unique(pd.concat([
            t["src"].to_pandas(), t["dst"].to_pandas()
        ], ignore_index=True))
        return pa.table({
            "node": pa.array(nodes.astype(str), pa.string()),
            "part": pa.array(bucket_str(nodes.tolist()), pa.int32()),
        })

    def node_dedup(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([("node", pa.string())])
        if len(df) == 0:
            return sch.empty_table()
        return pa.table({
            "node": pa.array(
                df["node"].drop_duplicates().astype(str), pa.string()),
        }, schema=sch)

    node_df = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("part").map_groups(node_dedup, batch_format="pandas")
        .to_pandas()
    )
    import ray.data as rd

    if len(node_df) == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64()),
        }))
    nodes = node_df["node"].sort_values().reset_index(drop=True)
    n = len(nodes)
    pos = pd.Series(np.arange(n), index=nodes)
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))

    def gather(got: pd.DataFrame) -> np.ndarray:
        v = np.zeros(n)
        if "node" in got.columns and len(got):
            v[pos[got["node"]].to_numpy()] = got["contrib"].to_numpy()
        return v

    for _ in range(n_iter):
        auth = gather(_spmv_contrib(
            edges, pd.Series(hub, index=nodes), "src", "dst", P, bucket_str,
        ))
        norm = np.linalg.norm(auth)
        auth = auth / norm if norm > 0 else auth
        hub = gather(_spmv_contrib(
            edges, pd.Series(auth, index=nodes), "dst", "src", P, bucket_str,
        ))
        norm = np.linalg.norm(hub)
        hub = hub / norm if norm > 0 else hub

    return rd.from_pandas(pd.DataFrame({
        "node": nodes, "hub": hub, "authority": auth,
    }))


def hits_reference(edges: pd.DataFrame, n_iter: int = 10) -> pd.DataFrame:
    """Single-process numpy HITS (the parity oracle for the gate)."""
    nodes = pd.Index(
        pd.unique(pd.concat([edges["src"], edges["dst"]], ignore_index=True))
    ).sort_values()
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    src = edges["src"].map(idx).to_numpy(np.int64)
    dst = edges["dst"].map(idx).to_numpy(np.int64)
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(n_iter):
        auth = np.zeros(n)
        np.add.at(auth, dst, hub[src])
        norm = np.linalg.norm(auth)
        auth = auth / norm if norm > 0 else auth
        hub = np.zeros(n)
        np.add.at(hub, src, auth[dst])
        norm = np.linalg.norm(hub)
        hub = hub / norm if norm > 0 else hub
    return pd.DataFrame({"node": nodes, "hub": hub, "authority": auth})


def hits_check(n_conversations: int = 100, n_iter: int = 5) -> pd.DataFrame:
    """Gate: distributed HITS == single-process numpy HITS on the same
    bounded conversation sample (the pagerank_check harness shape — a
    spot-check, not a data path). Emits typed flags a constant SQL oracle
    pins."""
    from .kg import build_triples
    from ..sources.transcripts import transcripts_dataset

    triples = build_triples(transcripts_dataset(n_conversations))
    edges_ds = triples_to_edges(triples).materialize()
    got = hits(
        edges_ds, n_iter=n_iter
    ).to_pandas().sort_values("node").reset_index(drop=True)
    want = hits_reference(
        edges_ds.to_pandas(), n_iter=n_iter
    ).sort_values("node").reset_index(drop=True)
    ok = len(got) == len(want)
    max_diff = max(
        float(np.abs(got["hub"].to_numpy()
                     - want["hub"].to_numpy()).max()),
        float(np.abs(got["authority"].to_numpy()
                     - want["authority"].to_numpy()).max()),
    ) if ok and len(got) else float("inf")
    return pd.DataFrame({
        "parity_ok": [int(ok and max_diff < 1e-9)],
        "hub_norm_ok": [
            int(abs(float(np.linalg.norm(got["hub"])) - 1.0) < 1e-9)
        ],
        "auth_norm_ok": [
            int(abs(float(np.linalg.norm(got["authority"])) - 1.0) < 1e-9)
        ],
    })


def personalized_pagerank(edges_ds, seeds, damping: float = 0.85,
                          n_iter: int = 10,
                          num_partitions: int | None = None):
    """Personalized PageRank: the teleport vector concentrates on a SEED
    set instead of the uniform distribution (entity-relevance ranking
    from a query's entities — the standard KG-retrieval primitive), and
    dangling mass returns to the seeds. Returns (node, rank) with
    sum(rank) == 1.

    Broadcast-vector path, one bucketed exchange per iteration — the
    exact _pagerank_broadcast regime (node vector fits the driver; past
    the threshold the _pagerank_join rank-join shape generalizes
    verbatim, the only change being the seed-indicator base term)."""
    import ray
    import ray.data as rd

    from .common import cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions(minimum=8)
    P = num_partitions
    bucket_str = _crc32_bucketer(P)
    edges = edges_ds.materialize()

    def node_partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df["src"].value_counts().rename("out_p")
        inn = df["dst"].value_counts().rename("in_p")
        g = pd.concat([out, inn], axis=1).fillna(0).reset_index(names="node")
        return pa.table({
            "node": pa.array(g["node"].astype(str), pa.string()),
            "out_p": pa.array(g["out_p"].astype("int64"), pa.int64()),
            "part": pa.array(bucket_str(g["node"].tolist()), pa.int32()),
        })

    def node_merge(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([("node", pa.string()), ("out_deg", pa.int64())])
        if len(df) == 0:
            return sch.empty_table()
        g = df.groupby("node", as_index=False)["out_p"].sum()
        return pa.table({
            "node": pa.array(g["node"].astype(str), pa.string()),
            "out_deg": pa.array(g["out_p"].astype("int64"), pa.int64()),
        }, schema=sch)

    node_df = (
        edges.map_batches(node_partials, batch_format="pyarrow")
        .groupby("part").map_groups(node_merge, batch_format="pandas")
        .to_pandas()
    )
    if len(node_df) == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64()),
        }))
    node_df = node_df.sort_values("node").reset_index(drop=True)
    n = len(node_df)
    pos = pd.Series(np.arange(n), index=node_df["node"])
    out_deg = node_df["out_deg"].to_numpy(np.int64)
    seed_set = [s for s in seeds if s in pos.index]
    if not seed_set:
        raise ValueError("personalized_pagerank: no seed is a graph node")
    s_vec = np.zeros(n)
    s_vec[pos[seed_set].to_numpy()] = 1.0 / len(seed_set)
    rank = s_vec.copy()

    def combine(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([("node", pa.string()), ("contrib", pa.float64())])
        if len(df) == 0:
            return sch.empty_table()
        df = df.sort_values(["node", "contrib"], kind="mergesort")
        g = df.groupby("node", as_index=False)["contrib"].sum()
        return pa.table({
            "node": pa.array(g["node"].astype(str), pa.string()),
            "contrib": pa.array(g["contrib"].to_numpy(np.float64)),
        }, schema=sch)

    for _ in range(n_iter):
        w = pd.Series(
            np.where(out_deg > 0, rank / np.maximum(out_deg, 1), 0.0),
            index=node_df["node"],
        )
        ref = ray.put(w)

        def contrib_partial(df: pd.DataFrame) -> pa.Table:
            wts = ray.get(ref)
            df = df.assign(val=df["src"].map(wts).to_numpy(np.float64))
            df = df.sort_values(["dst", "src"], kind="mergesort")
            g = df.groupby("dst", as_index=False)["val"].sum()
            return pa.table({
                "node": pa.array(g["dst"].astype(str), pa.string()),
                "contrib": pa.array(g["val"].to_numpy(np.float64)),
                "part": pa.array(bucket_str(g["dst"].tolist()), pa.int32()),
            }, schema=_CONTRIB_SCHEMA)

        got = (
            edges.map_batches(contrib_partial, batch_format="pandas")
            .groupby("part")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
        contrib = np.zeros(n)
        if "node" in got.columns and len(got):
            contrib[pos[got["node"]].to_numpy()] = got["contrib"].to_numpy()
        dangling = float(rank[out_deg == 0].sum())
        rank = (1.0 - damping) * s_vec + damping * (
            contrib + dangling * s_vec
        )

    return rd.from_pandas(
        pd.DataFrame({"node": node_df["node"], "rank": rank})
    )


def ppr_reference(edges: pd.DataFrame, seeds, damping: float = 0.85,
                  n_iter: int = 10) -> pd.DataFrame:
    """Single-process numpy personalized PageRank (the parity oracle)."""
    nodes = pd.Index(
        pd.unique(pd.concat([edges["src"], edges["dst"]], ignore_index=True))
    ).sort_values()
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    src = edges["src"].map(idx).to_numpy(np.int64)
    dst = edges["dst"].map(idx).to_numpy(np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    seed_set = [s for s in seeds if s in idx]
    s_vec = np.zeros(n)
    s_vec[[idx[s] for s in seed_set]] = 1.0 / len(seed_set)
    rank = s_vec.copy()
    for _ in range(n_iter):
        dangling = rank[out_deg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] / out_deg[src])
        rank = (1 - damping) * s_vec + damping * (contrib + dangling * s_vec)
    return pd.DataFrame({"node": nodes, "rank": rank})


def default_ppr_seeds(edges_df: pd.DataFrame, k: int = 5) -> list:
    """Deterministic seed rule shared by the gate's two sides: the k
    lexicographically-smallest ENTITY nodes in the graph (entities are
    mention targets, i.e. mostly dangling — their teleport-returned mass
    makes the personalization visibly non-uniform)."""
    nodes = pd.Index(pd.unique(pd.concat(
        [edges_df["src"], edges_df["dst"]], ignore_index=True
    ))).sort_values()
    ents = [s for s in nodes if "/entity/" in s]
    return (ents or list(nodes))[:k]


def ppr_check(n_conversations: int = 100, damping: float = 0.85,
              n_iter: int = 5) -> pd.DataFrame:
    """Gate: distributed personalized PageRank == single-process numpy on
    the same bounded sample and the same deterministic seed set. Emits
    typed flags a constant SQL oracle pins: parity, mass conservation,
    and genuine personalization (seed mass exceeds the uniform share)."""
    from .kg import build_triples
    from ..sources.transcripts import transcripts_dataset

    triples = build_triples(transcripts_dataset(n_conversations))
    edges_ds = triples_to_edges(triples).materialize()
    edges_df = edges_ds.to_pandas()
    seeds = default_ppr_seeds(edges_df)
    got = personalized_pagerank(
        edges_ds, seeds, damping=damping, n_iter=n_iter
    ).to_pandas().sort_values("node").reset_index(drop=True)
    want = ppr_reference(
        edges_df, seeds, damping=damping, n_iter=n_iter
    ).sort_values("node").reset_index(drop=True)
    ok = len(got) == len(want)
    max_diff = float(np.abs(got["rank"].to_numpy()
                            - want["rank"].to_numpy()).max()) \
        if ok and len(got) else float("inf")
    seed_mass = float(got[got["node"].isin(seeds)]["rank"].sum()) \
        if len(got) else 0.0
    uniform_share = len(seeds) / max(len(got), 1)
    return pd.DataFrame({
        "parity_ok": [int(ok and max_diff < 1e-9)],
        "rank_sums_to_one": [
            int(abs(float(got["rank"].sum()) - 1.0) < 1e-9)
        ],
        "seed_mass_personalized": [int(seed_mass > uniform_share)],
    })


_DEFAULT_VALUES_ENTITIES = (
    "https://rayld.dev/entity/org/initech_robotics",
    "https://rayld.dev/entity/org/oscorp_energy",
    "https://rayld.dev/entity/org/umbrella_logistics",
    "https://rayld.dev/entity/person/grace_cerf",
    "https://rayld.dev/entity/org/nonexistent_org",  # binds nothing
)


def kg_bgp_values(triples_ds, values=None):
    """SPARQL VALUES (inline data) joined to a mention pattern:

        VALUES ?e { <e1> <e2> ... }  ?t schema:about ?e

    -> per VALUES entity, its mention count. VALUES rows that bind no
    solution produce none (standard join semantics) — the fixed list
    includes one such entity so both behaviors are driver-checked.

    Scale shape: the VALUES list is inline data (bounded by the query
    text), so the join is a broadcast value_set filter inside the scan —
    pyarrow is_in, never an exchange; the per-entity counts fold through
    the bounded house combine."""
    import pyarrow.compute as pc

    from .common import bucketed_sum_combine

    if values is None:
        values = _DEFAULT_VALUES_ENTITIES
    vset = pa.array(list(values), pa.string())
    out_sch = pa.schema([("e", pa.string()), ("n", pa.int64())])

    def matches(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_(
            pc.equal(batch["pred"], _SCHEMA_ABOUT),
            pc.is_in(batch["obj_value"], value_set=vset),
        ))
        g = pd.Series(t["obj_value"].to_pylist()).value_counts()
        return pa.table({
            "e": pa.array(g.index.astype(str), pa.string()),
            "n": pa.array(g.to_numpy(np.int64)),
        }, schema=out_sch)

    return bucketed_sum_combine(
        triples_ds.map_batches(matches, batch_format="pyarrow"),
        keys=["e"], sum_cols=["n"], schema=out_sch, num_partitions=8,
    )


def kg_graph_clause(triples_ds):
    """SPARQL GRAPH clause — quads bucketed by which graph holds them:

        { ?s ?p ?o }                       (the default graph)
        GRAPH ?g { ?s ?p ?o }              (named graphs, incl. @error)

    -> (g_kind, n_quads, n_graphs): triple count and distinct graph-name
    count per kind ('default' / 'error' / 'named'). The kernel's dataset
    model (processor.py:324 ToRDF lineage) keeps named graphs first-
    class; this is the query-side view of that structure.

    Scale shape: graph names are conversation-scoped, so per-batch
    partials carry (kind, count, distinct-names-in-batch) and the one
    bounded exchange merges three rows per block; distinct names dedup
    exactly because a graph never spans conversations and conversations
    never span the source blocks' conv boundaries — NOT guaranteed for
    arbitrary re-partitioned inputs, so the dedup re-runs in the combine
    over the (kind, name) partial rows instead."""
    import zlib

    from .common import cluster_partitions

    P = cluster_partitions(minimum=8)
    part_sch = pa.schema([
        ("g_kind", pa.string()), ("name", pa.string()), ("n", pa.int64()),
        ("part", pa.int32()),
    ])
    out_sch = pa.schema([
        ("g_kind", pa.string()), ("n_quads", pa.int64()),
        ("n_graphs", pa.int64()),
    ])

    def partial(batch: pa.Table) -> pa.Table:
        g = pd.Series(batch["graph"].to_pylist())
        kind = np.where(
            g == "@default", "default",
            np.where(g == "@error", "error", "named"),
        )
        df = pd.DataFrame({"g_kind": kind, "name": g})
        agg = df.groupby(["g_kind", "name"], as_index=False).size()
        parts = np.fromiter(
            (zlib.crc32(f"{k}:{s}".encode()) % P
             for k, s in zip(agg["g_kind"], agg["name"])),
            dtype=np.int32, count=len(agg),
        )
        return pa.table({
            "g_kind": pa.array(agg["g_kind"].astype(str), pa.string()),
            "name": pa.array(agg["name"].astype(str), pa.string()),
            "n": pa.array(agg["size"].to_numpy(np.int64)),
            "part": pa.array(parts, pa.int32()),
        }, schema=part_sch)

    def merge_names(df: pd.DataFrame) -> pa.Table:
        sch = pa.schema([
            ("g_kind", pa.string()), ("n", pa.int64()),
            ("g_one", pa.int64()),
        ])
        if len(df) == 0:
            return sch.empty_table()
        g = df.groupby(["g_kind", "name"], as_index=False)["n"].sum()
        k = g.groupby("g_kind", as_index=False).agg(
            n=("n", "sum"), g_one=("name", "nunique"))
        return pa.table({
            "g_kind": pa.array(k["g_kind"].astype(str), pa.string()),
            "n": pa.array(k["n"].to_numpy(np.int64)),
            "g_one": pa.array(k["g_one"].to_numpy(np.int64)),
        }, schema=sch)

    from .common import bucketed_sum_combine

    per_bucket = (
        triples_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part").map_groups(merge_names, batch_format="pandas")
    )
    out = bucketed_sum_combine(
        per_bucket, keys=["g_kind"], sum_cols=["n", "g_one"],
        schema=pa.schema([
            ("g_kind", pa.string()), ("n", pa.int64()),
            ("g_one", pa.int64()),
        ]),
        num_partitions=8,
    )
    return out.map_batches(
        lambda t: t.rename_columns(["g_kind", "n_quads", "n_graphs"])
        .cast(out_sch),
        batch_format="pyarrow",
    )


def kg_entity_components(triples_ds, num_partitions: int | None = None):
    """Connected components of the entity CO-MENTION graph: entities
    sharing a turn are connected; each co-mentioned entity is labeled
    with its component's lexicographically-smallest member. The first
    VALUE-checked CC in the engine — the co-mention vocabulary is
    gazetteer-bounded, so a DuckDB ``WITH RECURSIVE`` transitive closure
    recomputes the exact (entity, component) labeling.

    Scale shape: pair generation is conversation-local (one conv-bucketed
    exchange over the FULL triple stream) and the distinct pair table is
    gazetteer-bounded at ANY corpus scale (≤ C(|gazetteer|, 2) rows — a
    true invariant, unlike doc-graph pair tables), so the labeling runs
    as vectorized numpy min-label + pointer doubling on the driver over
    the bounded table — the same bounded-result contract as
    kg_describe_top_entity's count pass. Graphs whose node set GROWS
    with the corpus (documents, users) use the distributed
    min-label/pointer-jump loop instead (dedup.connected_components,
    value-gated by dedup_clusters_check); its per-round Ray exchanges
    are exactly this recurrence, distributed."""
    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()

    pair_sch = pa.schema([
        ("e1", pa.string()), ("e2", pa.string()), ("n", pa.int64()),
    ])

    def pairs_in_turn(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return pair_sch.empty_table()
        a = df[df["leg"] == 0][["conv_id", "s", "o"]]
        p = a.merge(a, on=["conv_id", "s"])
        p = p[p["o_x"] < p["o_y"]][["o_x", "o_y"]].drop_duplicates()
        return pa.table({
            "e1": pa.array(p["o_x"], pa.string()),
            "e2": pa.array(p["o_y"], pa.string()),
            "n": pa.array(np.ones(len(p), np.int64)),
        }, schema=pair_sch)

    partials = _conv_bucketed_legs(
        triples_ds, (_SCHEMA_ABOUT,), num_partitions,
    ).groupby("part").map_groups(pairs_in_turn, batch_format="pandas")
    distinct = bucketed_sum_combine(
        partials, keys=["e1", "e2"], sum_cols=["n"], schema=pair_sch,
        num_partitions=max(8, num_partitions // 4),
    ).materialize()

    out_sch = pa.schema([("e", pa.string()), ("comp", pa.string())])
    import ray.data as rd

    pairs_tbl = pa.concat_tables(
        b.select(["e1", "e2"]) for b in distinct.iter_batches(
            batch_format="pyarrow", batch_size=None)
    )
    if pairs_tbl.num_rows == 0:
        return rd.from_arrow(out_sch.empty_table())
    e1 = np.asarray(pairs_tbl["e1"].to_pylist(), dtype=object)
    e2 = np.asarray(pairs_tbl["e2"].to_pylist(), dtype=object)
    # sorted-rank encoding: min-int labels == lexicographic-min entities
    # (the oracle's rule)
    vocab, codes = np.unique(np.concatenate([e1, e2]), return_inverse=True)
    n = len(vocab)
    a, b = codes[:len(e1)], codes[len(e1):]
    # min-label propagation + pointer doubling, each round one vectorized
    # scatter-min / gather — the same recurrence the distributed loop
    # (dedup.connected_components) runs as bucketed Ray exchanges
    label = np.arange(n, dtype=np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    # hooking + doubling converges in O(log n) rounds; the cap is a
    # defensive bound far above it, and the break fires at the provable
    # fixpoint (labels constant per component = the component min)
    for _ in range(64 + 2 * int(np.ceil(np.log2(max(n, 2))))):
        new = label.copy()
        np.minimum.at(new, src, label[dst])   # propagate over edges
        new = new[new]                        # pointer doubling
        if np.array_equal(new, label):
            break
        label = new
    return rd.from_pandas(pd.DataFrame({
        "e": vocab, "comp": vocab[label],
    }).astype(str))


def kg_sample_neighborhood(triples_ds, n_seeds: int = 3, fanout: int = 4,
                           hops: int = 2,
                           num_partitions: int | None = None):
    """GraphSAGE-style seeded neighborhood sampling over the entity
    co-mention graph — the subgraph-extraction stage of a GNN training
    pipeline: from the ``n_seeds`` most-mentioned entities, sample
    ``fanout`` neighbors per frontier node per hop, DETERMINISTICALLY
    (neighbors ranked by md5(src || '|' || dst) — DuckDB's md5 and
    hashlib agree byte-for-byte, so the SQL oracle reproduces the exact
    sample). Returns (hop, src, dst) sampled edges.

    Scale shape: seeds come from the bounded mention-count combine; each
    hop is ONE shuffle-free filter+rank pass over the materialized
    distinct edge set with the frontier broadcast in the closure
    (frontier size is bounded by n_seeds * fanout^hop — bytes, not
    data); per-batch top-fanout cuts are PARTIALS finalized on the
    driver over the bounded candidate set, so the sample is exact under
    any block layout and the driver only ever moves O(sample), never
    O(graph)."""
    import hashlib as _hl

    import pyarrow.compute as pc

    from .common import bucketed_sum_combine, cluster_partitions

    if num_partitions is None:
        num_partitions = cluster_partitions()
    P = max(8, num_partitions // 4)

    # ---- seeds: argmax-n mention counts (ties -> lexicographic) ----
    cnt_sch = pa.schema([("e", pa.string()), ("n", pa.int64())])

    def mention_counts(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], _SCHEMA_ABOUT))
        g = pd.Series(t["obj_value"].to_pylist()).value_counts()
        return pa.table({
            "e": pa.array(g.index.astype(str), pa.string()),
            "n": pa.array(g.to_numpy(np.int64)),
        }, schema=cnt_sch)

    counts = bucketed_sum_combine(
        triples_ds.map_batches(mention_counts, batch_format="pyarrow"),
        keys=["e"], sum_cols=["n"], schema=cnt_sch, num_partitions=P,
    ).to_pandas()
    out_sch = pa.schema([
        ("hop", pa.int64()), ("src", pa.string()), ("dst", pa.string()),
    ])
    import ray.data as rd

    if len(counts) == 0:
        return rd.from_arrow(out_sch.empty_table())
    counts = counts.sort_values(["n", "e"], ascending=[False, True],
                                kind="mergesort")
    seeds = [str(e) for e in counts["e"].iloc[:n_seeds]]

    # ---- symmetric distinct co-mention edges, bucketed by crc32(src) ----
    pair_sch = pa.schema([
        ("src", pa.string()), ("dst", pa.string()), ("n", pa.int64()),
    ])

    def sym_pairs(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "leg" not in df.columns:
            return pair_sch.empty_table()
        a = df[df["leg"] == 0][["conv_id", "s", "o"]]
        p = a.merge(a, on=["conv_id", "s"])
        p = p[p["o_x"] != p["o_y"]][["o_x", "o_y"]].drop_duplicates()
        return pa.table({
            "src": pa.array(p["o_x"], pa.string()),
            "dst": pa.array(p["o_y"], pa.string()),
            "n": pa.array(np.ones(len(p), np.int64)),
        }, schema=pair_sch)

    edges = bucketed_sum_combine(
        _conv_bucketed_legs(triples_ds, (_SCHEMA_ABOUT,), num_partitions)
        .groupby("part").map_groups(sym_pairs, batch_format="pandas"),
        keys=["src", "dst"], sum_cols=["n"], schema=pair_sch,
        num_partitions=P,
    )

    # no adjacency co-location exchange needed: each hop's per-batch cut
    # is a PARTIAL and the driver finalizes over the bounded candidate
    # set, so the sample is exact under ANY block layout
    adj = edges.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow",
    ).materialize()

    frontier = list(seeds)
    visited = set(seeds)
    rows = []
    for hop in range(1, hops + 1):
        fset = set(frontier)
        if not fset:
            break

        cand_sch = pa.schema([
            ("src", pa.string()), ("dst", pa.string()), ("r", pa.string()),
        ])

        # PARTIAL per-batch top-fanout (a src may straddle batch
        # boundaries, so the per-batch head is a candidate cut, not the
        # answer); the driver takes the global top-fanout per src over
        # the bounded candidate set (<= frontier * fanout * blocks rows)
        def sample(batch: pa.Table, _fs=frozenset(fset)) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["src"].isin(_fs)]
            if len(df) == 0:
                return cand_sch.empty_table()
            df = df.assign(r=[
                _hl.md5(f"{s}|{d}".encode()).hexdigest()
                for s, d in zip(df["src"], df["dst"])
            ]).sort_values(["src", "r"], kind="mergesort")
            df = df.groupby("src", as_index=False).head(fanout)
            return pa.table({
                "src": pa.array(df["src"].astype(str), pa.string()),
                "dst": pa.array(df["dst"].astype(str), pa.string()),
                "r": pa.array(df["r"].astype(str), pa.string()),
            }, schema=cand_sch)

        cand = adj.map_batches(sample, batch_format="pyarrow").to_pandas()
        if len(cand) == 0:
            break
        cand = cand.sort_values(["src", "r"], kind="mergesort")
        got = cand.groupby("src", as_index=False).head(fanout)
        got = pd.DataFrame({
            "hop": np.full(len(got), hop, np.int64),
            "src": got["src"].astype(str),
            "dst": got["dst"].astype(str),
        })
        rows.append(got)
        nxt = sorted(set(got["dst"]) - visited)
        visited |= set(nxt)
        frontier = nxt

    allrows = pd.concat(rows, ignore_index=True) if rows else \
        pd.DataFrame({"hop": [], "src": [], "dst": []})
    return rd.from_arrow(pa.Table.from_pandas(
        allrows, preserve_index=False
    ).cast(out_sch) if len(allrows) else out_sch.empty_table())
