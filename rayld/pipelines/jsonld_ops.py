"""The seven reference API operations (SURVEY.md §2.1 A1-A7) + N-Quads ser/de
(S1-S2) as distributed Ray Data stages over the transcript corpus's JSON-LD
tool payloads.

Each op runs inside map_batches with the kernel and emits TYPED metric
columns (counts / 0-1 flags / hashes), deterministic across parallelism
levels. The tool-doc corpus itself is materialized once per scale to a shared
Parquet path (tool_docs_parquet) that BOTH the Ray ops and the DuckDB oracle
read — the oracle recomputes the expected counts structurally with DuckDB's
JSON functions over the very same file, so the distributed kernel results are
SQL-checkable (the driver's value-hash gate), not just rows-counted.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

from ..kernel import (
    JsonLdOptions,
    compact,
    expand,
    flatten,
    frame,
    from_rdf,
    normalize,
    to_rdf,
)
from ..kernel.utils import deep_compare
from ..sources.transcripts import transcripts_dataset

_COMPACT_CTX = {
    "sc": "http://schema.org/",
    "rl": "https://rayld.dev/vocab#",
    "val": {"@id": "http://schema.org/value", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
}

_FRAME = {"@type": "http://schema.org/SearchAction"}

# path contract with __ray_entry__.oracle_sql(): the oracle reads
# TOOLDOC_CURRENT/*.parquet — a PROCESS-scoped symlink (queries() and
# oracle_sql() run in the same driver process, so both resolve the same
# link, while two concurrent runs at different scales each own their own
# link and can never repoint each other's between the Ray materialization
# and the DuckDB read)
TOOLDOC_ROOT = "/tmp/rayld_tooldocs"
TOOLDOC_CURRENT = os.path.join(TOOLDOC_ROOT, f"current-{os.getpid()}")


def _reap_stale_links() -> None:
    """Unlink current-<pid> symlinks whose owning process is gone, so
    long-lived hosts don't accumulate one dead link per past driver run.
    Best-effort: racing reapers / permission errors are ignored."""
    import glob

    for link in glob.glob(os.path.join(TOOLDOC_ROOT, "current-*")):
        try:
            pid = int(link.rsplit("-", 1)[1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            try:
                os.unlink(link)
            except OSError:
                pass
        except OSError:
            pass


def n_conversations_for(sf_dir: str) -> int:
    """Deterministic conversation count scaled to the sf directory size."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return max(50, n_docs)


def _tool_docs(sf_dir: str):
    """Dataset of (conv_id, turn_idx, doc) for JSON-LD-shaped payloads."""
    ds = transcripts_dataset(n_conversations_for(sf_dir))

    def pick(batch: pa.Table) -> pa.Table:
        conv, turn, docs = [], [], []
        for c, t, tool in zip(
            batch["conv_id"].to_pylist(),
            batch["turn_idx"].to_pylist(),
            batch["tool"].to_pylist(),
        ):
            if not tool:
                continue
            try:
                payload = json.loads(tool)
            except ValueError:
                continue
            if isinstance(payload, dict) and "@context" in payload:
                conv.append(c)
                turn.append(t)
                docs.append(tool)
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int32()),
                "doc": pa.array(docs, pa.string()),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def tool_docs_parquet(sf_dir: str) -> str:
    """Materialize the tool-doc corpus for this scale as Parquet (once; the
    write streams through Ray and is cached by conversation count), then
    atomically point TOOLDOC_CURRENT at it. Returns the concrete directory.

    This is the shared input file of the jsonld_* oracle rows: DuckDB reads
    TOOLDOC_CURRENT/*.parquet and recomputes the expected metrics
    structurally, so Ray op and oracle see byte-identical inputs."""
    from ..sources.transcripts import CORPUS_REV

    n = n_conversations_for(sf_dir)
    final = os.path.join(TOOLDOC_ROOT, f"n{n}-r{CORPUS_REV}")
    done = os.path.join(TOOLDOC_ROOT, f"n{n}-r{CORPUS_REV}.done")
    os.makedirs(TOOLDOC_ROOT, exist_ok=True)
    if not os.path.exists(done):
        tmp = os.path.join(TOOLDOC_ROOT, f".tmp-n{n}-{os.getpid()}")
        _tool_docs(sf_dir).write_parquet(tmp)
        if os.path.exists(final):  # lost a race; keep the winner
            import shutil

            shutil.rmtree(tmp)
        else:
            try:
                os.rename(tmp, final)
            except OSError:  # raced past the exists-check; keep the winner
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        with open(done, "w") as f:
            f.write("ok")
    tmp_link = os.path.join(TOOLDOC_ROOT, f".lnk-{os.getpid()}")
    try:
        os.symlink(final, tmp_link)
        os.replace(tmp_link, TOOLDOC_CURRENT)
    except OSError:
        if os.path.islink(tmp_link):
            os.unlink(tmp_link)
    _reap_stale_links()
    return final


# Flagship-triples sample materialization — the same path contract as
# tool_docs_parquet, for the kg_* STRUCTURAL oracles (verdict-r3 item 5):
# the Ray aggregate queries and the DuckDB recount both read the one
# materialized triples parquet, so per-pred counts / degree histograms /
# co-occurrence / BGP results are value-hash-checked, not rows-counted.
# Two process-scoped links because the kg queries run at two sample
# sizes (full vs n/5).
KGTRIPLES_ROOT = "/tmp/rayld_kgtriples"


def kg_triples_current(tag: str) -> str:
    return os.path.join(KGTRIPLES_ROOT, f"current-{os.getpid()}-{tag}")


def _reap_stale_kg_links() -> None:
    import glob

    for link in glob.glob(os.path.join(KGTRIPLES_ROOT, "current-*")):
        try:
            pid = int(link.rsplit("-", 2)[1])
        except (ValueError, IndexError):
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            try:
                os.unlink(link)
            except OSError:
                pass
        except OSError:
            pass


def kg_triples_parquet(sf_dir: str, n: int, tag: str) -> str:
    """Materialize build_triples(transcripts_dataset(n)) as Parquet once
    per (n, corpus revision) and atomically point the process-scoped
    ``tag`` link at it. Deterministic: the pipeline is retry-value-
    identical (CLAUDE.md contract), so a cached materialization equals a
    fresh one."""
    from ..sources.transcripts import CORPUS_REV
    from .kg import build_triples

    final = os.path.join(KGTRIPLES_ROOT, f"n{n}-r{CORPUS_REV}")
    done = final + ".done"
    os.makedirs(KGTRIPLES_ROOT, exist_ok=True)
    if not os.path.exists(done):
        tmp = os.path.join(KGTRIPLES_ROOT, f".tmp-n{n}-{os.getpid()}")
        build_triples(transcripts_dataset(n)).write_parquet(tmp)
        if os.path.exists(final):  # lost a race; keep the winner
            import shutil

            shutil.rmtree(tmp)
        else:
            try:
                os.rename(tmp, final)
            except OSError:  # raced past the exists-check; keep the winner
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        with open(done, "w") as f:
            f.write("ok")
    link = kg_triples_current(tag)
    tmp_link = os.path.join(KGTRIPLES_ROOT, f".lnk-{os.getpid()}-{tag}")
    try:
        os.symlink(final, tmp_link)
        os.replace(tmp_link, link)
    except OSError:
        if os.path.islink(tmp_link):
            os.unlink(tmp_link)
    _reap_stale_kg_links()
    return final


def _tool_docs_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        tool_docs_parquet(sf_dir), columns=["conv_id", "turn_idx", "doc"]
    )


def _op_stage(metric_cols: dict, fn):
    """Wrap a per-doc kernel op into a batch stage emitting typed metric
    columns. ``metric_cols`` maps column name -> pyarrow type; ``fn`` returns
    a dict with those keys per document."""

    def stage(batch: pa.Table) -> pa.Table:
        docs = batch["doc"].to_pylist()
        outs = [fn(json.loads(d)) for d in docs]
        cols = {
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].cast(pa.int64()),
        }
        for name, typ in metric_cols.items():
            cols[name] = pa.array([o[name] for o in outs], typ)
        return pa.table(cols)

    return stage


def op_expand(sf_dir: str):
    """A1 Expand (JsonLdProcessor.cs:64-155) distributed per tool doc.
    n_nodes = top-level node count of the expanded array (SQL oracle:
    structural @graph length over the same parquet)."""
    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage(
            {"n_nodes": pa.int64()},
            lambda d: {"n_nodes": len(expand(d, JsonLdOptions("")))},
        ),
        batch_format="pyarrow",
    )


def op_compact_roundtrip(sf_dir: str):
    """A2 Compact: expand -> compact with a shared context -> re-expand must
    round-trip (deep_compare); flag as 0/1 so the invariant is a constant
    column the SQL oracle asserts."""

    def fn(d):
        opts = JsonLdOptions("")
        expanded = expand(d, opts)
        compacted = compact(expanded, _COMPACT_CTX, JsonLdOptions(""))
        reexpanded = expand(compacted, JsonLdOptions(""))
        return {"roundtrip_ok": int(deep_compare(expanded, reexpanded))}

    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage({"roundtrip_ok": pa.int64()}, fn), batch_format="pyarrow"
    )


def op_flatten(sf_dir: str):
    """A3 Flatten: node count of the flattened default graph."""

    def fn(d):
        flat = flatten(d, None, JsonLdOptions(""))
        return {"n_flat_nodes": len(flat)}

    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage({"n_flat_nodes": pa.int64()}, fn), batch_format="pyarrow"
    )


def op_frame(sf_dir: str):
    """A4 Frame: match count against a fixed @type frame."""

    def fn(d):
        framed = frame(d, dict(_FRAME), JsonLdOptions(""))
        graph = framed.get("@graph", [])
        return {"n_framed": len(graph)}

    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage({"n_framed": pa.int64()}, fn), batch_format="pyarrow"
    )


def op_tordf(sf_dir: str):
    """A5 ToRDF + S1 serialize: N-Quads line count per document (the SQL
    oracle recomputes it structurally: @graph docs emit 3 quads, @list docs
    2*len(tags)+3, scalar docs 5 — relative-IRI mentions drop per spec)."""

    def fn(d):
        opts = JsonLdOptions("")
        opts.format = "application/nquads"
        nq = to_rdf(d, opts)
        return {"n_lines": nq.count("\n")}

    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage({"n_lines": pa.int64()}, fn), batch_format="pyarrow"
    )


def op_fromrdf_roundtrip(sf_dir: str):
    """A6 FromRDF + S2 ParseNQuads: toRDF -> N-Quads -> parse -> fromRDF ->
    toRDF again must reproduce the same quads."""

    def fn(d):
        opts = JsonLdOptions("")
        opts.format = "application/nquads"
        nq = to_rdf(d, opts)
        back = from_rdf(nq, JsonLdOptions(""))
        opts2 = JsonLdOptions("")
        opts2.format = "application/nquads"
        nq2 = to_rdf(back, opts2)
        return {"roundtrip_ok": int(nq == nq2), "n_lines": nq.count("\n")}

    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage({"roundtrip_ok": pa.int64(), "n_lines": pa.int64()}, fn),
        batch_format="pyarrow",
    )


def op_normalize_check(sf_dir: str):
    """A7 gate: canonicalization is a FIXPOINT — normalize -> fromRDF ->
    normalize must reproduce the byte-identical canonical N-Quads string
    (canonical _:c14nN labels survive the round trip). Runs fully
    distributed per document; the driver hash-checks the flag column
    against a constant-1 oracle, giving the c14n path a typed correctness
    row (op_normalize's content hashes are rows-only by nature)."""

    def fn(d):
        opts = JsonLdOptions("")
        opts.format = "application/nquads"
        c1 = normalize(d, opts)
        back = from_rdf(c1, JsonLdOptions(""))
        opts2 = JsonLdOptions("")
        opts2.format = "application/nquads"
        return {"c14n_stable": int(c1 == normalize(back, opts2))}

    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage({"c14n_stable": pa.int64()}, fn), batch_format="pyarrow"
    )


def op_normalize(sf_dir: str):
    """A7 Normalize: sha1 of the canonical (URGNA2012-lineage) N-Quads —
    content hashes are not SQL-expressible, so this op keeps the driver's
    rows-only check; c14n correctness is covered by W3C manifest 57 and the
    hypothesis invariance suite."""

    def fn(d):
        opts = JsonLdOptions("")
        opts.format = "application/nquads"
        canonical = normalize(d, opts)
        return {"c14n_sha1": hashlib.sha1(canonical.encode("utf-8")).hexdigest()}

    return _tool_docs_ds(sf_dir).map_batches(
        _op_stage({"c14n_sha1": pa.string()}, fn), batch_format="pyarrow"
    )
