"""The seven reference API operations (SURVEY.md §2.1 A1-A7) + N-Quads ser/de
(S1-S2) as distributed Ray Data stages over the transcript corpus's JSON-LD
tool payloads.

Each op runs inside map_batches with the kernel; outputs are deterministic
summaries (counts / hashes / round-trip flags) so results are stable across
parallelism levels and resumable runs."""

from __future__ import annotations

import hashlib
import json

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


def n_conversations_for(sf_dir: str) -> int:
    """Deterministic conversation count scaled to the sf directory size."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return max(50, n_docs)


def _tool_docs(sf_dir: str):
    """Dataset of (conv_id, turn_idx, doc_json) for JSON-LD-shaped payloads."""
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


def _op_stage(fn):
    """Wrap a per-doc kernel op into a vectorized batch stage."""

    def stage(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        docs = batch["doc"].to_pylist()
        out = [fn(json.loads(d)) for d in docs]
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int32()),
                "result": pa.array([json.dumps(o, sort_keys=True) for o in out], pa.string()),
            }
        )

    return stage


def op_expand(sf_dir: str):
    """A1 Expand (JsonLdProcessor.cs:64-155) distributed per tool doc."""
    return _tool_docs(sf_dir).map_batches(
        _op_stage(lambda d: {"n_nodes": len(expand(d, JsonLdOptions("")))}),
        batch_format="pyarrow",
    )


def op_compact_roundtrip(sf_dir: str):
    """A2 Compact: expand -> compact with a shared context -> re-expand must
    round-trip (deep_compare)."""

    def fn(d):
        opts = JsonLdOptions("")
        expanded = expand(d, opts)
        compacted = compact(expanded, _COMPACT_CTX, JsonLdOptions(""))
        reexpanded = expand(compacted, JsonLdOptions(""))
        return {"roundtrip_ok": bool(deep_compare(expanded, reexpanded))}

    return _tool_docs(sf_dir).map_batches(_op_stage(fn), batch_format="pyarrow")


def op_flatten(sf_dir: str):
    """A3 Flatten: node count of the flattened default graph."""

    def fn(d):
        flat = flatten(d, None, JsonLdOptions(""))
        return {"n_flat_nodes": len(flat)}

    return _tool_docs(sf_dir).map_batches(_op_stage(fn), batch_format="pyarrow")


def op_frame(sf_dir: str):
    """A4 Frame: match count against a fixed @type frame."""

    def fn(d):
        framed = frame(d, dict(_FRAME), JsonLdOptions(""))
        graph = framed.get("@graph", [])
        return {"n_framed": len(graph)}

    return _tool_docs(sf_dir).map_batches(_op_stage(fn), batch_format="pyarrow")


def op_tordf(sf_dir: str):
    """A5 ToRDF + S1 serialize: triple count + sha1 of canonical N-Quads."""

    def fn(d):
        opts = JsonLdOptions("")
        opts.format = "application/nquads"
        nq = to_rdf(d, opts)
        return {
            "n_lines": nq.count("\n"),
            "sha1": hashlib.sha1(nq.encode("utf-8")).hexdigest(),
        }

    return _tool_docs(sf_dir).map_batches(_op_stage(fn), batch_format="pyarrow")


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
        return {"roundtrip_ok": nq == nq2, "n_lines": nq.count("\n")}

    return _tool_docs(sf_dir).map_batches(_op_stage(fn), batch_format="pyarrow")


def op_normalize(sf_dir: str):
    """A7 Normalize: sha1 of the canonical (URGNA2012-lineage) N-Quads."""

    def fn(d):
        opts = JsonLdOptions("")
        opts.format = "application/nquads"
        canonical = normalize(d, opts)
        return {"c14n_sha1": hashlib.sha1(canonical.encode("utf-8")).hexdigest()}

    return _tool_docs(sf_dir).map_batches(_op_stage(fn), batch_format="pyarrow")
