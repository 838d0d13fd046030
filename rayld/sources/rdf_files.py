"""Distributed RDF text sources: N-Quads and Turtle files -> triples Dataset.

- N-Quads is line-delimited: `read_text` shards lines across blocks and a
  stateless map_batches parses each line with the kernel quad regex — the
  per-graph dedup of the reference's ParseNQuads becomes a downstream
  groupby when exactness is required (dedup=True).
- Turtle is NOT line-splittable (statements span lines, prefixes are
  document-scoped), so each FILE is the unit of parallelism:
  `read_binary_files` + a per-file kernel parse.

Output schema matches the pipeline triples table minus conv_id:
(graph, subj, pred, obj_kind, obj_value, obj_datatype, obj_lang) plus
``source`` (file path) for lineage.
"""

from __future__ import annotations

import pyarrow as pa

RDF_ROWS_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("graph", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj_kind", pa.string()),
        ("obj_value", pa.string()),
        ("obj_datatype", pa.string()),
        ("obj_lang", pa.string()),
    ]
)


def _dataset_to_rows(dataset, source: str) -> dict:
    cols = {f.name: [] for f in RDF_ROWS_SCHEMA}
    for graph_name in dataset.graph_names():
        for quad in dataset.get_quads(graph_name):
            o = quad["object"]
            cols["source"].append(source)
            cols["graph"].append(graph_name)
            cols["subj"].append(quad["subject"]["value"])
            cols["pred"].append(quad["predicate"]["value"])
            cols["obj_kind"].append(o["type"])
            cols["obj_value"].append(o["value"])
            cols["obj_datatype"].append(
                o.get("datatype", "") if o["type"] == "literal" else ""
            )
            cols["obj_lang"].append(o.get("language") or "")
    return cols


def read_nquads(paths, dedup: bool = True):
    """N-Quads files -> triples Dataset. Lines parse independently per
    batch; with dedup=True exact duplicate quads collapse globally
    (hash-key aggregate — the distributed form of ParseNQuads' per-graph
    Contains check, RDFDatasetUtils.cs:686-691)."""
    import ray.data as rd

    from ..kernel.nquads import parse_nquads

    ds = rd.read_text(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {f.name: [] for f in RDF_ROWS_SCHEMA}
        for path, line in zip(batch["path"].to_pylist(), batch["text"].to_pylist()):
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            parsed = parse_nquads(line)
            rows = _dataset_to_rows(parsed, path)
            for k, v in rows.items():
                cols[k].extend(v)
        return pa.Table.from_pydict(cols, schema=RDF_ROWS_SCHEMA)

    rows = ds.map_batches(parse, batch_format="pyarrow")
    if not dedup:
        return rows

    from ray.data.aggregate import Min

    cols = [f.name for f in RDF_ROWS_SCHEMA]
    key_cols = [c for c in cols if c != "source"]

    def add_scope(batch: pa.Table) -> pa.Table:
        """Blank-node labels are DOCUMENT-scoped (the reference's ParseNQuads
        dedup is per-document, RDFDatasetUtils.cs:686-691), so a quad touching
        a blank node only collapses within its own file: its dedup scope is
        the source path. Ground quads (no bnodes) dedup globally (scope '')."""
        import pyarrow.compute as pc

        bnode_subj = pc.starts_with(batch["subj"], "_:")
        bnode_graph = pc.starts_with(batch["graph"], "_:")
        # a literal's text may start with "_:", so gate on obj_kind
        bnode_obj = pc.and_(
            pc.invert(pc.equal(batch["obj_kind"], "literal")),
            pc.starts_with(batch["obj_value"], "_:"),
        )
        any_bnode = pc.or_(bnode_subj, pc.or_(bnode_graph, bnode_obj))
        scope = pc.if_else(any_bnode, batch["source"], "")
        return batch.append_column("scope", scope)

    # multi-column groupby: the quad fields (+ scope) ARE the key — no
    # per-row hash loop; Min(source) keeps one lineage path per quad
    agg = rows.map_batches(add_scope, batch_format="pyarrow").groupby(
        key_cols + ["scope"]
    ).aggregate(Min("source", alias_name="source"))
    return agg.drop_columns(["scope"]).select_columns(cols)


def read_turtle(paths):
    """Turtle files -> triples Dataset; one kernel parse per file (Turtle
    statements are document-scoped, so the file is the parallelism unit)."""
    import ray.data as rd

    from ..kernel.turtle import parse_turtle

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        cols = {f.name: [] for f in RDF_ROWS_SCHEMA}
        for path, data in zip(batch["path"], batch["bytes"]):
            text = bytes(data).decode("utf-8-sig")
            parsed = parse_turtle(text)
            rows = _dataset_to_rows(parsed, path)
            for k, v in rows.items():
                cols[k].extend(v)
        return pa.Table.from_pydict(cols, schema=RDF_ROWS_SCHEMA)

    return ds.map_batches(parse, batch_format="numpy")


def read_jsonld(paths, options=None):
    """JSON-LD document files -> triples Dataset: per-file kernel
    expand -> toRDF (A1+A5 distributed over a document corpus). Documents
    that fail processing quarantine into the @error graph with the typed
    error string instead of failing the job."""
    import json as _json

    import ray.data as rd

    from ..kernel import JsonLdError, JsonLdOptions, to_rdf

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        cols = {f.name: [] for f in RDF_ROWS_SCHEMA}
        for path, data in zip(batch["path"], batch["bytes"]):
            try:
                doc = _json.loads(bytes(data).decode("utf-8-sig"))
                dataset = to_rdf(doc, options or JsonLdOptions(""))
                rows = _dataset_to_rows(dataset, path)
                for k, v in rows.items():
                    cols[k].extend(v)
            except (JsonLdError, ValueError) as err:
                cols["source"].append(path)
                cols["graph"].append("@error")
                cols["subj"].append(path)
                cols["pred"].append("https://rayld.dev/vocab#processingError")
                cols["obj_kind"].append("literal")
                cols["obj_value"].append(str(err))
                cols["obj_datatype"].append(
                    "http://www.w3.org/2001/XMLSchema#string"
                )
                cols["obj_lang"].append("")
        return pa.Table.from_pydict(cols, schema=RDF_ROWS_SCHEMA)

    return ds.map_batches(parse, batch_format="numpy")


def read_jsonld_lines(paths, options=None):
    """NDJSON JSON-LD corpus (one document per line, the export_jsonld sink
    layout) -> triples Dataset. Lines shard across blocks like N-Quads, so
    a 100-TB corpus parallelizes by line range, not by file count.

    Blank-node labels are DOCUMENT-scoped per the spec, and one file holds
    many documents, so each line's fresh ``_:bN`` labels are rewritten to
    ``_:<md5(path + line)>-N`` — two anonymous nodes from different lines
    can never collide (byte-identical lines in one corpus share a scope,
    matching the reference's per-document dedup semantics,
    RDFDatasetUtils.cs:686-691)."""
    import hashlib
    import json as _json

    import ray.data as rd

    from ..kernel import JsonLdError, JsonLdOptions, to_rdf

    ds = rd.read_text(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {f.name: [] for f in RDF_ROWS_SCHEMA}
        for path, line in zip(
            batch["path"].to_pylist(), batch["text"].to_pylist()
        ):
            if not line.strip():
                continue
            scope = hashlib.md5(
                (path + "\x00" + line).encode()
            ).hexdigest()[:16]

            def requalify(term: str) -> str:
                return f"_:{scope}-{term[2:]}" if term.startswith("_:") else term

            try:
                doc = _json.loads(line)
                dataset = to_rdf(doc, options or JsonLdOptions(""))
                rows = _dataset_to_rows(dataset, path)
                for i in range(len(rows["subj"])):
                    rows["subj"][i] = requalify(rows["subj"][i])
                    rows["graph"][i] = requalify(rows["graph"][i])
                    if rows["obj_kind"][i] != "literal":
                        rows["obj_value"][i] = requalify(rows["obj_value"][i])
                for k, v in rows.items():
                    cols[k].extend(v)
            except (JsonLdError, ValueError) as err:
                cols["source"].append(path)
                cols["graph"].append("@error")
                cols["subj"].append(f"{path}#{scope}")
                cols["pred"].append("https://rayld.dev/vocab#processingError")
                cols["obj_kind"].append("literal")
                cols["obj_value"].append(str(err))
                cols["obj_datatype"].append(
                    "http://www.w3.org/2001/XMLSchema#string"
                )
                cols["obj_lang"].append("")
        return pa.Table.from_pydict(cols, schema=RDF_ROWS_SCHEMA)

    return ds.map_batches(parse, batch_format="pyarrow")
