"""Distributed RDF text sources: N-Quads and Turtle files -> triples Dataset.

- N-Quads is line-delimited: `read_text` shards lines across blocks and a
  stateless map_batches decodes each line with the kernel's row-level fast
  path (`parse_nquad_line` — no per-line RDFDataset allocation). Malformed
  lines quarantine into the @error graph like the JSON-LD readers, so one
  corrupt line never kills a multi-TB read (set ``on_error="raise"`` for
  strict mode). The per-graph dedup of the reference's ParseNQuads becomes
  a downstream groupby when exactness is required (dedup=True).
- Turtle is NOT line-splittable (statements span lines, prefixes are
  document-scoped), so each FILE is the unit of parallelism:
  `read_binary_files` + a per-file kernel parse.

BLANK-NODE SCOPING (``scope_bnodes=True``, the default): bnode labels are
document-scoped per the spec, so label-identical bnodes from DIFFERENT
files are distinct nodes. The readers rewrite every ``_:label`` to
``_:f<md5(path)>-label`` so a unioned multi-file Dataset never conflates
them (read_jsonld_lines scopes per LINE — one line is one document there).
Pass ``scope_bnodes=False`` to keep raw labels (single-file reads, or when
the caller scopes by the ``source`` column itself).

Output schema matches the pipeline triples table minus conv_id:
(graph, subj, pred, obj_kind, obj_value, obj_datatype, obj_lang) plus
``source`` (file path) for lineage.
"""

from __future__ import annotations

import hashlib

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

_ERROR_PRED = "https://rayld.dev/vocab#processingError"
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _dataset_to_rows(dataset, source: str) -> dict:
    from ..kernel.rdf import dataset_to_columns

    cols = dataset_to_columns(dataset)
    cols["source"] = [source] * len(cols["graph"])
    return cols


def _file_scope(path: str) -> str:
    return hashlib.md5(path.encode()).hexdigest()[:12]


def _requalify_rows(rows: dict, scope: str) -> None:
    """Rewrite document-scoped ``_:label`` -> ``_:f<scope>-label`` in place
    (subjects, graph names, node objects — literal text is never touched)."""
    pre = f"_:f{scope}-"
    for i in range(len(rows["subj"])):
        if rows["subj"][i].startswith("_:"):
            rows["subj"][i] = pre + rows["subj"][i][2:]
        if rows["graph"][i].startswith("_:"):
            rows["graph"][i] = pre + rows["graph"][i][2:]
        if rows["obj_kind"][i] != "literal" and rows["obj_value"][i].startswith(
            "_:"
        ):
            rows["obj_value"][i] = pre + rows["obj_value"][i][2:]


def _error_row(cols: dict, path: str, subj: str, err: str) -> None:
    cols["source"].append(path)
    cols["graph"].append("@error")
    cols["subj"].append(subj)
    cols["pred"].append(_ERROR_PRED)
    cols["obj_kind"].append("literal")
    cols["obj_value"].append(err)
    cols["obj_datatype"].append(_XSD_STRING)
    cols["obj_lang"].append("")


def read_nquads(paths, dedup: bool = True, scope_bnodes: bool = True,
                on_error: str = "quarantine"):
    """N-Quads files -> triples Dataset. Lines decode independently per
    batch through the kernel's row-level fast path; with dedup=True exact
    duplicate quads collapse globally (hash-key aggregate — the distributed
    form of ParseNQuads' per-graph Contains check,
    RDFDatasetUtils.cs:686-691). Bnode labels are file-scoped (see module
    docstring); malformed lines quarantine into @error unless
    ``on_error="raise"``."""
    import ray.data as rd

    from ..kernel import JsonLdError
    from ..kernel.nquads import parse_nquad_line

    ds = rd.read_text(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {f.name: [] for f in RDF_ROWS_SCHEMA}
        scopes: dict = {}
        for path, line in zip(batch["path"].to_pylist(),
                              batch["text"].to_pylist()):
            try:
                row = parse_nquad_line(line)
            except JsonLdError as err:
                if on_error == "raise":
                    raise
                _error_row(cols, path, path, f"{err}: {line[:200]}")
                continue
            if row is None:
                continue
            graph, subj, pred, kind, value, dtype, lang = row
            if scope_bnodes:
                scope = scopes.get(path)
                if scope is None:
                    scope = scopes[path] = f"_:f{_file_scope(path)}-"
                if subj.startswith("_:"):
                    subj = scope + subj[2:]
                if graph.startswith("_:"):
                    graph = scope + graph[2:]
                if kind != "literal" and value.startswith("_:"):
                    value = scope + value[2:]
            cols["source"].append(path)
            cols["graph"].append(graph)
            cols["subj"].append(subj)
            cols["pred"].append(pred)
            cols["obj_kind"].append(kind)
            cols["obj_value"].append(value)
            cols["obj_datatype"].append(dtype)
            cols["obj_lang"].append(lang)
        return pa.Table.from_pydict(cols, schema=RDF_ROWS_SCHEMA)

    rows = ds.map_batches(parse, batch_format="pyarrow")
    if not dedup:
        return rows

    from ray.data.aggregate import Count, Min

    cols = [f.name for f in RDF_ROWS_SCHEMA]
    key_cols = [c for c in cols if c != "source"]

    if scope_bnodes:
        # labels are file-unique after requalification, so the quad fields
        # alone are the dedup key: bnode quads from different files differ
        # textually, ground quads collapse globally
        agg = rows.groupby(key_cols).aggregate(
            Min("source", alias_name="source"),
            Count(alias_name="n_dup"),
        )
        return _restore_error_multiplicity(agg, cols)

    def add_scope(batch: pa.Table) -> pa.Table:
        """Raw labels (scope_bnodes=False): a quad touching a blank node
        only collapses within its own file — its dedup scope is the source
        path. Ground quads (no bnodes) dedup globally (scope '')."""
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
    ).aggregate(Min("source", alias_name="source"), Count(alias_name="n_dup"))
    return _restore_error_multiplicity(agg, cols)


def _restore_error_multiplicity(agg, cols):
    """@error quarantine rows are per-LINE diagnostics, not quads: the quad
    dedup must not collapse repeated identical corrupt lines, or the
    quarantine count (the feature's whole point) silently undercounts. The
    aggregate carries each group's multiplicity (``n_dup``) and this map
    re-expands error rows to it; real quads keep exactly one survivor."""
    import numpy as np
    import pyarrow.compute as pc

    def restore(batch: pa.Table) -> pa.Table:
        is_err = pc.equal(batch["graph"], "@error").to_numpy(
            zero_copy_only=False
        )
        if not is_err.any():
            return batch.select(cols)
        n = batch["n_dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        repeats = np.where(is_err, n, 1)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), repeats)
        return batch.take(pa.array(idx)).select(cols)

    return agg.map_batches(restore, batch_format="pyarrow")


def read_turtle(paths, scope_bnodes: bool = True):
    """Turtle files -> triples Dataset; one kernel parse per file (Turtle
    statements are document-scoped, so the file is the parallelism unit).
    Bnode labels are file-scoped by default (see module docstring)."""
    import ray.data as rd

    from ..kernel.turtle import parse_turtle

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: dict) -> pa.Table:
        cols = {f.name: [] for f in RDF_ROWS_SCHEMA}
        for path, data in zip(batch["path"], batch["bytes"]):
            text = bytes(data).decode("utf-8-sig")
            parsed = parse_turtle(text)
            rows = _dataset_to_rows(parsed, path)
            if scope_bnodes:
                _requalify_rows(rows, _file_scope(path))
            for k, v in rows.items():
                cols[k].extend(v)
        return pa.Table.from_pydict(cols, schema=RDF_ROWS_SCHEMA)

    return ds.map_batches(parse, batch_format="numpy")


def read_jsonld(paths, options=None, scope_bnodes: bool = True):
    """JSON-LD document files -> triples Dataset: per-file kernel
    expand -> toRDF (A1+A5 distributed over a document corpus). Documents
    that fail processing quarantine into the @error graph with the typed
    error string instead of failing the job. Bnode labels are file-scoped
    by default (see module docstring)."""
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
                if scope_bnodes:
                    _requalify_rows(rows, _file_scope(path))
                for k, v in rows.items():
                    cols[k].extend(v)
            except (JsonLdError, ValueError) as err:
                _error_row(cols, path, path, str(err))
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
                _error_row(cols, path, f"{path}#{scope}", str(err))
        return pa.Table.from_pydict(cols, schema=RDF_ROWS_SCHEMA)

    return ds.map_batches(parse, batch_format="pyarrow")
