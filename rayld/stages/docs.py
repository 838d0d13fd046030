"""Turn -> JSON-LD document construction + per-turn expansion.

Pure functions shared by the Ray stage (map_batches over Arrow batches) and
the single-process oracle used in tests — this is what makes the "per-turn
text equality under stable turn ordering" invariant directly checkable
(BASELINE.json input_hint).
"""

from __future__ import annotations

import json
from typing import Optional

from ..kernel import JsonLdOptions, expand as kernel_expand
from ..kernel.api import JsonLdApi
from ..kernel.context import Context

CONV_NS = "https://rayld.dev/conv/"
VOCAB = "https://rayld.dev/vocab#"

# The shared pipeline context — parsed ONCE per worker/actor and reused for
# every turn (SURVEY.md C1-C10: the stateful context cache).
RAYLD_CONTEXT: dict = {
    "schema": "http://schema.org/",
    "rayld": VOCAB,
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "position": {"@id": "http://schema.org/position", "@type": "xsd:integer"},
    "dateCreated": {"@id": "http://schema.org/dateCreated", "@type": "xsd:dateTime"},
    "text": "http://schema.org/text",
    "role": "rayld:role",
    "about": {"@id": "http://schema.org/about", "@type": "@id"},
    "hasPart": {"@id": "http://schema.org/hasPart", "@container": "@list"},
    "toolOutput": "rayld:toolOutput",
    "toolResult": "rayld:toolResult",
}

_PARSED_CONTEXT_CACHE: dict = {}
_CHILD_CONTEXT_CACHE: dict = {}  # per-process memo for in-tree tool contexts


def get_parsed_context(options: Optional[JsonLdOptions] = None) -> Context:
    """Per-process parsed-context cache (built once per distinct options,
    reused per batch). The key covers the option fields context parsing
    actually reads — a fixed key silently served the FIRST caller's options
    to every later caller with a different base."""
    opts = options or JsonLdOptions("")
    key = (opts.base, getattr(opts, "processing_mode", None))
    ctx = _PARSED_CONTEXT_CACHE.get(key)
    if ctx is None:
        ctx = Context(opts).parse(RAYLD_CONTEXT)
        _PARSED_CONTEXT_CACHE[key] = ctx
    return ctx


def conv_iri(conv_id: str) -> str:
    return CONV_NS + conv_id


def turn_iri(conv_id: str, turn_idx: int) -> str:
    return f"{CONV_NS}{conv_id}/turn/{turn_idx}"


def _ts_to_iso(ts_us: int) -> str:
    """Deterministic UTC ISO-8601 from epoch micros (no wall clock)."""
    import datetime as dt

    t = dt.datetime.fromtimestamp(ts_us / 1e6, tz=dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def build_turn_doc(conv_id: str, turn_idx: int, role: str, text: str,
                   tool: str, ts_us: int, entity_iris: list[str]) -> dict:
    """One turn as a JSON-LD node object (un-expanded, no @context — the
    shared pipeline context applies)."""
    doc: dict = {
        "@id": turn_iri(conv_id, turn_idx),
        "@type": "rayld:Turn",
        "role": role,
        "position": turn_idx,
        "dateCreated": _ts_to_iso(ts_us),
        "text": text,
    }
    if entity_iris:
        doc["about"] = list(entity_iris)
    if tool:
        payload = None
        try:
            payload = json.loads(tool)
        except ValueError:  # JSONDecodeError is a ValueError
            payload = None
        if isinstance(payload, dict) and (
            "@context" in payload or "@id" in payload or "@graph" in payload
        ):
            # JSON-LD-shaped tool result: embed (its in-document @context is
            # honoured by the expansion algorithm)
            doc["toolResult"] = payload
        else:
            doc["toolOutput"] = tool
    return doc


def expand_turn_doc(doc: dict, options: Optional[JsonLdOptions] = None) -> list:
    """Expand one turn doc against the cached pipeline context.

    Equivalent to the reference's JsonLdProcessor.Expand of the turn doc with
    ``expandContext`` = RAYLD_CONTEXT (JsonLdProcessor.cs:64-155) — but with
    the context parsed once per process, not once per call.
    """
    opts = options or JsonLdOptions("")
    active_ctx = get_parsed_context(opts)
    api = JsonLdApi(opts=opts, context_cache=_CHILD_CONTEXT_CACHE)
    expanded = api.expand(active_ctx, doc)
    if isinstance(expanded, dict) and "@graph" in expanded and len(expanded) == 1:
        expanded = expanded["@graph"]
    elif expanded is None:
        expanded = []
    if not isinstance(expanded, list):
        expanded = [expanded]
    return expanded


def build_conv_node(conv_id: str, turn_idxs: list[int]) -> dict:
    """The conversation head node: ordered @list of its turns."""
    return {
        "@id": conv_iri(conv_id),
        "@type": "rayld:Conversation",
        "hasPart": [{"@id": turn_iri(conv_id, i)} for i in turn_idxs],
    }


def conversation_expanded(conv_id: str, turns: list[dict],
                          options: Optional[JsonLdOptions] = None) -> list:
    """Single-process oracle: the expanded conversation document.

    ``turns`` are dicts with keys conv_id/turn_idx/role/text/tool/ts_us/
    entity_iris, already in stable turn order.
    """
    nodes = [build_conv_node(conv_id, [t["turn_idx"] for t in turns])]
    for t in turns:
        nodes.append(
            build_turn_doc(
                conv_id, t["turn_idx"], t["role"], t["text"], t["tool"],
                t["ts_us"], t.get("entity_iris", []),
            )
        )
    doc = {"@context": RAYLD_CONTEXT, "@graph": nodes}
    return kernel_expand(doc, options or JsonLdOptions(""))


def triples_rows_from_dataset(conv_id: str, dataset) -> dict:
    """RDFDataset -> columnar triple rows (FIXTURES.md §2 schema); the
    dataset-export core is shared with the rdf_files readers."""
    from ..kernel.rdf import dataset_to_columns

    cols = dataset_to_columns(dataset)
    cols = {"conv_id": [conv_id] * len(cols["graph"]), **cols}
    return cols


def expanded_to_canonical_triples(conv_id: str, expanded_nodes: list,
                                  options: Optional[JsonLdOptions] = None) -> dict:
    """Expanded conversation -> canonicalized triple rows.

    node map -> toRDF (fresh per-conversation bnode counter, matching the
    reference's per-JsonLdApi counter, JsonLdApi.cs:1314-1335) -> per-
    conversation canonical bnode naming (_:c14n, NormalizeUtils.cs:30-205).
    """
    opts = options or JsonLdOptions("")
    api = JsonLdApi(expanded_nodes, opts, clone_input=False)
    dataset = api.to_rdf()
    quads = api.canonicalize_quads(dataset)  # columnar fast path, c14n names
    cols = {
        "conv_id": [], "graph": [], "subj": [], "pred": [],
        "obj_kind": [], "obj_value": [], "obj_datatype": [], "obj_lang": [],
    }
    seen = set()
    for quad in quads:
        o = quad["object"]
        name = quad.get("name")
        kind = o["type"]
        row = (
            name["value"] if name is not None else "@default",
            quad["subject"]["value"],
            quad["predicate"]["value"],
            kind,
            o["value"],
            o.get("datatype", "") if kind == "literal" else "",
            o.get("language") or "",
        )
        if row in seen:  # exact dedup, matching the reference's per-graph
            continue     # dedup in ParseNQuads (RDFDatasetUtils.cs:686-691)
        seen.add(row)
        cols["conv_id"].append(conv_id)
        cols["graph"].append(row[0])
        cols["subj"].append(row[1])
        cols["pred"].append(row[2])
        cols["obj_kind"].append(row[3])
        cols["obj_value"].append(row[4])
        cols["obj_datatype"].append(row[5])
        cols["obj_lang"].append(row[6])
    return cols
