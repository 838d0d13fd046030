"""RDF dataset model + node-map -> quad emission.

Parity reference: /root/reference/src/json-ld.net/Core/RDFDataset.cs
(Quad/Node model :25-399, GraphToRDF :594-711, ObjectToRDF :724-803,
namespaces :427-508).

Nodes are plain dicts — {"type": "IRI"|"blank node"|"literal", "value": str,
["datatype": str, "language": str]} — so they serialize to Arrow rows without
conversion in the Ray engine (SURVEY.md §1.4).
"""

from __future__ import annotations

from typing import Any, Optional

from . import consts
from .utils import (
    is_keyword,
    is_list,
    is_object,
    is_relative_iri,
    is_value,
    sorted_ordinal,
)


def iri(value: str) -> dict:
    return {"type": "IRI", "value": value}


def blank_node(value: str) -> dict:
    return {"type": "blank node", "value": value}


def literal(value: str, datatype: Optional[str] = None,
            language: Optional[str] = None) -> dict:
    node = {
        "type": "literal",
        "value": value,
        "datatype": datatype if datatype is not None else consts.XSD_STRING,
    }
    if language is not None:
        node["language"] = language
    return node


def node_for_id(value: str) -> dict:
    return blank_node(value) if value.startswith("_:") else iri(value)


def make_quad(subject: dict, predicate: dict, obj: dict,
              graph: Optional[str]) -> dict:
    quad = {"subject": subject, "predicate": predicate, "object": obj}
    if graph is not None and graph != "@default":
        quad["name"] = node_for_id(graph)
    return quad


def quad_key(quad: dict) -> tuple:
    """Value identity of a quad — used for exact dedup (the reference intends
    per-graph dedup in ParseNQuads, RDFDatasetUtils.cs:686-691)."""
    def nk(n: Optional[dict]) -> tuple:
        if n is None:
            return ()
        return (n.get("type"), n.get("value"), n.get("datatype"), n.get("language"))

    return (nk(quad.get("name")), nk(quad["subject"]), nk(quad["predicate"]),
            nk(quad["object"]))


def xsd_double_canonical(d: float) -> str:
    """Canonical double form, C# ``{0:0.0###############E0}``
    (RDFDataset.cs:752)."""
    s = f"{d:.15E}"
    mant, exp = s.split("E")
    exp_i = int(exp)
    if "." in mant:
        int_part, frac = mant.split(".")
        frac = frac.rstrip("0") or "0"
        mant = int_part + "." + frac
    else:
        mant = mant + ".0"
    return f"{mant}E{exp_i}"


def object_to_rdf(item: Any, generate_blank_node_identifier=None) -> Optional[dict]:
    """JSON-LD value/node object -> RDF node (RDFDataset.ObjectToRDF,
    RDFDataset.cs:724-803). Returns None for relative-IRI node objects."""
    if is_value(item):
        value = item["@value"]
        datatype = item.get("@type")
        # numeric branch only for JSON-native bool/number values
        # (RDFDataset.cs:732-760: JTokenType Boolean/Float/Integer gate)
        if isinstance(value, bool):
            return literal(
                "true" if value else "false",
                datatype if datatype is not None else consts.XSD_BOOLEAN,
            )
        if isinstance(value, (int, float)):
            if isinstance(value, float) or datatype == consts.XSD_DOUBLE:
                return literal(
                    xsd_double_canonical(float(value)),
                    datatype if datatype is not None else consts.XSD_DOUBLE,
                )
            return literal(
                str(value),
                datatype if datatype is not None else consts.XSD_INTEGER,
            )
        if "@language" in item:
            return literal(
                value,
                datatype if datatype is not None else consts.RDF_LANGSTRING,
                item["@language"],
            )
        return literal(
            str(value), datatype if datatype is not None else consts.XSD_STRING
        )
    # node object / string
    if is_object(item):
        id_ = item.get("@id")
        if is_relative_iri(id_):
            return None
    else:
        id_ = item
    return node_for_id(id_)


class RDFDataset(dict):
    """Named-graph quad store: graphName -> list[quad] (RDFDataset.cs:22,414-419)."""

    def __init__(self, api=None):
        super().__init__()
        self["@default"] = []
        self.context: dict = {}
        self.api = api

    # -- namespaces (RDFDataset.cs:427-508) -----------------------------
    def set_namespace(self, ns: str, prefix: str) -> None:
        self.context[ns] = prefix

    def get_namespace(self, ns: str):
        return self.context.get(ns)

    def clear_namespaces(self) -> None:
        self.context.clear()

    def get_namespaces(self) -> dict:
        return self.context

    def get_context(self) -> dict:
        rval = dict(self.context)
        if "" in rval:
            rval["@vocab"] = rval.pop("")
        return rval

    def parse_context(self, context: dict) -> None:
        for key, val in context.items():
            if key == "@vocab":
                if val is None or isinstance(val, str):
                    self.set_namespace("", val)
            elif key == "@context":
                self.parse_context(context["@context"])
            elif not is_keyword(key):
                if isinstance(val, str):
                    self.set_namespace(key, val)
                elif isinstance(val, dict) and "@id" in val:
                    self.set_namespace(key, val["@id"])

    # -- manual quad insertion (RDFDataset.cs:520-589) ------------------
    def add_triple(self, s: str, p: str, o: str, datatype: Optional[str] = None,
                   language: Optional[str] = None, is_literal: bool = False) -> None:
        self.add_quad(s, p, o, "@default", datatype, language, is_literal)

    def add_quad(self, s: str, p: str, o: str, graph: Optional[str],
                 datatype: Optional[str] = None, language: Optional[str] = None,
                 is_literal: bool = False) -> None:
        if graph is None:
            graph = "@default"
        obj = literal(o, datatype, language) if is_literal else node_for_id(o)
        self.setdefault(graph, []).append(
            make_quad(node_for_id(s), iri(p), obj, graph)
        )

    def graph_names(self) -> list:
        return list(self.keys())

    def get_quads(self, graph_name: str) -> list:
        return self[graph_name]

    # -- node map -> triples (RDFDataset.cs:594-711) --------------------
    def graph_to_rdf(self, graph_name: str, graph: dict) -> None:
        produce_generalized = (
            self.api is not None and self.api.opts.produce_generalized_rdf
        )
        gen_bnode = (
            self.api.generate_blank_node_identifier
            if self.api is not None
            else _FallbackCounter()
        )
        triples: list = []
        for id_ in graph.keys():
            if is_relative_iri(id_):
                continue
            node = graph[id_]
            for prop in sorted_ordinal(node.keys()):
                local_property = prop
                if prop == "@type":
                    values = node["@type"]
                    local_property = consts.RDF_TYPE
                elif is_keyword(local_property):
                    continue
                elif local_property.startswith("_:") and not produce_generalized:
                    continue
                elif is_relative_iri(local_property):
                    continue
                else:
                    values = node[local_property]
                subject = node_for_id(id_)
                predicate = (
                    blank_node(local_property)
                    if local_property.startswith("_:")
                    else iri(local_property)
                )
                for item in values:
                    if is_list(item):
                        # @list -> rdf:first/rest/nil cons chain with fresh
                        # bnodes from the shared per-document counter
                        # (RDFDataset.cs:671-697)
                        lst = item["@list"]
                        last = None
                        first_bnode = iri(consts.RDF_NIL)
                        if lst:
                            last = object_to_rdf(lst[-1])
                            first_bnode = blank_node(gen_bnode())
                        triples.append(
                            make_quad(subject, predicate, first_bnode, graph_name)
                        )
                        for i in range(len(lst) - 1):
                            obj = object_to_rdf(lst[i])
                            triples.append(
                                make_quad(first_bnode, iri(consts.RDF_FIRST), obj, graph_name)
                            )
                            rest_bnode = blank_node(gen_bnode())
                            triples.append(
                                make_quad(first_bnode, iri(consts.RDF_REST), rest_bnode, graph_name)
                            )
                            first_bnode = rest_bnode
                        if last is not None:
                            triples.append(
                                make_quad(first_bnode, iri(consts.RDF_FIRST), last, graph_name)
                            )
                            triples.append(
                                make_quad(
                                    first_bnode, iri(consts.RDF_REST),
                                    iri(consts.RDF_NIL), graph_name,
                                )
                            )
                    else:
                        obj = object_to_rdf(item)
                        if obj is not None:
                            triples.append(make_quad(subject, predicate, obj, graph_name))
        self[graph_name] = triples


class _FallbackCounter:
    def __init__(self):
        self.n = 0

    def __call__(self) -> str:
        bnid = f"_:b{self.n}"
        self.n += 1
        return bnid


def dataset_to_columns(dataset: "RDFDataset") -> dict:
    """RDFDataset -> columnar quad rows (graph, subj, pred, obj_kind,
    obj_value, obj_datatype, obj_lang) as python lists. The shared
    dataset-export core of the distributed readers and the KG stages —
    callers prepend their own lineage column (source path / conv_id)."""
    cols: dict = {
        "graph": [], "subj": [], "pred": [], "obj_kind": [],
        "obj_value": [], "obj_datatype": [], "obj_lang": [],
    }
    for graph_name in dataset.graph_names():
        for quad in dataset.get_quads(graph_name):
            o = quad["object"]
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
