"""N-Quads serialization and parsing.

Parity reference: /root/reference/src/json-ld.net/Core/RDFDatasetUtils.cs
(ToNQuad(s) :217-342, Escape/Unescape :348-543, quad regex :545-593,
ParseNQuads :600-703). Escape/unescape follow the Java-lineage semantics
(the C# port's Unescape/Escape have inert format-string bugs that no fixture
exercises; we implement the intended behaviour).
"""

from __future__ import annotations

import re
from typing import Optional

from . import consts
from .errors import JsonLdError
from .rdf import RDFDataset, iri, blank_node, literal, make_quad, quad_key


# ---------------------------------------------------------------------------
# Escaping (RDFDatasetUtils.cs:348-543)
# ---------------------------------------------------------------------------

_ESCAPE_MAP = {
    "\b": "\\b",
    "\n": "\\n",
    "\t": "\\t",
    "\f": "\\f",
    "\r": "\\r",
    '"': '\\"',
    "\\": "\\\\",
}


_NEEDS_ESCAPE = re.compile(
    "[\x00-\x1f\"\\\\\x7f-\xa0ɏ-￿]|[\U00010000-\U0010ffff]"
)


def escape(s: str) -> str:
    # fast path: nothing to escape (the overwhelmingly common case)
    if _NEEDS_ESCAPE.search(s) is None:
        return s
    out = []
    for ch in s:
        c = ord(ch)
        if (
            c <= 0x8
            or c == 0xB
            or c == 0xC
            or (0xE <= c <= 0x1F)
            or (0x7F <= c <= 0xA0)
            or (0x24F <= c <= 0xFFFF)
        ):
            out.append("\\u%04x" % c)
        elif c >= 0x10000:
            out.append("\\U%08x" % c)
        elif ch in _ESCAPE_MAP:
            out.append(_ESCAPE_MAP[ch])
        else:
            out.append(ch)
    return "".join(out)


_UNESCAPE_RE = re.compile(
    r"\\(?:([tbnrf\"'\\])|(?:u([0-9A-Fa-f]{4}))|(?:U([0-9A-Fa-f]{8})))"
)

_UNESCAPE_MAP = {
    "b": "\b",
    "n": "\n",
    "t": "\t",
    "f": "\f",
    "r": "\r",
    "'": "'",
    '"': '"',
    "\\": "\\",
}


def unescape(s: Optional[str]) -> Optional[str]:
    if s is None:
        return None

    def sub(m: re.Match) -> str:
        if m.group(1) is not None:
            return _UNESCAPE_MAP[m.group(1)]
        hex_ = m.group(2) if m.group(2) is not None else m.group(3)
        return chr(int(hex_, 16))

    return _UNESCAPE_RE.sub(sub, s)


# ---------------------------------------------------------------------------
# Serialization (RDFDatasetUtils.cs:217-342)
# ---------------------------------------------------------------------------

def to_nquad(triple: dict, graph_name: Optional[str],
             bnode: Optional[str] = None) -> str:
    """Serialize one quad. With ``bnode`` set (normalization mode) blank nodes
    serialize as ``_:a`` (self) / ``_:z`` (other) / ``_:g`` (graph)."""
    s = triple["subject"]
    p = triple["predicate"]
    o = triple["object"]
    quad = ""
    if s["type"] == "IRI":
        quad += "<" + escape(s["value"]) + ">"
    elif bnode is not None:
        quad += "_:a" if bnode == s["value"] else "_:z"
    else:
        quad += s["value"]
    if p["type"] == "IRI":
        quad += " <" + escape(p["value"]) + "> "
    else:
        quad += " " + escape(p["value"]) + " "
    if o["type"] == "IRI":
        quad += "<" + escape(o["value"]) + ">"
    elif o["type"] == "blank node":
        if bnode is not None:
            quad += "_:a" if bnode == o["value"] else "_:z"
        else:
            quad += o["value"]
    else:
        quad += '"' + escape(o["value"]) + '"'
        if o.get("datatype") == consts.RDF_LANGSTRING:
            lang = o.get("language", "")
            if lang:
                quad += "@" + lang
            else:
                # ill-formed langString with no tag: a bare '"v"@ ' fails
                # this module's own _QUAD regex on re-parse, so emit the
                # datatype explicitly (valid N-Quads, info-preserving)
                quad += "^^<" + escape(consts.RDF_LANGSTRING) + ">"
        elif o.get("datatype") != consts.XSD_STRING:
            quad += "^^<" + escape(o["datatype"]) + ">"
    if graph_name is not None:
        if not graph_name.startswith("_:"):
            quad += " <" + escape(graph_name) + ">"
        elif bnode is not None:
            quad += " _:g"
        else:
            quad += " " + graph_name
    quad += " .\n"
    return quad


def to_nquads(dataset: RDFDataset) -> str:
    """Dataset -> globally sorted concatenated N-Quads (RDFDatasetUtils.cs:217-242)."""
    quads = []
    for graph_name in dataset.graph_names():
        triples = dataset.get_quads(graph_name)
        gname = None if graph_name == "@default" else graph_name
        for triple in triples:
            quads.append(to_nquad(triple, gname))
    quads.sort(key=lambda q: q.encode("utf-16-be", "surrogatepass"))
    return "".join(quads)


# ---------------------------------------------------------------------------
# Parsing (RDFDatasetUtils.cs:545-703)
# ---------------------------------------------------------------------------

_HEX = "[0-9A-Fa-f]"
_UCHAR = r"\\u" + _HEX + r"{4}|\\U" + _HEX + r"{8}"
_IRI = r"(?:<((?:[^\x00-\x20<>\"{}|^`\\]|" + _UCHAR + r")*)>)"
_BNODE = r"(_:(?:[A-Za-z0-9](?:[A-Za-z0-9\-\.]*[A-Za-z0-9])?))"
_ECHAR = r"\\[tbnrf\"'\\]"
_PLAIN = r"\"((?:[^\x22\x5C\x0A\x0D]|" + _ECHAR + r"|" + _UCHAR + r")*)\""
_DATATYPE = r"(?:\^\^" + _IRI + r")"
_LANGUAGE = r"(?:@([a-z]+(?:-[a-zA-Z0-9]+)*))"
_LITERAL = r"(?:" + _PLAIN + r"(?:" + _DATATYPE + r"|" + _LANGUAGE + r")?)"
_WSO = r"[ \t]*"
_EMPTY_OR_COMMENT = re.compile(r"^" + _WSO + r"(#.*)?$")
_SUBJECT = r"(?:" + _IRI + r"|" + _BNODE + r")" + _WSO
_PROPERTY = _IRI + _WSO
_OBJECT = r"(?:" + _IRI + r"|" + _BNODE + r"|" + _LITERAL + r")" + _WSO
_GRAPH = r"(?:\.|(?:(?:" + _IRI + r"|" + _BNODE + r")" + _WSO + r"\.))"
_QUAD = re.compile(
    r"^" + _WSO + _SUBJECT + _PROPERTY + _OBJECT + _GRAPH + _WSO + r"(#.*)?$"
)
_EOLN = re.compile(r"(?:\r\n)|(?:\n)|(?:\r)")

_ABSOLUTE_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _assert_absolute_iri(iri_str: str, line_number: int = 0) -> None:
    """Approximates the reference's .NET absolute-URI validation
    (RDFDatasetUtils.cs:705-711). line_number (when known) lands in the
    message so a bad IRI in a multi-thousand-line file is locatable."""
    if not _ABSOLUTE_IRI.match(iri_str) or " " in iri_str:
        where = f" line:{line_number}" if line_number else ""
        raise JsonLdError(
            JsonLdError.SYNTAX_ERROR, f"Invalid absolute URI <{iri_str}>{where}"
        )


def _decode_quad_groups(g, line_number: int = 0):
    """Matched _QUAD groups -> (subject, predicate, obj, graph_name) node
    dicts. Shared by the RDFDataset parser and the row-level fast path."""
    # groups: 1 subj-iri, 2 subj-bnode, 3 pred-iri, 4 obj-iri, 5 obj-bnode,
    #         6 literal, 7 datatype, 8 language, 9 graph-iri, 10 graph-bnode
    if g[0] is not None:
        subject_iri = unescape(g[0])
        _assert_absolute_iri(subject_iri, line_number)
        subject = iri(subject_iri)
    else:
        subject = blank_node(unescape(g[1]))
    predicate_iri = unescape(g[2])
    _assert_absolute_iri(predicate_iri, line_number)
    predicate = iri(predicate_iri)
    if g[3] is not None:
        object_iri = unescape(g[3])
        _assert_absolute_iri(object_iri, line_number)
        obj = iri(object_iri)
    elif g[4] is not None:
        obj = blank_node(unescape(g[4]))
    else:
        language = unescape(g[7])
        if g[6] is not None:
            datatype = unescape(g[6])
        elif g[7] is not None:
            datatype = consts.RDF_LANGSTRING
        else:
            datatype = consts.XSD_STRING
        _assert_absolute_iri(datatype, line_number)
        obj = literal(unescape(g[5]), datatype, language)
    name = "@default"
    if g[8] is not None:
        name = unescape(g[8])
        _assert_absolute_iri(name, line_number)
    elif g[9] is not None:
        name = unescape(g[9])
    return subject, predicate, obj, name


def parse_nquad_line(line: str):
    """One N-Quads line -> (graph, subj, pred, obj_kind, obj_value,
    obj_datatype, obj_lang) row tuple, or None for an empty/comment line.
    Raises SYNTAX_ERROR on an invalid quad. The row-level fast path for
    distributed line-sharded readers — no per-line RDFDataset allocation."""
    if _EMPTY_OR_COMMENT.match(line):
        return None
    match = _QUAD.match(line)
    if match is None:
        raise JsonLdError(
            JsonLdError.SYNTAX_ERROR,
            "Error while parsing N-Quads; invalid quad.",
        )
    subject, _predicate, obj, name = _decode_quad_groups(match.groups())
    kind = obj["type"]
    return (
        name,
        subject["value"],
        _predicate["value"],
        kind,
        obj["value"],
        obj.get("datatype", "") if kind == "literal" else "",
        obj.get("language") or "",
    )


def parse_nquads(input_: str) -> RDFDataset:
    dataset = RDFDataset()
    seen: dict = {}
    for line_number, line in enumerate(_EOLN.split(input_), start=1):
        if _EMPTY_OR_COMMENT.match(line):
            continue
        match = _QUAD.match(line)
        if match is None:
            raise JsonLdError(
                JsonLdError.SYNTAX_ERROR,
                "Error while parsing N-Quads; invalid quad. line:" + str(line_number),
            )
        subject, predicate, obj, name = _decode_quad_groups(
            match.groups(), line_number
        )
        triple = make_quad(subject, predicate, obj, name)
        # per-graph exact dedup (value semantics; RDFDatasetUtils.cs:686-691)
        key = quad_key(triple)
        graph_seen = seen.setdefault(name, set())
        if name not in dataset:
            dataset[name] = []
        if key not in graph_seen:
            graph_seen.add(key)
            dataset[name].append(triple)
    return dataset
