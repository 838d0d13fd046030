"""Turtle reader/writer plugins.

Parity reference: /root/reference/src/json-ld.net/Impl/TurtleRDFParser.cs
(regex table :16-88, State :90-234, Parse :236-690, UnescapeReserved /
UnquoteString :692-733) and Impl/TurtleTripleCallback.cs (writer). The
terminal regexes mirror Core/Regex.cs:1-89. The writer implements the
*intended* (Java-lineage) iteration semantics — the C# port's consuming
MoveNext() calls drop alternate objects, which no fixture depends on.
"""

from __future__ import annotations

import re
from typing import Optional

from . import consts
from .errors import JsonLdError
from .nquads import unescape
from .normalize import UniqueNamer
from .rdf import RDFDataset

# ---------------------------------------------------------------------------
# Terminals (Core/Regex.cs)
# ---------------------------------------------------------------------------

_PN_CHARS_BASE = (
    "(?:[a-zA-Z]|[À-Ö]|[Ø-ö]|[ø-˿]|[Ͱ-ͽ]"
    "|[Ϳ-῿]|[‌-‍]|[⁰-↏]|[Ⰰ-⿯]"
    "|[、-퟿]|[豈-﷏]|[ﷰ-�])"
)
_PN_CHARS_U = f"(?:{_PN_CHARS_BASE}|[_])"
_PN_CHARS = f"(?:{_PN_CHARS_U}|[-0-9]|[·]|[̀-ͯ]|[‿-⁀])"
_PN_PREFIX = f"(?:(?:{_PN_CHARS_BASE})(?:(?:{_PN_CHARS}|[.])*(?:{_PN_CHARS}))?)"
_HEX = "[0-9A-Fa-f]"
_PN_LOCAL_ESC = r"[\\][_~.\-!$&'()*+,;=/?#@%]"
_PERCENT = f"%{_HEX}{_HEX}"
_PLX = f"(?:{_PERCENT}|{_PN_LOCAL_ESC})"
_PN_LOCAL = (
    f"((?:{_PN_CHARS_U}|[:]|[0-9]|{_PLX})"
    f"(?:(?:{_PN_CHARS}|[.]|[:]|{_PLX})*(?:{_PN_CHARS}|[:]|{_PLX}))?)"
)
_PNAME_NS = f"((?:{_PN_PREFIX})?):"
_PNAME_LN = f"{_PNAME_NS}{_PN_LOCAL}"
_UCHAR = f"\\\\u{_HEX}{{4}}|\\\\U{_HEX}{{8}}"
_ECHAR = "\\\\[tbnrf\\\\\"']"
_IRIREF = f"(?:<((?:[^\\x00-\\x20<>\"{{}}|\\^`\\\\]|{_UCHAR})*)>)"
_BLANK_NODE_LABEL = (
    f"(?:_:((?:{_PN_CHARS_U}|[0-9])(?:(?:{_PN_CHARS}|[.])*(?:{_PN_CHARS}))?))"
)
_WS = "[ \t\r\n]"
_WS_0_N = f"{_WS}*"
_WS_1_N = f"{_WS}+"
_STRING_LITERAL_QUOTE = f"\"(?:[^\\u0022\\u005C\\u000A\\u000D]|(?:{_ECHAR})|(?:{_UCHAR}))*\""
_STRING_LITERAL_SINGLE_QUOTE = f"'(?:[^\\u0027\\u005C\\u000A\\u000D]|(?:{_ECHAR})|(?:{_UCHAR}))*'"
_STRING_LITERAL_LONG_SINGLE_QUOTE = f"'''(?:(?:(?:'|'')?[^'\\\\])|{_ECHAR}|{_UCHAR})*'''"
_STRING_LITERAL_LONG_QUOTE = f'"""(?:(?:(?:"|"")?[^"\\\\])|{_ECHAR}|{_UCHAR})*"""'
_LANGTAG = "(?:@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*))"
_INTEGER = "[+-]?[0-9]+"
_DECIMAL = r"[+-]?[0-9]*\.[0-9]+"
_EXPONENT = "[eE][+-]?[0-9]+"
_DOUBLE = (
    f"[+-]?(?:(?:[0-9]+\\.[0-9]*{_EXPONENT})|(?:\\.[0-9]+{_EXPONENT})"
    f"|(?:[0-9]+{_EXPONENT}))"
)

# ---------------------------------------------------------------------------
# Composite patterns (TurtleRDFParser.Regex) — capture-group order matches
# the reference so the dispatch logic lines up
# ---------------------------------------------------------------------------

_PREFIX_ID = f"@prefix{_WS_1_N}{_PNAME_NS}{_WS_1_N}{_IRIREF}{_WS_0_N}\\.{_WS_0_N}"
_BASE = f"@base{_WS_1_N}{_IRIREF}{_WS_0_N}\\.{_WS_0_N}"
_SPARQL_PREFIX = f"[Pp][Rr][Ee][Ff][Ii][Xx]{_WS}{_PNAME_NS}{_WS}{_IRIREF}{_WS_0_N}"
_SPARQL_BASE = f"[Bb][Aa][Ss][Ee]{_WS}{_IRIREF}{_WS_0_N}"
_PREFIXED_NAME = f"(?:{_PNAME_LN}|{_PNAME_NS})"
_IRI_PAT = f"(?:{_IRIREF}|{_PREFIXED_NAME})"
_ANON = f"(?:\\[{_WS}*\\])"
_BLANK_NODE = f"{_BLANK_NODE_LABEL}|{_ANON}"
_STRING = (
    f"({_STRING_LITERAL_LONG_SINGLE_QUOTE}|{_STRING_LITERAL_LONG_QUOTE}"
    f"|{_STRING_LITERAL_QUOTE}|{_STRING_LITERAL_SINGLE_QUOTE})"
)
_RDF_LITERAL = f"{_STRING}(?:{_LANGTAG}|\\^\\^{_IRI_PAT})?"
_NUMERIC_LITERAL = f"({_DOUBLE})|({_DECIMAL})|({_INTEGER})"
_BOOLEAN_LITERAL = "(true|false)"
_LITERAL_PAT = f"{_RDF_LITERAL}|{_NUMERIC_LITERAL}|{_BOOLEAN_LITERAL}"

DIRECTIVE = re.compile(f"^(?:{_PREFIX_ID}|{_BASE}|{_SPARQL_PREFIX}|{_SPARQL_BASE})")
SUBJECT = re.compile(f"^{_IRI_PAT}|{_BLANK_NODE}")
PREDICATE = re.compile(f"^{_IRI_PAT}|a{_WS_1_N}")
OBJECT = re.compile(f"^{_IRI_PAT}|{_BLANK_NODE}|{_LITERAL_PAT}")
_EOLN = "(?:\r\n)|(?:\n)|(?:\r)"
COMMENT_OR_WS = re.compile(f"^(?:(?:[#].*(?:{_EOLN}){_WS_0_N})|(?:{_WS_1_N}))")
_IRIREF_MINUS_CONTAINER = re.compile(
    f"(?:(?:[^\\x00-\\x20<>\"{{}}|\\^`\\\\]|{_UCHAR})*)$|{_PREFIXED_NAME}$"
)
_PN_LOCAL_ESC_MATCHED = re.compile(r"[\\]([_~.\-!$&'()*+,;=/?#@%])")


def _unescape_reserved(s: Optional[str]) -> Optional[str]:
    if s is None:
        return None
    return _PN_LOCAL_ESC_MATCHED.sub(r"\1", s)


def _unquote_string(value: str) -> str:
    if value.startswith('"""') or value.startswith("'''"):
        return value[3:-3]
    if value.startswith('"') or value.startswith("'"):
        return value[1:-1]
    return value


class _State:
    def __init__(self, input_: str):
        self.base_iri = ""
        self.namespaces: dict = {}
        self.cur_subject: Optional[str] = None
        self.cur_predicate: Optional[str] = None
        self.line = input_
        self.line_number = 1
        self.line_position = 0
        self.namer = UniqueNamer("_:b")
        self.stack: list = []
        self.expecting_bnode_close = False
        self.advance_line_position(0)

    def push(self):
        self.stack.append((self.cur_subject, self.cur_predicate))
        self.expecting_bnode_close = True
        self.cur_subject = None
        self.cur_predicate = None

    def pop(self):
        if self.stack:
            self.cur_subject, self.cur_predicate = self.stack.pop()
        if not self.stack:
            self.expecting_bnode_close = False

    def advance_line_position(self, length: int):
        if length > 0:
            self.line_position += length
            self.line = self.line[length:]
        while self.line != "":
            m = COMMENT_OR_WS.match(self.line)
            if m is not None and len(m.group(0)) > 0:
                ws_len = len(m.group(0))
                end = None
                for em in re.finditer(_EOLN, m.group(0)):
                    self.line_number += 1
                    end = em.end()
                if end is None:
                    # no newline in the skipped run: the column ADVANCES
                    # (overwriting it reported wrong error positions)
                    self.line_position += ws_len
                else:
                    self.line_position = ws_len - end
                self.line = self.line[ws_len:]
            else:
                break
        if self.line == "" and not (self.cur_subject is None and not self.stack):
            raise JsonLdError(
                JsonLdError.PARSE_ERROR,
                "Error while parsing Turtle; unexpected end of input. "
                f"{{line: {self.line_number}, position:{self.line_position}}}",
            )

    def expand_iri(self, ns: str, name: str) -> str:
        if ns in self.namespaces:
            return self.namespaces[ns] + name
        raise JsonLdError(
            JsonLdError.PARSE_ERROR,
            f"No prefix found for: {ns} "
            f"{{line: {self.line_number}, position:{self.line_position}}}",
        )


def _validate_iri(state: _State, iri_str: str) -> None:
    if _IRIREF_MINUS_CONTAINER.match(iri_str) is None:
        raise JsonLdError(
            JsonLdError.PARSE_ERROR,
            "Error while parsing Turtle; invalid IRI after escaping. "
            f"{{line: {state.line_number}, position:{state.line_position}}}",
        )


def _resolve_iri_groups(state: _State, m: re.Match) -> Optional[str]:
    """Groups 1-5 of SUBJECT/PREDICATE/OBJECT: IRIREF, ns, local, ns-only,
    bnode label."""
    if m.group(1) is not None:
        iri_str = unescape(m.group(1))
        if ":" not in iri_str:
            iri_str = state.base_iri + iri_str
        return iri_str
    if m.group(2) is not None:
        return state.expand_iri(m.group(2), _unescape_reserved(m.group(3)))
    if m.group(4) is not None:
        return state.expand_iri(m.group(4), "")
    if m.group(5) is not None:
        return state.namer.get_name(m.group(0).strip())
    return None


def parse_turtle(input_: object) -> RDFDataset:
    """TurtleRDFParser.Parse (TurtleRDFParser.cs:236-690)."""
    if not isinstance(input_, str):
        raise JsonLdError(
            JsonLdError.INVALID_INPUT,
            "Invalid input; Triple RDF Parser requires a string input",
        )
    result = RDFDataset()
    state = _State(input_)
    while state.line != "":
        # directives
        m = DIRECTIVE.search(state.line)
        if m is not None:
            if m.group(1) is not None or m.group(4) is not None:
                ns = m.group(1) if m.group(1) is not None else m.group(4)
                iri_str = m.group(2) if m.group(1) is not None else m.group(5)
                if ":" not in iri_str:
                    iri_str = state.base_iri + iri_str
                iri_str = unescape(iri_str)
                _validate_iri(state, iri_str)
                state.namespaces[ns] = iri_str
                result.set_namespace(ns, iri_str)
            else:
                base = m.group(3) if m.group(3) is not None else m.group(6)
                base = unescape(base)
                _validate_iri(state, base)
                if ":" not in base:
                    state.base_iri = state.base_iri + base
                else:
                    state.base_iri = base
            state.advance_line_position(len(m.group(0)))
            continue
        if state.cur_subject is None:
            m = SUBJECT.search(state.line)
            if m is not None:
                iri_str = _resolve_iri_groups(state, m)
                if iri_str is None:
                    # matched anon node
                    iri_str = state.namer.get_name()
                _validate_iri(state, iri_str)
                state.cur_subject = iri_str
                state.advance_line_position(len(m.group(0)))
            elif state.line.startswith("["):
                bnode = state.namer.get_name()
                state.advance_line_position(1)
                state.push()
                state.cur_subject = bnode
            elif state.line.startswith("("):
                bnode = state.namer.get_name()
                state.cur_subject = bnode
                state.advance_line_position(1)
                state.push()
                state.cur_subject = bnode
                state.cur_predicate = consts.RDF_FIRST
            else:
                raise JsonLdError(
                    JsonLdError.PARSE_ERROR,
                    "Error while parsing Turtle; missing expected subject. "
                    f"{{line: {state.line_number}position: {state.line_position}}}",
                )
        if state.cur_predicate is None:
            m = PREDICATE.search(state.line)
            if m is not None:
                if m.group(1) is not None:
                    iri_str = unescape(m.group(1))
                    if ":" not in iri_str:
                        iri_str = state.base_iri + iri_str
                elif m.group(2) is not None:
                    iri_str = state.expand_iri(m.group(2), _unescape_reserved(m.group(3)))
                elif m.group(4) is not None:
                    iri_str = state.expand_iri(m.group(4), "")
                else:
                    iri_str = consts.RDF_TYPE
                _validate_iri(state, iri_str)
                state.cur_predicate = iri_str
                state.advance_line_position(len(m.group(0)))
            else:
                raise JsonLdError(
                    JsonLdError.PARSE_ERROR,
                    "Error while parsing Turtle; missing expected predicate. "
                    f"{{line: {state.line_number}position: {state.line_position}}}",
                )
        # expecting bnode or object
        if state.line.startswith("["):
            bnode = state.namer.get_name()
            result.add_triple(state.cur_subject, state.cur_predicate, bnode)
            state.advance_line_position(1)
            if state.line.startswith("]"):
                state.advance_line_position(1)
            else:
                state.push()
                state.cur_subject = bnode
                continue
        elif state.line.startswith("("):
            state.advance_line_position(1)
            if state.line.startswith(")"):
                state.advance_line_position(1)
                result.add_triple(state.cur_subject, state.cur_predicate, consts.RDF_NIL)
            else:
                bnode = state.namer.get_name()
                result.add_triple(state.cur_subject, state.cur_predicate, bnode)
                state.push()
                state.cur_subject = bnode
                state.cur_predicate = consts.RDF_FIRST
                continue
        else:
            m = OBJECT.search(state.line)
            if m is None:
                raise JsonLdError(
                    JsonLdError.PARSE_ERROR,
                    "Error while parsing Turtle; missing expected object or blank "
                    f"node. {{line: {state.line_number}position: {state.line_position}}}",
                )
            iri_str = _resolve_iri_groups(state, m)
            if iri_str is not None:
                _validate_iri(state, iri_str)
                result.add_triple(state.cur_subject, state.cur_predicate, iri_str)
            else:
                value = m.group(6)
                lang = None
                datatype = None
                if value is not None:
                    value = _unquote_string(value)
                    value = unescape(value)
                    lang = m.group(7)
                    if lang is None:
                        if m.group(8) is not None:
                            datatype = unescape(m.group(8))
                            if ":" not in datatype:
                                datatype = state.base_iri + datatype
                            _validate_iri(state, datatype)
                        elif m.group(9) is not None:
                            datatype = state.expand_iri(
                                m.group(9), _unescape_reserved(m.group(10))
                            )
                        elif m.group(11) is not None:
                            datatype = state.expand_iri(m.group(11), "")
                    else:
                        datatype = consts.RDF_LANGSTRING
                elif m.group(12) is not None:
                    value = m.group(12)
                    datatype = consts.XSD_DOUBLE
                elif m.group(13) is not None:
                    value = m.group(13)
                    datatype = consts.XSD_DECIMAL
                elif m.group(14) is not None:
                    value = m.group(14)
                    datatype = consts.XSD_INTEGER
                elif m.group(15) is not None:
                    value = m.group(15)
                    datatype = consts.XSD_BOOLEAN
                result.add_triple(
                    state.cur_subject, state.cur_predicate, value, datatype, lang,
                    is_literal=True,
                )
            state.advance_line_position(len(m.group(0)))
        # close collection(s)
        collection_closed = False
        while state.line.startswith(")"):
            if state.cur_predicate != consts.RDF_FIRST:
                raise JsonLdError(
                    JsonLdError.PARSE_ERROR,
                    "Error while parsing Turtle; unexpected ). "
                    f"{{line: {state.line_number}position: {state.line_position}}}",
                )
            result.add_triple(state.cur_subject, consts.RDF_REST, consts.RDF_NIL)
            state.pop()
            state.advance_line_position(1)
            collection_closed = True
        expect_dot_or_pred = False
        # match end of bnode(s) — a WHILE, not an if: directly nested
        # property lists close with "] ]", which the single-close version
        # rejected (the writer emits that shape for list nodes carrying
        # extra predicates, so the parser must accept it)
        while state.line.startswith("]"):
            bnode = state.cur_subject
            state.pop()
            state.advance_line_position(1)
            if state.cur_subject is None:
                state.cur_subject = bnode
                expect_dot_or_pred = True
                break
        # list separator
        if not expect_dot_or_pred and state.line.startswith(","):
            state.advance_line_position(1)
            continue
        # predicate end
        if not expect_dot_or_pred:
            while state.line.startswith(";"):
                state.cur_predicate = None
                state.advance_line_position(1)
                expect_dot_or_pred = True
        if state.line.startswith("."):
            if state.expecting_bnode_close:
                raise JsonLdError(
                    JsonLdError.PARSE_ERROR,
                    'Error while parsing Turtle; missing expected )"]". '
                    f"{{line: {state.line_number}position: {state.line_position}}}",
                )
            state.cur_subject = None
            state.cur_predicate = None
            state.advance_line_position(1)
            continue
        elif expect_dot_or_pred:
            continue
        # inside a collection
        if state.cur_predicate == consts.RDF_FIRST:
            bnode = state.namer.get_name()
            result.add_triple(state.cur_subject, consts.RDF_REST, bnode)
            state.cur_subject = bnode
            continue
        if collection_closed:
            continue
        raise JsonLdError(
            JsonLdError.PARSE_ERROR,
            'Error while parsing Turtle; missing expected "]" "," ";" or ".". '
            f"{{line: {state.line_number}position: {state.line_position}}}",
        )
    return result


# ---------------------------------------------------------------------------
# Writer (Impl/TurtleTripleCallback.cs, Java-intended iteration semantics)
# ---------------------------------------------------------------------------

_MAX_LINE_LENGTH = 160
_TAB_SPACES = 4
_COLS_KEY = "..cols.."
_PN_LOCAL_FULL = re.compile(_PN_LOCAL)


def _bnode_cycle_members(adj: dict) -> set:
    """Nodes of the bnode reference graph that sit on a directed cycle
    (iterative three-color DFS; self-loops count). Small per-dataset
    graphs — conversations reference a handful of bnodes."""
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {u: WHITE for u in adj}
    on_cycle: set = set()
    for root in adj:
        if color[root] != WHITE:
            continue
        stack = [(root, iter(sorted(adj.get(root, ()))))]
        color[root] = GRAY
        path = [root]
        while stack:
            u, it = stack[-1]
            advanced = False
            for v in it:
                if v not in adj and v not in color:
                    continue  # leaf bnode with no outgoing refs
                c = color.get(v, WHITE)
                if c == GRAY:
                    # back edge: everything from v on the current path
                    # (inclusive) is on a cycle
                    i = path.index(v)
                    on_cycle.update(path[i:])
                elif c == WHITE:
                    color[v] = GRAY
                    stack.append((v, iter(sorted(adj.get(v, ())))))
                    path.append(v)
                    advanced = True
                    break
            if not advanced:
                color[u] = BLACK
                stack.pop()
                path.pop()
        # path bookkeeping: loop ends with empty stack/path per root
    return on_cycle


class _TurtleWriter:
    def __init__(self):
        self.available_namespaces: dict = {}
        self.used_namespaces: set = set()
        self._labeled_bnodes: set = set()

    def call(self, dataset: RDFDataset) -> str:
        for ns, prefix in dataset.get_namespaces().items():
            self.available_namespaces[prefix] = ns
        self.used_namespaces = set()
        refs: dict = {}
        ttl: dict = {}
        bnode_adj: dict = {}  # bnode subject -> referenced bnodes
        for graph_name in dataset.keys():
            triples = dataset.get_quads(graph_name)
            for triple in triples:
                subject = triple["subject"]["value"]
                predicate = triple["predicate"]["value"]
                this_subject = ttl.setdefault(subject, {})
                this_predicate = this_subject.setdefault(predicate, [])
                obj = triple["object"]
                if obj["type"] == "literal":
                    this_predicate.append(obj)
                else:
                    o = obj["value"]
                    if o.startswith("_:"):
                        refs.setdefault(o, []).append(this_predicate)
                        if subject.startswith("_:"):
                            bnode_adj.setdefault(subject, set()).add(o)
                    this_predicate.append(o)
        # multiply-referenced bnodes must keep their LABEL (see below); a
        # first/rest chain that starts at — or runs through — such a node
        # cannot be collapsed into a "( ... )" collection without severing
        # the other references, so those chains keep explicit
        # rdf:first/rdf:rest triples instead.  Computed BEFORE the collapse
        # walk (the walk only removes or swaps refs entries, never changes
        # reference multiplicity).
        self._labeled_bnodes = {
            id_ for id_, r in refs.items() if len(r) > 1
        }
        # bnodes on a REFERENCE CYCLE must also keep their labels: the
        # inline walk would otherwise pop every cycle member into a
        # structure reachable only from refs and emit NOTHING (silent
        # triple loss on e.g. _:a <p> _:b . _:b <p> _:a .)
        self._labeled_bnodes |= _bnode_cycle_members(bnode_adj)
        collections: dict = {}
        for subj in list(ttl.keys()):
            preds = ttl.get(subj)
            if preds is not None and consts.RDF_FIRST in preds:
                if subj in self._labeled_bnodes or not self._chain_collapsible(
                    subj, ttl, collections
                ):
                    continue
                col: list = []
                collections[subj] = col
                while True:
                    first = preds.pop(consts.RDF_FIRST)
                    o = first[0]
                    col.append(o)
                    if isinstance(o, str) and o in refs:
                        if first in refs[o]:
                            refs[o].remove(first)
                        refs[o].append(col)
                    next_ = preds.pop(consts.RDF_REST)[0]
                    if next_ == consts.RDF_NIL:
                        break
                    if next_ in collections:
                        col.extend(collections.pop(next_))
                        break
                    preds = ttl.pop(next_, None)
                    refs.pop(next_, None)
                    if preds is None:
                        break
        # nest single-reference bnodes; multiply-referenced bnodes must keep
        # their LABEL at top level (an anonymous [ ] form would sever the
        # other references — like the escaping fix above, we deviate from the
        # reference writer to emit valid, identity-preserving Turtle)
        for id_ in list(refs.keys()):
            if len(refs[id_]) > 1 or id_ in self._labeled_bnodes:
                continue
            obj = ttl.pop(id_, None)
            if obj is None:
                obj = {}  # dangling bnode ref -> empty anonymous node [ ]
            if id_ in collections:
                obj = {_COLS_KEY: [collections.pop(id_)]}
            predicate = refs[id_][0]
            for i in range(len(predicate) - 1, -1, -1):
                if predicate[i] == id_:
                    predicate[i] = obj
                    break
        # remaining collections
        for id_1, col in collections.items():
            subj_1 = ttl.setdefault(id_1, {})
            subj_1.setdefault(_COLS_KEY, []).append(col)
        output = self._generate_turtle(ttl, 0, 0, False)
        prefixes = ""
        for prefix in sorted(self.used_namespaces):
            name = self.available_namespaces[prefix]
            prefixes += f"@prefix {name}: <{prefix}> .\n"
        return ("" if prefixes == "" else prefixes + "\n") + output

    def _chain_collapsible(self, subj: str, ttl: dict, collections: dict) -> bool:
        """Read-only pre-walk mirroring the collapse loop's transitions.

        Returns False when the chain reaches a multiply-referenced (labeled)
        node, lacks a well-formed rdf:rest link, or cycles — those chains
        stay as explicit rdf:first/rdf:rest triples.
        """
        preds = ttl[subj]
        visited = {subj}
        chain_keys = {consts.RDF_FIRST, consts.RDF_REST}
        while True:
            if set(preds.keys()) - chain_keys:
                # a chain node carrying OTHER predicates cannot collapse
                # into "( ... )" without dropping those triples
                return False
            rest = preds.get(consts.RDF_REST)
            if not rest:
                return False
            next_ = rest[0]
            if next_ == consts.RDF_NIL:
                return True
            if next_ in self._labeled_bnodes:
                return False
            if next_ in collections:
                return True  # merging into an already-validated chain
            if next_ in visited:
                return False  # cyclic rest chain
            visited.add(next_)
            preds = ttl.get(next_)
            if preds is None:
                # rest target has no triples: collapsing would silently
                # rewrite it to rdf:nil — keep explicit first/rest
                return False
            if consts.RDF_FIRST not in preds:
                return False

    def _get_uri(self, uri: str) -> str:
        if uri.startswith("_:"):
            return uri
        for prefix in self.available_namespaces.keys():
            if uri.startswith(prefix):
                local = uri[len(prefix):]
                # only emit a prefixed name the module's own parser accepts
                # (PN_LOCAL); anything else falls back to <IRI> — the
                # reference writer emits invalid names like ex:a/b(1)
                if local != "" and _PN_LOCAL_FULL.fullmatch(local) is None:
                    continue
                self.used_namespaces.add(prefix)
                return self.available_namespaces[prefix] + ":" + local
        return "<" + uri + ">"

    def _generate_object(self, obj_in, sep: str, has_next: bool,
                         indentation: int, line_length: int) -> str:
        rval = ""
        if isinstance(obj_in, str):
            obj = self._get_uri(obj_in)
        elif isinstance(obj_in, dict) and obj_in.get("type") == "literal":
            # escape the literal body (the reference writer emits raw
            # backslashes/quotes, which its own parser then rejects — we
            # produce valid Turtle instead)
            from .nquads import escape as _nq_escape

            obj = _nq_escape(obj_in["value"])
            lang = obj_in.get("language")
            dt = obj_in.get("datatype")
            if lang is not None:
                obj = f'"{obj}"@{lang}'
            elif dt is not None:
                if dt not in (
                    consts.XSD_DOUBLE, consts.XSD_INTEGER, consts.XSD_FLOAT,
                    consts.XSD_BOOLEAN,
                ):
                    obj = f'"{obj}"'
                    if dt != consts.XSD_STRING:
                        obj += "^^" + self._get_uri(dt)
            else:
                obj = f'"{obj}"'
        else:
            # nested bnode object
            obj = self._generate_turtle({"_:x": obj_in}, indentation + 1,
                                        line_length, True)
        idxofcr = obj.find("\n")
        if (1 if has_next else 0) + line_length + (
            idxofcr if idxofcr != -1 else len(obj)
        ) > _MAX_LINE_LENGTH:
            rval += "\n" + " " * (_TAB_SPACES * (indentation + 1))
            line_length = (indentation + 1) * _TAB_SPACES
        rval += obj
        if idxofcr != -1:
            line_length += len(obj) - obj.rfind("\n")
        else:
            line_length += len(obj)
        if has_next:
            rval += sep
            line_length += len(sep)
            if line_length < _MAX_LINE_LENGTH:
                rval += " "
            else:
                rval += "\n"
        return rval

    def _generate_turtle(self, ttl: dict, indentation: int, line_length: int,
                         is_object: bool) -> str:
        rval = ""
        subjects = list(ttl.keys())
        for si, subject in enumerate(subjects):
            subjval = ttl[subject]
            has_open_bnode_bracket = False
            if subject.startswith("_:"):
                if not is_object and subject in self._labeled_bnodes:
                    rval += subject + " "
                    line_length += len(subject) + 1
                elif _COLS_KEY not in subjval:
                    rval += "[ "
                    line_length += 2
                    has_open_bnode_bracket = True
                else:
                    cols = subjval.pop(_COLS_KEY)
                    for collection in cols:
                        rval += "( "
                        line_length += 2
                        for oi, obj in enumerate(collection):
                            rval += self._generate_object(
                                obj, "", oi < len(collection) - 1, indentation,
                                line_length,
                            )
                            line_length = len(rval) - rval.rfind("\n")
                        rval += " ) "
                        line_length += 3
            else:
                rval += self._get_uri(subject) + " "
                line_length += len(subject) + 1
            predicates = list(subjval.keys())
            for pi, predicate in enumerate(predicates):
                rval += self._get_uri(predicate) + " "
                line_length += len(predicate) + 1
                objs = subjval[predicate]
                for oi, obj in enumerate(objs):
                    rval += self._generate_object(
                        obj, ",", oi < len(objs) - 1, indentation, line_length
                    )
                    line_length = len(rval) - rval.rfind("\n")
                if pi < len(predicates) - 1:
                    rval += " ;\n" + " " * (_TAB_SPACES * (indentation + 1))
                    line_length = (indentation + 1) * _TAB_SPACES
            if has_open_bnode_bracket:
                rval += " ]"
            if not is_object:
                rval += " .\n"
                if si < len(subjects) - 1:
                    rval += "\n"
        return rval


def to_turtle(dataset: RDFDataset) -> str:
    return _TurtleWriter().call(dataset)
