"""Property-based kernel tests (hypothesis): algebraic invariants the
reference algorithms guarantee, checked over randomized inputs."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from rayld.kernel import (
    JsonLdOptions,
    compact,
    expand,
    flatten,
    normalize,
    parse_nquads,
    to_nquads,
    to_rdf,
)
from rayld.kernel.nquads import escape, unescape

# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------

_name = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_iri = _name.map(lambda s: f"http://ex.org/{s}")
_scalar = st.one_of(
    st.text(max_size=24),
    st.integers(min_value=-10**9, max_value=10**9),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


def _value_obj():
    return st.one_of(
        _scalar,
        st.fixed_dictionaries({"@value": st.text(max_size=16)}),
        st.fixed_dictionaries(
            {"@value": st.text(max_size=16), "@language": st.sampled_from(["en", "de"])}
        ),
        st.fixed_dictionaries({"@id": _iri}),
    )


def _node_obj(depth=2):
    children = _value_obj() if depth == 0 else st.one_of(
        _value_obj(), st.deferred(lambda: _node_obj(depth - 1))
    )
    return st.fixed_dictionaries(
        {"@id": st.one_of(_iri, _name.map(lambda s: f"_:{s}"))},
        optional={
            "http://ex.org/p": st.lists(children, max_size=3),
            "http://ex.org/q": st.lists(children, max_size=2),
            "@type": st.lists(_iri, min_size=1, max_size=2),
        },
    )


_doc = st.lists(_node_obj(), min_size=0, max_size=4)


# ---------------------------------------------------------------------------
# Properties
# ---------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(_doc)
def test_expand_idempotent(doc):
    once = expand(doc, JsonLdOptions(""))
    twice = expand(once, JsonLdOptions(""))
    assert once == twice


@settings(max_examples=60, deadline=None)
@given(_doc)
def test_compact_with_empty_context_then_expand_roundtrips(doc):
    expanded = expand(doc, JsonLdOptions(""))
    compacted = compact(expanded, {}, JsonLdOptions(""))
    reexpanded = expand(compacted, JsonLdOptions(""))
    from rayld.kernel.utils import deep_compare

    assert deep_compare(expanded, reexpanded)


@settings(max_examples=40, deadline=None)
@given(_doc)
def test_tordf_nquads_parse_roundtrip(doc):
    opts = JsonLdOptions("")
    opts.format = "application/nquads"
    nq = to_rdf(doc, opts)
    reparsed = parse_nquads(nq)
    # set equality: toRDF may emit exact-duplicate quads (the reference's
    # node-map seen-set optimization skips value dedup for first-seen @ids,
    # JsonLdApi.cs:1094-1100); ParseNQuads dedups them
    assert set(to_nquads(reparsed).splitlines()) == set(nq.splitlines())


@settings(max_examples=40, deadline=None)
@given(_doc, st.randoms())
def test_normalize_invariant_under_bnode_renaming_and_order(doc, rnd):
    """c14n output must not depend on input bnode labels or node order."""
    opts = JsonLdOptions("")
    opts.format = "application/nquads"
    base = normalize(doc, opts)

    # rename bnode IDENTIFIERS structurally (never literals) and shuffle
    import copy

    def rename(v):
        if isinstance(v, dict):
            out = {}
            for k, val in v.items():
                if k == "@id" and isinstance(val, str) and val.startswith("_:"):
                    out[k] = "_:zz" + val[2:]
                else:
                    out[k] = rename(val)
            return out
        if isinstance(v, list):
            return [rename(i) for i in v]
        return copy.copy(v)

    renamed = rename(doc)
    rnd.shuffle(renamed)
    opts2 = JsonLdOptions("")
    opts2.format = "application/nquads"
    assert normalize(renamed, opts2) == base


@settings(max_examples=40, deadline=None)
@given(_doc)
def test_flatten_node_ids_unique(doc):
    flat = flatten(doc, None, JsonLdOptions(""))
    ids = [n["@id"] for n in flat if isinstance(n, dict) and "@id" in n]
    assert len(ids) == len(set(ids))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=64))
def test_escape_unescape_roundtrip(s):
    assert unescape(escape(s)) == s


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=string.printable, max_size=40))
def test_escaped_literal_reparses(s):
    line = f'<http://ex/s> <http://ex/p> "{escape(s)}" .\n'
    ds = parse_nquads(line)
    assert ds.get_quads("@default")[0]["object"]["value"] == s


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_fromrdf_tordf_canonical_roundtrip(data):
    """For duplicate-free datasets (incl. rdf list chains), fromRDF -> toRDF
    reproduces the same canonical quads. (With duplicate input quads the
    multiset first-degree hashes legitimately differ — fromRDF dedups.)"""
    from rayld.kernel.api import JsonLdApi
    from rayld.kernel.rdf import RDFDataset, quad_key
    from rayld.kernel import from_rdf

    rng = data.draw(st.randoms(use_true_random=False))
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def iri():
        return "http://e/" + "".join(rng.choices("abcd", k=2))

    def node():
        r = rng.random()
        if r < 0.4:
            return iri()
        if r < 0.7:
            return "_:" + "".join(rng.choices("xyz", k=2))
        return None

    ds = RDFDataset()
    seen = set()

    def add(s, p, o, g="@default", lit=False):
        ds.add_quad(s, p, o, g, is_literal=lit)
        q = ds[g][-1]
        if quad_key(q) in seen:
            ds[g].pop()
        else:
            seen.add(quad_key(q))

    for _ in range(rng.randint(1, 8)):
        o = node()
        if o is None:
            add(node() or iri(), iri(), "lit" + str(rng.randint(0, 9)), lit=True)
        else:
            add(node() or iri(), iri(), o)
    if rng.random() < 0.5:
        head = "_:hh"
        add(iri(), iri(), head)
        cur = head
        for k in range(rng.randint(1, 3)):
            add(cur, RDF + "first", "item" + str(k), lit=True)
            nxt = f"_:nn{k}" if rng.random() < 0.5 else RDF + "nil"
            add(cur, RDF + "rest", nxt)
            if nxt.endswith("nil"):
                break
            cur = nxt

    j = from_rdf(ds, JsonLdOptions(""))
    ds2 = JsonLdApi(j, JsonLdOptions("")).to_rdf()
    c1 = to_nquads(JsonLdApi(opts=JsonLdOptions("")).normalize(ds))
    c2 = to_nquads(JsonLdApi(opts=JsonLdOptions("")).normalize(ds2))
    assert c1 == c2
