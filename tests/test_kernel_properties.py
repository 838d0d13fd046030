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
