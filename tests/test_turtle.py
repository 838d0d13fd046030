"""Turtle reader/writer tests, including the reference's self-hosting
manifest flow (NQuadsParserTests.cs:15-60: parse manifest.ttl with the Turtle
parser, frame it, and drive the suite from the result)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from rayld.kernel import JsonLdOptions, from_rdf, frame, to_rdf
from rayld.kernel.nquads import to_nquads
from rayld.kernel.turtle import parse_turtle, to_turtle

NQUADS_DIR = Path("/root/reference/test/json-ld.net.tests/NQuads")

MANIFEST_FRAME = {
    "@context": {
        "mf": "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#",
        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        "rdft": "http://www.w3.org/ns/rdftest#",
        "mf:entries": {"@container": "@list"},
        "mf:action": {"@type": "@id"},
    },
    "@type": "mf:Manifest",
}


def test_parse_simple_turtle():
    ttl = """
@prefix ex: <http://example.org/> .
ex:s ex:p ex:o ;
     ex:q "lit"@en , "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
ex:t a ex:Thing .
"""
    ds = parse_turtle(ttl)
    quads = ds.get_quads("@default")
    assert len(quads) == 4
    preds = {q["predicate"]["value"] for q in quads}
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" in preds


def test_parse_collections_and_bnodes():
    ttl = """
@prefix ex: <http://example.org/> .
ex:s ex:list ( ex:a ex:b ex:c ) .
ex:t ex:p [ ex:q "v" ] .
"""
    ds = parse_turtle(ttl)
    quads = ds.get_quads("@default")
    first = [q for q in quads if q["predicate"]["value"].endswith("#first")]
    rest = [q for q in quads if q["predicate"]["value"].endswith("#rest")]
    assert len(first) == 3 and len(rest) == 3


def test_numeric_and_boolean_literals():
    ttl = "@prefix ex: <http://example.org/> .\nex:s ex:a 42 ; ex:b 4.2 ; ex:c 4.2e1 ; ex:d true .\n"
    ds = parse_turtle(ttl)
    dts = sorted(q["object"]["datatype"] for q in ds.get_quads("@default"))
    assert dts == [
        "http://www.w3.org/2001/XMLSchema#boolean",
        "http://www.w3.org/2001/XMLSchema#decimal",
        "http://www.w3.org/2001/XMLSchema#double",
        "http://www.w3.org/2001/XMLSchema#integer",
    ]


def test_parse_error_has_position():
    with pytest.raises(Exception) as ei:
        parse_turtle("this is not turtle at all {")
    assert "line" in str(ei.value)


@pytest.mark.skipif(not NQUADS_DIR.exists(), reason="NQuads fixture tree absent")
def test_self_hosting_manifest_roundtrip():
    txt = (NQUADS_DIR / "manifest.ttl").read_text(encoding="utf-8-sig")
    ds = parse_turtle(txt)
    out = to_turtle(ds)
    ds2 = parse_turtle(out)

    def ground(d):
        return sorted(l for l in to_nquads(d).splitlines() if "_:" not in l)

    assert ground(ds) == ground(ds2)


@pytest.mark.skipif(not NQUADS_DIR.exists(), reason="NQuads fixture tree absent")
def test_manifest_frame_enumerates_suite():
    """Parse manifest.ttl -> fromRDF -> frame: the framed manifest lists the
    suite entries in order (the reference's test-discovery path)."""
    txt = (NQUADS_DIR / "manifest.ttl").read_text(encoding="utf-8-sig")
    opts = JsonLdOptions("")
    expanded = from_rdf(parse_turtle(txt), opts)
    framed = frame(expanded, MANIFEST_FRAME, JsonLdOptions(""))
    graph = framed["@graph"]
    manifest = next(g for g in graph if "mf:entries" in g)
    entries = manifest["mf:entries"]  # @list container -> plain array
    assert len(entries) == 85  # manifest lists 85 of the suite's .nq files
    actions = []
    for e in entries:
        a = e.get("mf:action")
        if isinstance(a, dict):
            a = a.get("@id")
        actions.append(a)
    assert all(a and a.endswith(".nq") for a in actions)
    # every action file exists in the suite directory
    for a in actions:
        assert (NQUADS_DIR / a.split("/")[-1]).exists(), a


def test_to_rdf_turtle_format():
    doc = {
        "@context": {"ex": "http://example.org/"},
        "@id": "ex:s",
        "ex:p": {"@value": "hello"},
    }
    opts = JsonLdOptions("")
    opts.format = "text/turtle"
    ttl = to_rdf(doc, opts)
    assert "<http://example.org/s>" in ttl
    reparsed = parse_turtle(ttl)
    assert len(reparsed.get_quads("@default")) == 1


def test_shared_collection_head_keeps_label():
    """Two subjects referencing ONE list-head bnode: the writer must keep the
    head's label (explicit rdf:first/rdf:rest) instead of collapsing it into
    an identity-severing "( ... )" — and must not crash (round-2 regression:
    the labeled-bnode branch leaked the collection list into the predicate
    loop)."""
    from rayld.kernel import consts
    from rayld.kernel.rdf import RDFDataset

    ds = RDFDataset()
    ds.add_triple("http://ex.org/s1", "http://ex.org/p", "_:head")
    ds.add_triple("http://ex.org/s2", "http://ex.org/p", "_:head")
    ds.add_triple("_:head", consts.RDF_FIRST, "http://ex.org/a")
    ds.add_triple("_:head", consts.RDF_REST, "_:t")
    ds.add_triple("_:t", consts.RDF_FIRST, "http://ex.org/b")
    ds.add_triple("_:t", consts.RDF_REST, consts.RDF_NIL)

    out = to_turtle(ds)
    ds2 = parse_turtle(out)
    quads = ds2.get_quads("@default")

    # both subjects still point at the SAME bnode (identity preserved)
    p_quads = [
        q for q in quads if q["predicate"]["value"] == "http://ex.org/p"
    ]
    assert {q["subject"]["value"] for q in p_quads} == {
        "http://ex.org/s1", "http://ex.org/s2"
    }
    (head,) = {q["object"]["value"] for q in p_quads}
    assert head.startswith("_:")

    # walking first/rest from the shared head recovers [a, b]
    by_subj = {}
    for q in quads:
        by_subj.setdefault(q["subject"]["value"], {})[
            q["predicate"]["value"]
        ] = q["object"]["value"]
    items = []
    node = head
    while node != consts.RDF_NIL:
        items.append(by_subj[node][consts.RDF_FIRST])
        node = by_subj[node][consts.RDF_REST]
    assert items == ["http://ex.org/a", "http://ex.org/b"]


def test_single_ref_collection_still_collapses():
    """Sanity: an ordinary once-referenced list still renders as '( ... )'."""
    from rayld.kernel import consts
    from rayld.kernel.rdf import RDFDataset

    ds = RDFDataset()
    ds.add_triple("http://ex.org/s", "http://ex.org/p", "_:h")
    ds.add_triple("_:h", consts.RDF_FIRST, "http://ex.org/a")
    ds.add_triple("_:h", consts.RDF_REST, "_:t")
    ds.add_triple("_:t", consts.RDF_FIRST, "http://ex.org/b")
    ds.add_triple("_:t", consts.RDF_REST, consts.RDF_NIL)
    out = to_turtle(ds)
    assert "( " in out and " )" in out and "first" not in out
    ds2 = parse_turtle(out)
    first = [
        q for q in ds2.get_quads("@default")
        if q["predicate"]["value"] == consts.RDF_FIRST
    ]
    assert len(first) == 2


def test_turtle_writer_roundtrip_property():
    """Property: for randomized datasets, to_turtle output reparses to the
    same ground triples (writer escaping + nesting correctness)."""
    from hypothesis import given, settings, strategies as st

    from rayld.kernel.nquads import to_nquads
    from rayld.kernel.rdf import RDFDataset

    name = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
    iri = name.map(lambda s: f"http://ex.org/{s}")
    obj = st.one_of(
        st.tuples(st.just("iri"), iri),
        st.tuples(st.just("bnode"), name.map(lambda s: f"_:{s}")),
        st.tuples(st.just("lit"), st.text(max_size=20)),
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.tuples(iri, iri, obj), min_size=0, max_size=8))
    def prop(triples):
        ds = RDFDataset()
        for s, p, (kind, o) in triples:
            if kind == "lit":
                ds.add_triple(s, p, o, is_literal=True)
            else:
                ds.add_triple(s, p, o)
        out = to_turtle(ds)
        ds2 = parse_turtle(out)

        def ground(d):
            return sorted(l for l in to_nquads(d).splitlines() if "_:" not in l)

        assert ground(ds) == ground(ds2)

    prop()


def _roundtrip_quads(ds):
    out = to_turtle(ds)
    return out, parse_turtle(out).get_quads("@default")


def test_bnode_cycle_keeps_all_triples():
    """Singly-referenced blank-node cycles must keep their labels: the
    inline walk used to pop every cycle member into an unreachable
    structure and emit NOTHING."""
    from rayld.kernel.rdf import RDFDataset

    ds = RDFDataset()
    ds.add_triple("_:a", "http://ex.org/p", "_:b")
    ds.add_triple("_:b", "http://ex.org/p", "_:a")
    out, quads = _roundtrip_quads(ds)
    assert len(quads) == 2
    subs = {q["subject"]["value"] for q in quads}
    objs = {q["object"]["value"] for q in quads}
    assert len(subs) == 2 and subs == objs  # the cycle survives intact

    ds = RDFDataset()
    ds.add_triple("_:a", "http://ex.org/p", "_:a")  # self-loop
    out, quads = _roundtrip_quads(ds)
    assert len(quads) == 1
    assert quads[0]["subject"]["value"] == quads[0]["object"]["value"]


def test_list_node_extra_predicates_not_dropped():
    """A first/rest chain node carrying OTHER predicates cannot collapse to
    '( ... )': the extra triples used to vanish silently."""
    from rayld.kernel import consts
    from rayld.kernel.rdf import RDFDataset

    for extra_on in ("_:h", "_:t"):  # head and interior node
        ds = RDFDataset()
        ds.add_triple("http://ex.org/s", "http://ex.org/p", "_:h")
        ds.add_triple("_:h", consts.RDF_FIRST, "a", is_literal=True)
        ds.add_triple("_:h", consts.RDF_REST, "_:t")
        ds.add_triple("_:t", consts.RDF_FIRST, "b", is_literal=True)
        ds.add_triple("_:t", consts.RDF_REST, consts.RDF_NIL)
        ds.add_triple(extra_on, "http://ex.org/q", "http://ex.org/o")
        out, quads = _roundtrip_quads(ds)
        assert len(quads) == 6, (extra_on, out)
        assert any(
            q["predicate"]["value"] == "http://ex.org/q" for q in quads
        ), extra_on


def test_dangling_rest_target_not_rewritten_to_nil():
    """rdf:rest pointing at a node with no triples must stay explicit —
    collapsing rewrote it to rdf:nil (a triple lost AND replaced)."""
    from rayld.kernel import consts
    from rayld.kernel.rdf import RDFDataset

    ds = RDFDataset()
    ds.add_triple("http://ex.org/s", "http://ex.org/p", "_:h")
    ds.add_triple("_:h", consts.RDF_FIRST, "a", is_literal=True)
    ds.add_triple("_:h", consts.RDF_REST, "http://ex.org/not-a-list")
    out, quads = _roundtrip_quads(ds)
    rests = [q for q in quads if q["predicate"]["value"] == consts.RDF_REST]
    assert len(rests) == 1
    assert rests[0]["object"]["value"] == "http://ex.org/not-a-list"


def test_prefix_block_sorted_deterministic():
    """@prefix lines are emitted in sorted order (set iteration order is
    process-dependent, which broke byte-identical retries)."""
    from rayld.kernel.rdf import RDFDataset

    ds = RDFDataset()
    ds.set_namespace("z", "http://zzz.example/")
    ds.set_namespace("a", "http://aaa.example/")
    ds.set_namespace("m", "http://mmm.example/")
    ds.add_triple("http://zzz.example/s", "http://mmm.example/p",
                  "http://aaa.example/o")
    out = to_turtle(ds)
    lines = [ln for ln in out.splitlines() if ln.startswith("@prefix")]
    assert lines == sorted(lines) and len(lines) == 3


def test_invalid_pn_local_falls_back_to_iri():
    """A namespace hit whose local part is not a valid PN_LOCAL must fall
    back to <IRI> (the prefixed form used to emit Turtle the module's own
    parser rejects)."""
    from rayld.kernel.rdf import RDFDataset

    ds = RDFDataset()
    ds.set_namespace("ex", "http://ex.org/")
    ds.add_triple("http://ex.org/a/b(1)", "http://ex.org/p", "v",
                  is_literal=True)
    out, quads = _roundtrip_quads(ds)  # must re-parse cleanly
    assert len(quads) == 1
    assert quads[0]["subject"]["value"] == "http://ex.org/a/b(1)"


def test_langstring_without_tag_emits_parseable_nquad():
    """A langString literal missing its tag must not emit the bare '\"v\"@ '
    form this module's own parser rejects."""
    from rayld.kernel import consts
    from rayld.kernel.nquads import parse_nquads, to_nquad
    from rayld.kernel.rdf import make_quad, iri, literal, node_for_id

    q = make_quad(
        node_for_id("http://ex.org/s"), iri("http://ex.org/p"),
        literal("v", consts.RDF_LANGSTRING, None), "@default",
    )
    line = to_nquad(q, None)
    ds = parse_nquads(line)  # must not raise
    (got,) = ds.get_quads("@default")
    assert got["object"]["value"] == "v"
