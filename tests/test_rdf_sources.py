"""Distributed N-Quads / Turtle source tests."""

from __future__ import annotations

from pathlib import Path

NQUADS_DIR = Path("/root/reference/test/json-ld.net.tests/NQuads")


def test_read_nquads_matches_kernel(ray_session, tmp_path):
    from rayld.kernel import parse_nquads
    from rayld.sources.rdf_files import read_nquads

    text = (
        '<http://ex/s> <http://ex/p> "v" .\n'
        '<http://ex/s> <http://ex/p> "v" .\n'  # duplicate -> dedup
        '<http://ex/s> <http://ex/q> "w"@en <http://ex/g> .\n'
        "_:b0 <http://ex/p> _:b1 .\n"
    )
    f = tmp_path / "data.nq"
    f.write_text(text)
    out = read_nquads(str(f)).to_pandas()
    assert len(out) == 3  # duplicate collapsed
    kernel = parse_nquads(text)
    n_kernel = sum(len(v) for v in kernel.values() if isinstance(v, list))
    assert len(out) == n_kernel
    assert set(out["graph"]) == {"@default", "http://ex/g"}
    langs = set(out[out["obj_kind"] == "literal"]["obj_lang"])
    assert "en" in langs


def test_read_nquads_bnode_quads_stay_file_scoped(ray_session, tmp_path):
    """Label-identical blank-node quads from DIFFERENT files are distinct
    nodes (bnode labels are document-scoped; the reference's ParseNQuads
    dedup is per-document, RDFDatasetUtils.cs:686-691) — only ground quads
    dedup globally."""
    from rayld.sources.rdf_files import read_nquads

    text = (
        '<http://ex/s> <http://ex/p> "ground" .\n'
        '_:b0 <http://ex/p> "x" .\n'
    )
    for i in range(2):
        (tmp_path / f"f{i}.nq").write_text(text)
    out = read_nquads(
        [str(tmp_path / f"f{i}.nq") for i in range(2)]
    ).to_pandas()
    # 1 ground quad (global dedup) + 2 bnode quads (one per file)
    assert len(out) == 3
    # default scoping rewrites labels per file, so the two _:b0 nodes are
    # DISTINCT subjects a consumer can no longer conflate
    bn = out[out["subj"].str.startswith("_:")]
    assert len(bn) == 2 and bn["subj"].nunique() == 2
    assert (bn["subj"].str.endswith("-b0")).all()
    # raw labels remain available for single-file/self-scoped callers
    raw = read_nquads(
        [str(tmp_path / f"f{i}.nq") for i in range(2)], scope_bnodes=False
    ).to_pandas()
    assert (raw["subj"] == "_:b0").sum() == 2 and len(raw) == 3
    # a literal whose text starts with "_:" is NOT treated as a bnode
    lit = tmp_path / "lit.nq"
    lit.write_text('<http://ex/s> <http://ex/p> "_:b0" .\n')
    lit2 = tmp_path / "lit2.nq"
    lit2.write_text('<http://ex/s> <http://ex/p> "_:b0" .\n')
    out2 = read_nquads([str(lit), str(lit2)]).to_pandas()
    assert len(out2) == 1


def test_read_turtle_distributed(ray_session, tmp_path):
    from rayld.sources.rdf_files import read_turtle

    ttl = (
        "@prefix ex: <http://example.org/> .\n"
        "ex:s ex:p ex:o ; ex:q \"lit\" .\n"
        "ex:t ex:list ( ex:a ex:b ) .\n"
    )
    for i in range(3):
        (tmp_path / f"f{i}.ttl").write_text(ttl)
    out = read_turtle([str(tmp_path / f"f{i}.ttl") for i in range(3)]).to_pandas()
    # per-file parse: each file contributes the same triple count
    per_file = out.groupby("source").size()
    assert len(per_file) == 3
    assert per_file.nunique() == 1
    assert (out["pred"] == "http://example.org/p").sum() == 3


def test_read_jsonld_over_w3c_fixtures(ray_session):
    """Distributed expand+toRDF over real W3C fixture documents; failures
    quarantine into @error rows."""
    import pytest

    w3c = Path("/root/reference/test/json-ld.net.tests/W3C")
    if not w3c.exists():
        pytest.skip("fixture tree absent")
    from rayld.sources.rdf_files import read_jsonld

    paths = sorted(str(p) for p in w3c.glob("toRdf-00[0-2]*-in.jsonld"))[:20]
    out = read_jsonld(paths).to_pandas()
    assert set(out["source"].map(lambda s: s.split("/")[-1])) <= {
        p.split("/")[-1] for p in paths
    }
    ok = out[out["graph"] != "@error"]
    assert len(ok) > 20
    # spot-check one file against the kernel directly
    import json as _json

    from rayld.kernel import JsonLdOptions, to_rdf

    first = paths[0]
    kernel_ds = to_rdf(_json.loads(Path(first).read_text(encoding="utf-8-sig")),
                       JsonLdOptions(""))
    n_kernel = sum(len(v) for v in kernel_ds.values() if isinstance(v, list))
    assert (out["source"] == first).sum() == n_kernel


def test_export_jsonld_roundtrip(ray_session, tmp_path):
    """Documents sink + NDJSON source roundtrip: export the per-conversation
    expanded documents, read them back line-sharded, and the triple multiset
    matches the original KG output (ground triples exactly; bnode-touching
    triples by count — labels are line-scoped on the way back in)."""
    from rayld.pipelines.kg import (
        build_triples,
        export_jsonld,
        triples_to_documents,
    )
    from rayld.sources.rdf_files import read_jsonld_lines
    from rayld.sources.transcripts import transcripts_dataset

    triples = build_triples(transcripts_dataset(20)).materialize()
    docs = triples_to_documents(triples)
    manifest = export_jsonld(
        docs, str(tmp_path / "out"), num_buckets=4
    ).to_pandas()
    assert manifest["n_documents"].sum() == 20
    assert all((tmp_path / "out" / f"part-{b:05d}.jsonl").exists()
               for b in manifest["bucket"])

    back = read_jsonld_lines(
        [str(tmp_path / "out" / p.name) for p in (tmp_path / "out").iterdir()]
    ).to_pandas()
    orig = triples.to_pandas()
    orig = orig[orig["graph"] != "@error"]
    back = back[back["graph"] != "@error"]
    assert len(back) == len(orig)

    def is_bnode_row(df):
        return (
            df["subj"].str.startswith("_:")
            | df["graph"].str.startswith("_:")
            | ((df["obj_kind"] != "literal")
               & df["obj_value"].str.startswith("_:"))
        )

    cols = ["graph", "subj", "pred", "obj_kind", "obj_value",
            "obj_datatype", "obj_lang"]
    ground_orig = orig[~is_bnode_row(orig)]
    ground_back = back[~is_bnode_row(back)]
    assert (
        set(map(tuple, ground_orig[cols].itertuples(index=False)))
        == set(map(tuple, ground_back[cols].itertuples(index=False)))
    )
    # bnode-touching triples survive with the same shape
    assert is_bnode_row(back).sum() == is_bnode_row(orig).sum()


def test_read_jsonld_lines_scopes_bnodes_per_line(ray_session, tmp_path):
    """Two structurally identical documents on different lines must not
    share anonymous nodes; malformed lines quarantine instead of failing."""
    import json

    from rayld.sources.rdf_files import read_jsonld_lines

    doc = {"@context": {"name": "http://schema.org/name"},
           "name": "anon"}  # no @id -> fresh blank node
    f = tmp_path / "docs.jsonl"
    f.write_text(
        json.dumps(doc) + "\n"
        + json.dumps({**doc, "name": "other"}) + "\n"
        + "{not json\n"
    )
    out = read_jsonld_lines(str(f)).to_pandas()
    good = out[out["graph"] != "@error"]
    assert len(good) == 2
    assert good["subj"].str.startswith("_:").all()
    assert good["subj"].nunique() == 2  # line-scoped, no collision
    errs = out[out["graph"] == "@error"]
    assert len(errs) == 1 and "processingError" in errs["pred"].iloc[0]


def test_read_nquads_quarantines_bad_lines(ray_session, tmp_path):
    """One corrupt line must not kill a corpus read: it lands in the
    @error graph with its source path; strict mode still raises."""
    import pytest

    from rayld.kernel import JsonLdError
    from rayld.sources.rdf_files import read_nquads

    f = tmp_path / "mixed.nq"
    f.write_text(
        '<http://ex/s> <http://ex/p> "ok" .\n'
        'THIS IS NOT A QUAD\n'
        '<http://ex/s2> <http://ex/p> "ok2" .\n'
    )
    out = read_nquads([str(f)]).to_pandas()
    good = out[out["graph"] != "@error"]
    errs = out[out["graph"] == "@error"]
    assert len(good) == 2 and len(errs) == 1
    assert "NOT A QUAD" in errs["obj_value"].iloc[0]

    with pytest.raises((JsonLdError, Exception)):
        read_nquads([str(f)], on_error="raise").to_pandas()
