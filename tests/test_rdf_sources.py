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
