"""Entity-linking actor stage: mention detection against a broadcast gazetteer.

Ray pattern (SURVEY.md M3): a callable CLASS for ``map_batches`` — the
gazetteer arrives as a ``ray.put`` object ref (broadcast once, not re-shipped
per batch) and the matcher regex is compiled ONCE per actor in ``__init__``;
``__call__`` does vectorizable per-batch work only.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa


def compile_matcher(surfaces: list[str]) -> re.Pattern:
    """One alternation regex over all surface forms, longest-first so longer
    mentions win, with word boundaries."""
    ordered = sorted(surfaces, key=len, reverse=True)
    pattern = r"\b(?:" + "|".join(re.escape(s) for s in ordered) + r")\b"
    return re.compile(pattern)


class MentionLinker:
    """map_batches(MentionLinker, concurrency=N, fn_constructor_kwargs=
    {"gazetteer_ref": ray.put(build_gazetteer())}).

    Adds an ``entities`` column: JSON array of linked entity IRIs, in order of
    first appearance, deduplicated.
    """

    def __init__(self, gazetteer_ref=None, gazetteer=None):
        if gazetteer is None:
            import ray

            gazetteer = ray.get(gazetteer_ref)
        self.surface_to_iri = {s: iri for s, iri, _ in gazetteer}
        self.matcher = compile_matcher(list(self.surface_to_iri.keys()))

    def link_text(self, text: str) -> list[str]:
        out: list[str] = []
        seen = set()
        for m in self.matcher.finditer(text):
            iri = self.surface_to_iri[m.group(0)]
            if iri not in seen:
                seen.add(iri)
                out.append(iri)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        entities = [json.dumps(self.link_text(t or "")) for t in texts]
        return batch.append_column("entities", pa.array(entities, pa.string()))
