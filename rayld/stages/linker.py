"""Entity-linking actor stage: mention detection against a broadcast gazetteer.

Ray pattern (SURVEY.md M3): a callable CLASS for ``map_batches`` — the
gazetteer arrives as a ``ray.put`` object ref (broadcast once, not re-shipped
per batch) and the token index is built ONCE per actor in ``__init__``;
``__call__`` does per-batch work only.

Matching is a leftmost-longest token-index scan (first token -> candidate
phrases, longest first). Unlike a single alternation regex this scales to
large gazetteers: per-token cost is a dict lookup, independent of gazetteer
size."""

from __future__ import annotations

import json
import re

import pyarrow as pa

_WORD_RE = re.compile(r"[A-Za-z]+(?:[-.][A-Za-z]+)*")


def build_token_index(surfaces: dict) -> dict:
    """surface -> iri mapping to {first_token: [(token_tuple, surface, iri)]}
    with candidates longest-first."""
    index: dict = {}
    for surface, iri in surfaces.items():
        words = tuple(_WORD_RE.findall(surface))
        if not words:
            continue
        index.setdefault(words[0], []).append((words, surface, iri))
    for cands in index.values():
        cands.sort(key=lambda c: len(c[0]), reverse=True)
    return index


class MentionLinker:
    """map_batches(MentionLinker, concurrency=(min,max), fn_constructor_kwargs=
    {"gazetteer_ref": ray.put(build_gazetteer())}).

    Adds an ``entities`` column: JSON array of linked entity IRIs, in order of
    first appearance, deduplicated."""

    def __init__(self, gazetteer_ref=None, gazetteer=None):
        if gazetteer is None:
            import ray

            gazetteer = ray.get(gazetteer_ref)
        self.surface_to_iri = {s: iri for s, iri, _ in gazetteer}
        self.index = build_token_index(self.surface_to_iri)

    def link_text(self, text: str) -> list[str]:
        out: list[str] = []
        seen = set()
        words = [(m.group(0), m.start(), m.end()) for m in _WORD_RE.finditer(text)]
        n_words = len(words)
        index = self.index
        i = 0
        while i < n_words:
            cands = index.get(words[i][0])
            if cands:
                matched = False
                for token_tuple, surface, iri in cands:
                    n = len(token_tuple)
                    if i + n <= n_words and all(
                        words[i + k][0] == token_tuple[k] for k in range(1, n)
                    ):
                        # contiguity: the raw text slice must equal the surface
                        if text[words[i][1]:words[i + n - 1][2]] == surface:
                            if iri not in seen:
                                seen.add(iri)
                                out.append(iri)
                            i += n
                            matched = True
                            break
                if matched:
                    continue
            i += 1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        entities = [json.dumps(self.link_text(t or "")) for t in texts]
        return batch.append_column("entities", pa.array(entities, pa.string()))


def compile_matcher(surfaces: list[str]) -> re.Pattern:
    """Legacy regex-alternation matcher (kept for comparison tests)."""
    ordered = sorted(surfaces, key=len, reverse=True)
    pattern = r"\b(?:" + "|".join(re.escape(s) for s in ordered) + r")\b"
    return re.compile(pattern)


# task-map variant: the linker's state (dict + token index over ~1k
# surfaces) builds in milliseconds, so a plain task map with a per-process
# memo gets the same once-per-worker amortization as an actor pool WITHOUT
# the per-execution actor-spawn cost (the minhash signature finding; see
# BASELINE.md round-3 log). The memo keys on the broadcast ref so different
# gazetteers coexist.
_LINKER_MEMO: dict = {}


def linker_task_fn(gazetteer_ref):
    """Returns a map_batches FUNCTION equivalent to the MentionLinker actor:
    the linker builds once per (worker process, gazetteer) and is reused by
    every task the worker runs."""

    def fn(batch: pa.Table) -> pa.Table:
        key = gazetteer_ref.hex()
        linker = _LINKER_MEMO.get(key)
        if linker is None:
            linker = MentionLinker(gazetteer_ref=gazetteer_ref)
            _LINKER_MEMO[key] = linker
        return linker(batch)

    return fn
