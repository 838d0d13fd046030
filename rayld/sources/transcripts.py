"""Deterministic synthetic multi-turn transcript source.

Schema (BASELINE.json input_hint / FIXTURES.md §1):
    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp[us])

Every conversation is generated from ``(seed, conv_index)`` alone, so any
worker (or a retried task) regenerates byte-identical rows — the determinism
contract of SURVEY.md §4. Conversation lengths are zipf-skewed to exercise
the salted repartition path. A fraction of ``tool`` payloads are
JSON-LD-shaped documents (in-document @context, typed values, @list,
language tags, blank nodes) — the features that drive the reference's toRdf
semantics (/root/reference/src/json-ld.net/Core/JsonLdApi.cs:433-1042,
Core/RDFDataset.cs:594-803).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..state.gazetteer import build_gazetteer

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_BASE_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z, fixed (no wall clock)

# bump when the deterministic generator's OUTPUT changes (cache keys for
# materialized derivatives — e.g. the jsonld_ops tool-doc parquet — include
# this, so stale caches from an older corpus are never reused)
CORPUS_REV = 2

_ROLES = ["user", "assistant", "tool"]

_TEXT_TEMPLATES = [
    "Can you look up {e0} for me and summarize what {e1} has been doing?",
    "I met {e0} at the {e1} office yesterday to discuss the merger.",
    "The report from {e0} mentions {e1} twelve times.",
    "Let's schedule a call with {e0} about the {e1} account.",
    "According to {e0}, the facility in {e1} is now operational.",
    "Nothing new on my side, just reviewing the notes.",
    "Understood. I will proceed with the analysis now.",
    "Here is the summary you asked for, with sources attached.",
    "{e0} filed the paperwork; {e1} signed off on it.",
    "Please cross-reference {e0} against the {e1} records.",
]

_TOOL_CONTEXT = {
    "name": "http://schema.org/name",
    "value": {
        "@id": "http://schema.org/value",
        "@type": "http://www.w3.org/2001/XMLSchema#integer",
    },
    "score": {
        "@id": "http://schema.org/ratingValue",
        "@type": "http://www.w3.org/2001/XMLSchema#double",
    },
    "tags": {"@id": "http://schema.org/keywords", "@container": "@list"},
    "label": {"@id": "http://www.w3.org/2000/01/rdf-schema#label", "@language": "en"},
    "mentions": {"@id": "http://schema.org/mentions", "@type": "@id"},
    "partner": "http://schema.org/memberOf",
}


def _conv_rng(seed: int, conv_index: int) -> np.random.Generator:
    return np.random.default_rng([seed, conv_index])


def _make_tool_payload(rng: np.random.Generator, entities: list[str],
                       conv_index: int, turn_idx: int) -> str:
    """A JSON-LD-shaped tool result document for a subset of tool turns."""
    kind = int(rng.integers(0, 4))
    doc_id = f"https://rayld.dev/tool-call/{conv_index}/{turn_idx}"
    mention = entities[int(rng.integers(0, len(entities)))]
    if kind == 0:
        # typed scalars + language tag
        doc = {
            "@context": _TOOL_CONTEXT,
            "@id": doc_id,
            "@type": "http://schema.org/SearchAction",
            "name": f"lookup-{turn_idx}",
            "value": int(rng.integers(0, 1000)),
            "score": round(float(rng.random()) * 10, 3),
            "label": f"result {turn_idx}",
            "mentions": mention,
        }
    elif kind == 1:
        # @list container + blank-node object
        doc = {
            "@context": _TOOL_CONTEXT,
            "@id": doc_id,
            "tags": [f"tag-{int(t)}" for t in rng.integers(0, 50, size=int(rng.integers(1, 5)))],
            "partner": {
                "name": f"unit-{int(rng.integers(0, 99))}",
                "mentions": mention,
            },
        }
    elif kind == 2:
        # explicit _: blank node identifiers cross-referencing each other
        doc = {
            "@context": _TOOL_CONTEXT,
            "@graph": [
                # per-TURN label: the conversation expands as ONE JSON-LD
                # document, so a fixed "_:obs" would conflate every kind-2
                # observation in the conversation into a single node
                {"@id": f"_:obs-{turn_idx}",
                 "name": f"observation-{turn_idx}",
                 "mentions": mention},
                {"@id": doc_id, "partner": {"@id": f"_:obs-{turn_idx}"},
                 "value": int(rng.integers(0, 100))},
            ],
        }
    else:
        # plain (non-JSON-LD) tool output
        return json.dumps(
            {"status": "ok", "rows": int(rng.integers(0, 500)), "turn": turn_idx},
            sort_keys=True,
        )
    return json.dumps(doc, sort_keys=True)


def generate_conversation(seed: int, conv_index: int,
                          gazetteer_surfaces: list[str],
                          zipf_a: float = 1.6, max_turns: int = 200,
                          force_turns: int | None = None) -> dict:
    """All rows of one conversation, as a dict of column lists.

    ``force_turns`` overrides the zipf draw (still deterministic in
    (seed, conv_index)) — the skew-rehearsal hook that plants 10k-turn
    hub conversations to engage the flagship's turn-cap quarantine."""
    rng = _conv_rng(seed, conv_index)
    if force_turns is not None:
        n_turns = int(force_turns)
    else:
        n_turns = int(min(2 + rng.zipf(zipf_a), max_turns))
    conv_id = f"conv-{conv_index:08d}"
    cols = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    t0 = _BASE_EPOCH_US + conv_index * 60_000_000
    for turn_idx in range(n_turns):
        # n_turns = min(2 + zipf, max_turns) >= 3 always (zipf >= 1), so the
        # 3-role rotation is unconditional
        role = _ROLES[turn_idx % 3]
        template = _TEXT_TEMPLATES[int(rng.integers(0, len(_TEXT_TEMPLATES)))]
        e0 = gazetteer_surfaces[int(rng.integers(0, len(gazetteer_surfaces)))]
        e1 = gazetteer_surfaces[int(rng.integers(0, len(gazetteer_surfaces)))]
        text = template.format(e0=e0, e1=e1)
        tool = ""
        if role == "tool" and rng.random() < 0.8:
            tool = _make_tool_payload(rng, [e0, e1], conv_index, turn_idx)
        cols["conv_id"].append(conv_id)
        cols["turn_idx"].append(turn_idx)
        cols["role"].append(role)
        cols["text"].append(text)
        cols["tool"].append(tool)
        cols["ts"].append(t0 + turn_idx * 7_000_000)
    return cols


def _conversations_to_table(indices, seed: int, surfaces: list[str],
                            hub_every: int | None = None,
                            hub_turns: int = 10_000) -> pa.Table:
    all_cols = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for i in indices:
        force = (hub_turns if hub_every and int(i) % hub_every == 0
                 else None)
        cols = generate_conversation(seed, int(i), surfaces,
                                     force_turns=force)
        for k, v in cols.items():
            all_cols[k].extend(v)
    return pa.table(
        {
            "conv_id": pa.array(all_cols["conv_id"], pa.string()),
            "turn_idx": pa.array(all_cols["turn_idx"], pa.int32()),
            "role": pa.array(all_cols["role"], pa.string()),
            "text": pa.array(all_cols["text"], pa.string()),
            "tool": pa.array(all_cols["tool"], pa.string()),
            "ts": pa.array(all_cols["ts"], pa.timestamp("us")),
        }
    )


def transcripts_dataset(num_conversations: int, seed: int = 42,
                        conversations_per_block: int = 128,
                        hub_every: int | None = None,
                        hub_turns: int = 10_000):
    """Streaming Dataset of synthetic transcripts — generation happens inside
    map_batches tasks (nothing materializes on the driver), so this scales to
    arbitrarily many conversations.

    Block sizing: task parallelism in Ray Data follows BLOCK structure, not
    batch_size. ~128 conversations (~2k turns) per block balances per-task
    scheduling overhead against parallelism (measured: 16-conv blocks leave
    cores idle on dispatch overhead, 256-conv blocks starve the pipeline;
    a single collapsed block serializes everything).

    ``hub_every``/``hub_turns`` plant a deterministic ``hub_turns``-turn
    conversation at every ``hub_every``-th index — the zipfian-variant
    corpus of the skew rehearsal (verdict-r4 item 4); default None leaves
    the corpus byte-identical to rounds 1-4 (CORPUS_REV unchanged)."""
    import ray.data as rd

    surfaces = [s for s, _, _ in build_gazetteer(seed)]
    nblocks = max(1, num_conversations // conversations_per_block)
    ds = rd.range(num_conversations, override_num_blocks=nblocks)

    def gen(batch: pa.Table) -> pa.Table:
        return _conversations_to_table(
            batch["id"].to_pylist(), seed, surfaces,
            hub_every=hub_every, hub_turns=hub_turns,
        )

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


def transcripts_table(num_conversations: int, seed: int = 42) -> pa.Table:
    """Small in-process variant for tests / oracles."""
    surfaces = [s for s, _, _ in build_gazetteer(seed)]
    return _conversations_to_table(range(num_conversations), seed, surfaces)


def write_transcripts_parquet(path: str, num_conversations: int,
                              seed: int = 42) -> None:
    """Materialize a transcripts corpus as partitioned Parquet (streamed;
    one file per block)."""
    transcripts_dataset(num_conversations, seed).write_parquet(path)


def read_transcripts(path: str):
    """Read a transcripts Parquet directory/file as the pipeline input.

    Column-pruned to the contract schema; block count follows the Parquet
    layout (use override via repartition upstream only if files are huge)."""
    import ray.data as rd

    return rd.read_parquet(
        path,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
