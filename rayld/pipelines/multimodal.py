"""Multimodal-column plumbing: opaque binary payloads + typed metadata through
actor-pool decode/feature stages.

The container has no image/audio codecs, so the decode kernel is STUBBED with
a deterministic fake (documented; raise_on_decode=True surfaces the
NotImplementedError seam a real codec would fill). Everything Ray-side —
binary column handling, Arrow schema, actor signature, batch sizing, output
layout — is real and tested."""

from __future__ import annotations

import hashlib

import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def media_dataset(sf_dir: str):
    """Synthesizes an opaque-binary media table from the documents table
    (text bytes stand in for encoded frames)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
        kinds = ["image/fake" if i % 2 == 0 else "audio/fake" for i in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(kinds, pa.string()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode/feature stage. A real deployment loads the codec /
    model in __init__ (once per actor); here the codec is a deterministic
    fake keyed on the payload hash.

    batch_size should be SMALL for real media (payload x concurrency must fit
    worker heap — see module docstring)."""

    def __init__(self, raise_on_decode: bool = False):
        self.raise_on_decode = raise_on_decode
        # real version: self.codec = load_codec(); here: nothing to load

    def _decode(self, payload: bytes, media_type: str) -> dict:
        if self.raise_on_decode:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a real decoder here"
            )
        h = hashlib.md5(payload).digest()
        return {
            "n_bytes": len(payload),
            "width": 64 + h[0],
            "height": 64 + h[1],
            "feature": [b / 255.0 for b in h[:8]],
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            self._decode(p, t)
            for p, t in zip(
                batch["payload"].to_pylist(), batch["media_type"].to_pylist()
            )
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "feature": pa.array(
                    [m["feature"] for m in metas], pa.list_(pa.float32())
                ),
            }
        )


def media_features(sf_dir: str, concurrency: int = 2, batch_size: int = 64):
    return media_dataset(sf_dir).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_byte_stats(sf_dir: str):
    """SQL-checkable projection of the decode stage: (media_id, n_bytes)."""
    feats = media_features(sf_dir)
    return feats.select_columns(["media_id", "n_bytes"])
