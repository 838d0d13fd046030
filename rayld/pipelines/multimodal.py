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
    # autoscaling pool: fixed-size pools stacked with other stages can pin
    # every CPU of a small session (CLAUDE.md deadlock rule)
    return media_dataset(sf_dir).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(2, concurrency)),
        num_cpus=1,
    )


def media_byte_stats(sf_dir: str):
    """SQL-checkable projection of the decode stage: (media_id, n_bytes)."""
    feats = media_features(sf_dir)
    return feats.select_columns(["media_id", "n_bytes"])


class MediaResizer:
    """Actor-pool resize stage: computes the target geometry for a bounded
    max dimension (aspect-preserving). The pixel resample itself is the
    stubbed codec seam (no codecs in this container); the geometry math,
    schema and actor plumbing are the real deployment shape."""

    def __init__(self, max_dim: int = 224):
        self.max_dim = max_dim
        # real version: self.resampler = load_resampler()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        w = np.asarray(batch["width"].to_pylist(), dtype=np.float64)
        h = np.asarray(batch["height"].to_pylist(), dtype=np.float64)
        scale = np.minimum(1.0, self.max_dim / np.maximum(w, h))
        # half-up: floor(x+0.5), never numpy round (half-even) — truncation
        # can lose the max dim to a ulp
        out_w = np.maximum(1, np.floor(w * scale + 0.5)).astype(np.int64)
        out_h = np.maximum(1, np.floor(h * scale + 0.5)).astype(np.int64)
        # int64 across the board: the DuckDB oracle compares dtypes too
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": batch["width"].cast(pa.int64()),
                "height": batch["height"].cast(pa.int64()),
                "resized_w": pa.array(out_w, pa.int64()),
                "resized_h": pa.array(out_h, pa.int64()),
            }
        )


def media_resize(sf_dir: str, max_dim: int = 224, concurrency: int = 2,
                 batch_size: int = 64):
    """Decode -> resize as chained actor-pool stages over the media table."""
    return media_features(
        sf_dir, concurrency=concurrency, batch_size=batch_size
    ).map_batches(
        MediaResizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(2, concurrency)),
        num_cpus=1,
        fn_constructor_kwargs={"max_dim": max_dim},
    )


def media_frame_sample(sf_dir: str, frame_bytes: int = 64, stride: int = 2):
    """Video-style frame sampling layout: each payload is treated as
    ``n_frames = n_bytes // frame_bytes + 1`` frames and every ``stride``-th
    frame index is emitted as its own row (media_id, frame_idx) — the
    explode-shaped output a real frame sampler produces, with the per-frame
    decode left to the stubbed codec seam. Vectorized per batch; the row
    count is SQL-checkable from the payload length."""
    import numpy as np

    ds = media_dataset(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["media_id"].to_pylist(), dtype=np.int64)
        sizes = np.fromiter(
            (len(p) for p in batch["payload"].to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        n_frames = sizes // frame_bytes + 1
        counts = (n_frames + stride - 1) // stride  # sampled per media
        rep_ids = np.repeat(ids, counts)
        # frame_idx = stride * (0..count-1) per media, flattened
        offsets = np.repeat(np.cumsum(counts) - counts, counts)
        frame_idx = (np.arange(counts.sum()) - offsets) * stride
        return pa.table(
            {
                "media_id": pa.array(rep_ids, pa.int64()),
                "frame_idx": pa.array(frame_idx.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# REAL decode path: P6 PPM (pure numpy, no codec libs needed)
# ---------------------------------------------------------------------------

_PPM_W, _PPM_H = 32, 24


def ppm_media_dataset(sf_dir: str):
    """Deterministic P6 PPM images synthesized from doc_id (one per doc):
    R = doc_id % 256 (constant), G = column index (0..31 gradient),
    B = (doc_id * 7) % 256 (constant). The channel MEANS are therefore
    analytic functions of doc_id alone — which lets a plain-SQL oracle
    verify the real byte-level decode end-to-end (a wrong header parse,
    stride, or channel order shifts the means)."""
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    header = f"P6\n{_PPM_W} {_PPM_H}\n255\n".encode()

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        g = np.tile(
            np.arange(_PPM_W, dtype=np.uint8), (_PPM_H, 1)
        )  # column gradient
        for i in ids:
            img = np.empty((_PPM_H, _PPM_W, 3), dtype=np.uint8)
            img[:, :, 0] = i % 256
            img[:, :, 1] = g
            img[:, :, 2] = (i * 7) % 256
            payloads.append(header + img.tobytes())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/x-portable-pixmap"] * len(ids),
                                   pa.string()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


class PpmDecoder:
    """Actor-pool stage with a REAL decode kernel: parses the P6 header,
    np.frombuffer's the raw RGB plane (zero-copy over the payload bytes),
    and reduces each channel with INTEGER sums (mean in exact micro units,
    order-free). Header regex compiled once per actor in __init__ — the
    stateful-stage contract."""

    def __init__(self):
        import re

        self._header = re.compile(
            rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s", re.S
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids, ws, hs, mr, mg, mb = [], [], [], [], [], []
        bad_ids, bad_errs = [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            m = self._header.match(payload)
            if not m:
                bad_ids.append(media_id)
                bad_errs.append("not a P6 ppm")
                continue
            w, h, maxval = (int(m.group(k)) for k in (1, 2, 3))
            pix = np.frombuffer(payload, dtype=np.uint8, offset=m.end())
            if maxval != 255 or len(pix) != w * h * 3:
                bad_ids.append(media_id)
                bad_errs.append("truncated or non-8-bit ppm")
                continue
            img = pix.reshape(h, w, 3)
            npix = w * h
            sums = img.astype(np.int64).sum(axis=(0, 1))  # exact int
            ids.append(media_id)
            ws.append(w)
            hs.append(h)
            mr.append(int(sums[0]) * 1_000_000 // npix)
            mg.append(int(sums[1]) * 1_000_000 // npix)
            mb.append(int(sums[2]) * 1_000_000 // npix)
        ok = pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_r_micro": pa.array(mr, pa.int64()),
            "mean_g_micro": pa.array(mg, pa.int64()),
            "mean_b_micro": pa.array(mb, pa.int64()),
            "decode_error": pa.array([""] * len(ids), pa.string()),
        })
        bad = pa.table({
            "media_id": pa.array(bad_ids, pa.int64()),
            "width": pa.array([0] * len(bad_ids), pa.int64()),
            "height": pa.array([0] * len(bad_ids), pa.int64()),
            "mean_r_micro": pa.array([0] * len(bad_ids), pa.int64()),
            "mean_g_micro": pa.array([0] * len(bad_ids), pa.int64()),
            "mean_b_micro": pa.array([0] * len(bad_ids), pa.int64()),
            "decode_error": pa.array(bad_errs, pa.string()),
        })
        return pa.concat_tables([ok, bad])


def media_ppm_features(sf_dir: str, concurrency=None):
    """Per-image channel statistics through the REAL PPM decode actor pool
    (small batches: payload x concurrency must fit the worker heap — the
    multimodal sizing rule). Embarrassingly parallel, no shuffle."""
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (2, max(2, ncpu))
    def keep_ok(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.equal(batch["decode_error"], "")
        ).drop_columns(["decode_error"])

    ds = ppm_media_dataset(sf_dir)
    return ds.map_batches(
        PpmDecoder, concurrency=concurrency, batch_size=64,
        batch_format="pyarrow",
    ).map_batches(keep_ok, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# REAL audio decode path: PCM WAV (RIFF chunk walk, no codec libs)
# ---------------------------------------------------------------------------

_WAV_RATE = 8000
_WAV_N = 1024  # 4 full sawtooth cycles


def wav_media_dataset(sf_dir: str):
    """Deterministic 16-bit mono PCM WAVs from doc_id: sample[n] =
    dc + (n % 256) with dc = (doc_id % 1000) * 16 — a DC offset plus a
    sawtooth. Over full cycles both the MEAN (dc + 127.5) and the ENERGY
    (per-cycle sum of squares) are closed-form in doc_id, so a plain-SQL
    oracle verifies the real RIFF/data-chunk decode exactly."""
    import struct

    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    saw = np.tile(np.arange(256, dtype=np.int32), _WAV_N // 256)

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            dc = (i % 1000) * 16
            pcm = (dc + saw).astype("<i2").tobytes()
            hdr = (
                b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE,
                                        _WAV_RATE * 2, 2, 16)
                + b"data" + struct.pack("<I", len(pcm))
            )
            payloads.append(hdr + pcm)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio/wav"] * len(ids), pa.string()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


class WavDecoder:
    """Real RIFF walk: verifies RIFF/WAVE magic, iterates chunks to find
    fmt (PCM, 16-bit) and data, frombuffer's the samples. Integer-exact
    reductions: mean and energy in milli units via int64 sums."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        import numpy as np

        ids, ns, rates, means, energies = [], [], [], [], []
        bad_ids, bad_errs = [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE file")
                pos, rate, bits, data = 12, None, None, None
                while pos + 8 <= len(payload):
                    cid = payload[pos:pos + 4]
                    sz = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
                    body = payload[pos + 8:pos + 8 + sz]
                    if cid == b"fmt ":
                        fmt, _ch, rate, _br, _ba, bits = struct.unpack(
                            "<HHIIHH", body[:16]
                        )[0:6]
                        if fmt != 1:
                            raise ValueError("not PCM")
                    elif cid == b"data":
                        data = body
                    pos += 8 + sz + (sz & 1)
                if rate is None or data is None or bits != 16:
                    raise ValueError("missing fmt/data or non-16-bit")
                pcm = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = len(pcm)
                ids.append(media_id)
                ns.append(n)
                rates.append(int(rate))
                means.append(int(pcm.sum()) * 1000 // n)
                energies.append(int((pcm * pcm).sum()) * 1000 // n)
            except (ValueError, struct.error) as err:
                bad_ids.append(media_id)
                bad_errs.append(str(err))
        ok = pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "sample_rate": pa.array(rates, pa.int64()),
            "mean_milli": pa.array(means, pa.int64()),
            "energy_milli": pa.array(energies, pa.int64()),
            "decode_error": pa.array([""] * len(ids), pa.string()),
        })
        bad = pa.table({
            "media_id": pa.array(bad_ids, pa.int64()),
            "n_samples": pa.array([0] * len(bad_ids), pa.int64()),
            "sample_rate": pa.array([0] * len(bad_ids), pa.int64()),
            "mean_milli": pa.array([0] * len(bad_ids), pa.int64()),
            "energy_milli": pa.array([0] * len(bad_ids), pa.int64()),
            "decode_error": pa.array(bad_errs, pa.string()),
        })
        return pa.concat_tables([ok, bad])


def media_wav_features(sf_dir: str, concurrency=None):
    """Per-clip statistics through the REAL WAV decode actor pool."""
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (2, max(2, ncpu))

    def keep_ok(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.equal(batch["decode_error"], "")
        ).drop_columns(["decode_error"])

    return wav_media_dataset(sf_dir).map_batches(
        WavDecoder, concurrency=concurrency, batch_size=64,
        batch_format="pyarrow",
    ).map_batches(keep_ok, batch_format="pyarrow")
