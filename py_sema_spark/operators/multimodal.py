"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The container has no media libraries (PIL/torchvision/ffmpeg), so the
**decode step is stubbed**: each codec hook tries its real library and
otherwise falls back to a clearly-marked deterministic fake (sha256-
derived), keeping the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — real and tested. Swapping in the real
decoder changes only the inner per-batch function.

Scale notes:
- media rows are big; ``MEDIA_BATCH_CONF`` caps Arrow batch sizes so a
  batch of 4K-video rows doesn't blow the worker heap;
- every stage is stateless map-side (no shuffle); downstream joins
  key on ``media_id`` and co-partition by its hash like any other id;
- frame sampling explodes rows map-side and feeds partial aggregation
  exactly like triple extraction does.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# worker-side conf for big binaries: small Arrow batches
MEDIA_BATCH_CONF = {"spark.sql.execution.arrow.maxRecordsPerBatch": "64"}

FEATURE_DIM = 16


def _try_real_image_decoder():
    """→ callable(bytes) -> list[float] pixels, or None if no codec
    lib is importable. Kept behind a hook so the sandbox (no PIL)
    and a production image (PIL present) run the same stage — the
    caller falls back to the stub on any per-item decode failure."""
    try:
        import io

        from PIL import Image

        def decode(data: bytes):
            img = Image.open(io.BytesIO(data)).convert("L")
            px = list(img.getdata())
            return [v / 255.0 for v in px] or None

        return decode
    except ImportError:
        return None


def _fake_pixels(content: bytes, dim: int = FEATURE_DIM):
    """STUB decode: deterministic pseudo-features from sha256(content).
    Replaced 1:1 by a real decoder when the codec lib is present."""
    h = hashlib.sha256(content or b"").digest()
    raw = (h * ((4 * dim) // len(h) + 1))[: 4 * dim]
    return [
        int.from_bytes(raw[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(dim)
    ]


def _decode_pixels(real, data: bytes):
    """Shared try-real-else-None decode step (decode_stats /
    media_features / phash all use the same fallback semantics so they
    can't drift). → ``(pixels | None, failed)`` where ``failed`` means
    a PRESENT real decoder raised or returned nothing — the caller
    falls back to the stub and should flag the row as not-ok."""
    if real is None:
        return None, False
    try:
        px = real(data)
    except Exception:
        return None, True
    return (px if px else None), not bool(px)


def _sample_to_dim(px, dim: int):
    """Spread ``len(px)`` samples over exactly ``dim`` values: block
    means when longer — so a hash/feature vector reflects the WHOLE
    image, not its first ``dim`` pixels of the top row — cycle-pad when
    shorter; identity when equal (the stub path, oracle-pinned)."""
    n = len(px)
    if n == dim:
        return list(px)
    if n > dim:
        out = []
        for i in range(dim):
            lo, hi = i * n // dim, (i + 1) * n // dim
            out.append(sum(px[lo:hi]) / (hi - lo))
        return out
    return (list(px) * ((dim // n) + 1))[:dim]


def decode_stats(media: DataFrame) -> DataFrame:
    """Per-item decode → basic stats (real lib if present, else stub).

    Output: (media_id, ok, n_bytes, mean, std) — the plumbing every
    real decoder variant shares.
    """
    schema = (
        "media_id long, ok boolean, n_bytes long, mean double, std double"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _try_real_image_decoder()
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                # real decode path: opt-in, never fatal — a decoder that
                # can't handle this payload falls back to the stub, but
                # the row is flagged ok=False so consumers can tell real
                # stats from stub noise
                px, failed = _decode_pixels(real, data)
                if px is None:
                    px = _fake_pixels(data)
                mean = sum(px) / len(px)
                std = (sum((v - mean) ** 2 for v in px) / len(px)) ** 0.5
                rows.append((int(mid), not failed, len(data), mean, std))
            yield pd.DataFrame(
                rows, columns=["media_id", "ok", "n_bytes", "mean", "std"]
            )

    return media.select("media_id", "content").mapInPandas(gen, schema)


def media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Embedding-shaped features per item: (media_id, feature
    array<float>) — the input contract of the similarity operators
    (operators/similarity.py), so near-dup/ANN over media falls out."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _try_real_image_decoder()
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                data = bytes(c) if c is not None else b""
                # same real-decoder hook as decode_stats/phash: with a
                # codec present, features are block-mean luminances over
                # the whole image, not sha256 noise
                px, _ = _decode_pixels(real, data)
                feat = (
                    _sample_to_dim(px, dim)
                    if px is not None
                    else _fake_pixels(data, dim)
                )
                rows.append((int(mid), feat))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.select("media_id", "content").mapInPandas(gen, schema)


def resize_images(
    media: DataFrame, width: int, height: int
) -> DataFrame:
    """Resize stage: new binary + updated meta. Stub transform =
    content-hash-stamped header + truncation (deterministic); the real
    path swaps in PIL's resize. Non-images pass through unchanged."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content, out_meta = [], []
            for kind, content, meta in zip(
                pdf["kind"], pdf["content"], pdf["meta"]
            ):
                data = bytes(content) if content is not None else b""
                meta = dict(meta) if meta is not None else {}
                if kind == "image":
                    stamp = hashlib.sha256(
                        data + f"|{width}x{height}".encode()
                    ).digest()[:8]
                    data = b"RSZ0" + stamp + data[: width * height // 8]
                    meta = {**meta, "width": width, "height": height}
                out_content.append(data)
                out_meta.append(meta)
            pdf = pdf.copy()
            pdf["content"] = out_content
            pdf["meta"] = out_meta
            yield pdf

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def frame_sample(
    media: DataFrame, every_ms: int = 500, max_frames: Optional[int] = None
) -> DataFrame:
    """Video → frame rows (media_id, frame_idx, ts_ms, frame binary).

    The frame *schedule* is pure column algebra (sequence+explode —
    JVM-side, mirrors the SQL oracle 1:1); only frame *content* comes
    from the stubbed per-frame decode."""
    vids = media.where(F.col("kind") == "video")
    # ceil(duration/every): frame timestamps live in [0, duration) —
    # floor(d/every)+1 put a frame AT d when d % every == 0 (a ts with
    # no decodable frame) and scheduled one frame for a 0-ms video
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    n_frames = F.floor((dur + every_ms - 1) / F.lit(every_ms)).cast("int")
    if max_frames is not None:
        n_frames = F.least(n_frames, F.lit(max_frames))
    # guard the degenerate schedule: sequence(0, -1) defaults to step -1
    # and yields [0, -1] — max_frames=0 must emit NO frames, not two
    seq = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    sched = vids.select(
        "media_id",
        "content",
        F.explode(seq).alias("frame_idx"),
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)

    schema = "media_id long, frame_idx int, ts_ms int, frame binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                hashlib.sha256(
                    (bytes(c) if c is not None else b"")
                    + int(ts).to_bytes(8, "big")
                ).digest()
                for c, ts in zip(pdf["content"], pdf["ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "ts_ms": pdf["ts_ms"].astype("int32"),
                    "frame": frames,
                }
            )

    return sched.mapInPandas(gen, schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    kind cycles by doc_id, content = utf-8 text bytes, duration from
    n_chars — the test/bench stand-in for a real media crawl."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "video")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
    )
    meta = F.struct(
        F.when(kind == "video", "video/mp4")
        .when(kind == "image", "image/png")
        .otherwise("audio/wav")
        .alias("mime"),
        F.lit(640).alias("width"),
        F.lit(480).alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("n_chars") * 7).cast("int").alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        meta.alias("meta"),
    )


def phash(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Perceptual hash per media item: decode → ``dim`` luminance
    samples → bit *i* set iff sample *i* is above the per-item mean
    (the thresholding step every pHash variant shares; a production
    decoder feeds DCT coefficients through the identical contract).
    Decode uses the real codec when importable, else the deterministic
    sha256 stub — same hook as :func:`decode_stats`.

    Output: ``(media_id, phash)`` with ``phash`` a ``dim``-bit long.
    Map-side only (one Arrow-batched ``mapInPandas``, no shuffle).

    ``dim`` is capped at 52: bit 63 would overflow the signed-long
    column, and the band extraction in :func:`phash_neardup` runs in
    double space (exact only below 2^53). Wider hashes should ship as
    ``binary`` with per-band substrings instead.
    """
    if not 1 <= dim <= 52:
        raise ValueError("phash dim must be in [1, 52]")
    schema = "media_id long, phash long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _try_real_image_decoder()
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                px, _ = _decode_pixels(real, data)
                if px is None:
                    px = _fake_pixels(data, dim)
                # block-mean spread: the hash reflects the whole image,
                # not just its first dim pixels of the top row
                px = _sample_to_dim(px, dim)
                mean = sum(px) / len(px)
                h = 0
                for i, v in enumerate(px):
                    if v > mean:
                        h |= 1 << i
                rows.append((int(mid), h))
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    return media.select("media_id", "content").mapInPandas(gen, schema)


def phash_neardup(
    media: DataFrame,
    max_hamming: int = 2,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash Hamming distance,
    WITHOUT an all-pairs comparison: the ``dim``-bit hash is split into
    ``max_hamming + 1`` bands — by pigeonhole, any pair within
    ``max_hamming`` bit flips agrees exactly on at least one band — so
    candidates come from an equi-join on ``(band, band_value)`` and
    only candidates pay the exact ``bit_count(xor)`` verify.

    Output: ``(a, b, hamming)`` with ``a < b``, one row per pair at
    Hamming distance ≤ ``max_hamming``.

    Scale shape: identical to MinHash-LSH banding (operators/dedup.py)
    — explode ``n_bands`` rows per item, shuffle once on the band key,
    per-bucket pair generation, verify on the candidate set only. A
    degenerate band value (e.g. all-black thumbnails hashing to band 0)
    is the usual LSH skew case; at corpus scale cap bucket sizes the
    same way ``minhash_neardup`` does.
    """
    n_bands = max_hamming + 1
    band_bits = -(-dim // n_bands)  # ceil
    hashes = phash(media, dim)

    bands = hashes.select(
        "media_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        # band value via floor-div/mod (portable to the SQL oracle;
        # shiftright needs a literal count)
        "bv",
        F.pmod(
            F.floor(
                F.col("phash")
                / F.pow(F.lit(2.0), F.col("band") * F.lit(band_bits))
            ),
            F.lit(2 ** band_bits),
        ).cast("long"),
    )
    left = bands.select(
        F.col("band"),
        F.col("bv"),
        F.col("media_id").alias("a"),
        F.col("phash").alias("ha"),
    )
    right = bands.select(
        F.col("band"),
        F.col("bv"),
        F.col("media_id").alias("b"),
        F.col("phash").alias("hb"),
    )
    cand = (
        left.join(right, ["band", "bv"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "a",
        "b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
