"""Multimodal column plumbing: images / audio / video as opaque
``binary`` columns with typed metadata.

What is REAL here (and tested): the schema contract, the Arrow-batch
``mapInPandas`` plumbing (batch shape, zero-copy binary transfer,
output schema enforcement), the partitioning story (binary payloads
repartition by media_id so one task never holds more than a batch of
blobs), and the deterministic byte-level feature path.

What is STUBBED (clearly marked): the actual codec step. The image /
audio libraries are not in this container, so ``decode_media``
raises ``NotImplementedError`` unless a codec callback is injected,
and :func:`fake_decode` provides a deterministic stand-in (byte
statistics reshaped to the declared output schema) used by tests and
the catalog query. Swapping in a real codec (PIL / torchaudio /
pyav) changes ONE function — the Spark-side contract is already
load-bearing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media-table schema: opaque content + typed metadata
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("content", T.BinaryType(), False),
    T.StructField(
        "meta",
        T.StructType([
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ]),
    ),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media rows from the documents table (the
    test/bench stand-in for a real binary source): content = UTF-8
    bytes of the text, kind cycles by id, metadata derived from
    lengths. Real deployments replace this with a binary-file or
    object-store scan (``spark.read.format('binaryFile')``)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    n = F.length(F.col("text"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("synthetic/v1").alias("format"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (n * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def fake_decode(content: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real codec: FEATURE_DIM byte
    statistics from the blob's sha256 digest — stable across runs,
    partitionings, and engines."""
    digest = hashlib.sha256(content).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_media(content: bytes, kind: str):  # pragma: no cover - stub
    """THE CODEC STUB. A real deployment injects PIL / torchaudio /
    pyav here; this container has none of them."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "inject a decoder or use fake_decode"
    )


def pil_image_decoder(content: bytes, kind: str) -> list[float]:
    """Real-codec adapter for the injectable boundary: decodes image
    blobs with PIL into a FEATURE_DIM grayscale thumbnail vector
    (deterministic — nearest-neighbour resample, no dithering).
    Non-image kinds fall back to :func:`fake_decode`. Import is
    lazy and failure maps to ``NotImplementedError`` so environments
    without PIL degrade exactly like :func:`decode_media`; the
    integration test (``tests/test_multimodal_streaming.py``) skips
    itself when PIL is absent and proves the swap-one-function
    contract when present."""
    if kind != "image":
        return fake_decode(content, kind)
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "PIL is not installed; inject another decoder or use fake_decode"
        ) from exc
    import io

    img = Image.open(io.BytesIO(content)).convert("L")
    thumb = img.resize((FEATURE_DIM, 1), resample=Image.NEAREST)
    return [p / 255.0 for p in thumb.getdata()]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = fake_decode,
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` streams record batches through Python; the
    decoder runs per blob inside the batch loop (vectorization
    happens at transfer granularity — codecs are inherently
    per-item). Input repartitions by ``media_id`` so blob bytes
    spread evenly across tasks regardless of upstream layout."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
                "features": [
                    decoder(bytes(c), k)
                    for c, k in zip(pdf["content"], pdf["kind"])
                ],
            })
            yield out

    return (
        media.repartition("media_id")
        .select("media_id", "kind", "content")
        .mapInPandas(run, schema=FEATURES_SCHEMA)
    )


PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("phash", T.LongType()),
])


def byte_ngram_phash(content: bytes, kind: str) -> int:
    """Deterministic stand-in for a perceptual image hash: a 64-bit
    SimHash over the blob's DISTINCT 4-grams (decoded as UTF-8 —
    the synthetic media blobs are text bytes), packed exactly like
    ``operators.dedup.simhash``'s md5 family (bit i = sign of the
    summed ±1 charges from bit i%32 of hex half i//32 of
    md5(gram)). Locality-sensitive by construction — blobs sharing
    most 4-grams differ in few signature bits — and every step is
    SQL-expressible, so the q118 DuckDB oracle reproduces the
    fingerprint bit-for-bit from the source text. A real deployment
    swaps in :func:`pil_ahash` (below) at the same injectable
    boundary."""
    s = content.decode("utf-8")
    grams = {s[i : i + 4] for i in range(max(len(s) - 3, 1))}
    acc = [0] * 64
    for g in grams:
        hexd = hashlib.md5(g.encode("utf-8")).hexdigest()
        h0, h1 = int(hexd[:8], 16), int(hexd[8:16], 16)
        for i in range(32):
            acc[i] += ((h0 >> i) & 1) * 2 - 1
            acc[32 + i] += ((h1 >> i) & 1) * 2 - 1
    val = sum(1 << i for i in range(64) if acc[i] > 0)
    return val - (1 << 64) if val >= (1 << 63) else val


def pil_ahash(content: bytes, kind: str) -> int:
    """Real-codec perceptual hash for the injectable boundary: PIL
    decode → 8×8 grayscale thumbnail → mean-threshold bits (the
    classic aHash; bit i = pixel i ≥ mean, row-major), packed into
    one signed 64-bit long with the same wrap convention as
    :func:`byte_ngram_phash`. Non-image kinds fall back to the
    deterministic stand-in; missing PIL degrades to
    ``NotImplementedError`` exactly like :func:`decode_media`."""
    if kind != "image":
        return byte_ngram_phash(content, kind)
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "PIL is not installed; inject another fingerprint or use "
            "byte_ngram_phash"
        ) from exc
    import io

    img = Image.open(io.BytesIO(content)).convert("L")
    px = list(img.resize((8, 8), resample=Image.NEAREST).getdata())
    mean = sum(px) / 64.0
    val = sum(1 << i for i, p in enumerate(px) if p >= mean)
    return val - (1 << 64) if val >= (1 << 63) else val


def media_fingerprint(
    media: DataFrame,
    fingerprint: Callable[[bytes, str], int] = byte_ngram_phash,
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched 64-bit fingerprint extraction over the binary
    column — :func:`extract_features`'s plumbing with a packed-long
    output (8 bytes per media row downstream instead of a float
    array; the pair join in ``dedup.hash64_pairs`` moves fingerprints
    only, never blobs). Repartitions by ``media_id`` so blob bytes
    spread evenly across tasks regardless of upstream layout."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "phash": pd.array(
                    [
                        fingerprint(bytes(c), k)
                        for c, k in zip(pdf["content"], pdf["kind"])
                    ],
                    dtype="int64",
                ),
            })

    return (
        media.repartition("media_id")
        .select("media_id", "kind", "content")
        .mapInPandas(run, schema=PHASH_SCHEMA)
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes content through untouched (STUB — a
    real pipeline transcodes in the same mapInPandas shape as
    :func:`extract_features`) while updating the typed metadata,
    which is the part downstream pruning relies on."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled
    timestamp (the explode happens JVM-side off the metadata; only
    the per-frame decode — stubbed — would touch the bytes). Shows
    the scale-correct shape: metadata drives the fan-out, blobs are
    not duplicated per frame."""
    ts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
            F.lit(every_ms),
        )
    ).alias("frame_ts_ms")
    return media.filter(F.col("kind") == "video").select(
        "media_id", ts, F.md5(F.col("content")).alias("content_md5")
    )
