"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the *decode* steps are
stubbed (deterministic fakes clearly marked); everything Spark-side —
schemas, Arrow batch shape, mapInPandas partitioning, metadata
extraction — is real and tested.  Swapping the stub for PIL/ffmpeg is
a one-function change that doesn't touch the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),      # -1 when unknown
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(DoubleType())),
])


def synth_media(spark, n: int = 100, seed: int = 0,
                payload_universe: int | None = None) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the
    row index (so tests are stable), metadata shaped like real media.
    ``payload_universe`` folds payloads onto ``id % universe`` keys so
    a corpus with exact duplicate blobs can be synthesized (the
    media-dedup input shape)."""
    kinds = F.element_at(F.lit(["image", "audio", "video"]),
                         (F.col("id") % 3 + 1).cast("int"))
    mimes = F.element_at(F.lit(["image/png", "audio/wav", "video/mp4"]),
                         (F.col("id") % 3 + 1).cast("int"))
    pkey = (F.col("id") if payload_universe is None
            else F.col("id") % payload_universe)
    payload = F.sha2(F.concat(F.lit(str(seed)), pkey.cast("string")), 256) \
        .cast("binary")
    return (spark.range(n)
            .select(F.col("id").alias("media_id"),
                    kinds.alias("kind"),
                    payload.alias("payload"),
                    mimes.alias("mime"),
                    (F.col("id") % 1920 + 1).cast("int").alias("width"),
                    (F.col("id") % 1080 + 1).cast("int").alias("height"),
                    (F.col("id") % 60000).cast("int").alias("duration_ms")))


# Optional real codecs, import-gated: the sandbox has neither PIL nor
# soundfile, so the deterministic stub stays the ORACLE path (exact
# integer math a SQL engine can replay); real decode is opt-in via
# decode="real"/"auto" and swaps one per-row function — the Spark plan
# (mapInPandas schema, batching, partitioning) is identical.
try:
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:                       # sandbox path
    _PIL_Image = None
try:
    import soundfile as _soundfile  # type: ignore
except ImportError:                 # sandbox path
    _soundfile = None


def _decode_image_stub(payload: bytes, dim: int) -> list[float]:
    """STUB — container lacks PIL/libjpeg.  Deterministic fake feature:
    byte histogram folded to `dim` lanes, emitted as exact
    parts-per-million fractions (integer math throughout, then one
    IEEE double division — bit-identical in any engine, which is what
    lets the DuckDB oracle replay this).  The real twin is
    :func:`_decode_image_real` (PIL), selected by ``decode=``.
    """
    acc = [0] * dim
    for j, b in enumerate(payload):
        acc[j % dim] += b
    norm = sum(acc) or 1
    return [(a * 1_000_000 // norm) / 1e6 for a in acc]


def _decode_image_real(payload: bytes, dim: int) -> list[float]:
    """Real decode (PIL): grayscale pixel intensity folded to ``dim``
    lanes — the same output contract (ppm fractions summing to ~1) as
    the stub, so downstream operators (phash_pairs, media feature
    joins) are agnostic to which decoder produced the feature."""
    import io as _io
    img = _PIL_Image.open(_io.BytesIO(payload)).convert("L")
    acc = [0] * dim
    for j, px in enumerate(img.getdata()):
        acc[j % dim] += px
    norm = sum(acc) or 1
    return [(a * 1_000_000 // norm) / 1e6 for a in acc]


def _pick_decoder(decode: str):
    """Resolve the decode mode to a per-row function.  'stub' = the
    deterministic oracle fake; 'real' = PIL (ImportError when absent
    — fail loud, never silently fake); 'auto' = real when PIL is
    importable, else the stub."""
    if decode == "stub":
        return _decode_image_stub
    if decode == "real":
        if _PIL_Image is None:
            raise ImportError(
                "decode='real' needs Pillow (pip install Pillow); "
                "this environment has no image codecs — use "
                "decode='stub' (deterministic fake) or 'auto'")
        return _decode_image_real
    if decode == "auto":
        return (_decode_image_real if _PIL_Image is not None
                else _decode_image_stub)
    raise ValueError(f"decode must be stub|real|auto, got {decode!r}")


def extract_features(media: DataFrame, dim: int = 16,
                     batch_hint: int = 1024,
                     decode: str = "stub") -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    Partition-local, zero shuffle; batches arrive as pandas frames of
    the input partitions, so executor memory is bounded by
    `spark.sql.execution.arrow.maxRecordsPerBatch` — set it when
    payloads are large (e.g. 64 for 4K images).  ``decode`` picks the
    per-row decoder (stub oracle fake / PIL / auto) without touching
    the plan.
    """
    import pandas as pd

    decoder = _pick_decoder(decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: len(p or b"")),
                "feature": feats,
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decode: str = "stub") -> DataFrame:
    """Image resize.  The default ('stub') path updates the typed
    metadata and passes payload through — the oracle-replayable shape.
    ``decode='real'`` (PIL required; 'auto' falls back to the stub
    path) actually re-encodes each image payload at the new size via
    the same partition-local mapInPandas pattern as extract_features:
    zero shuffle either way."""
    if decode not in ("stub", "real", "auto"):
        raise ValueError(f"decode must be stub|real|auto, got {decode!r}")
    if decode == "real" and _PIL_Image is None:
        raise ImportError(
            "decode='real' needs Pillow; use decode='stub' or 'auto'")
    meta_only = (media.withColumn(
        "width", F.when(F.col("kind") == "image", width)
        .otherwise(F.col("width")))
        .withColumn("height", F.when(F.col("kind") == "image", height)
                    .otherwise(F.col("height"))))
    if decode == "stub" or _PIL_Image is None:
        return meta_only

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        for pdf in batches:
            out = []
            for p, kind in zip(pdf["payload"], pdf["kind"]):
                if kind != "image" or p is None:
                    out.append(p)
                    continue
                img = _PIL_Image.open(_io.BytesIO(p)).resize((width, height))
                buf = _io.BytesIO()
                img.save(buf, format=img.format or "PNG")
                out.append(buf.getvalue())
            pdf = pdf.assign(payload=out)
            yield pdf

    return meta_only.mapInPandas(run, meta_only.schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    timestamp (posexplode over the computed timestamp grid).  Frame
    *decode* is stubbed; the row fan-out, schema, and per-frame key
    are the real thing."""
    frames = F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms)
                                             .cast("int") - 1, F.lit(0)))
    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload",
                    F.posexplode(frames).alias("frame_idx", "_t"))
            .withColumn("frame_ts_ms", F.col("_t") * every_ms)
            .drop("_t")
            .withColumn("frame_payload",
                        F.sha2(F.concat(F.col("payload").cast("string"),
                                        F.col("frame_idx").cast("string")), 256)
                        .cast("binary")))  # STUB: real impl decodes the frame


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact duplicate groups over opaque media blobs: md5 of the
    payload BYTES (no decode needed — identical files dedupe whatever
    the codec), one shuffle on the uniform 128-bit digest with
    map-side partial aggregation; the keeper is the min media_id.
    The multimodal twin of dedup.dedup_exact: at 100 TB this is the
    first pass of any crawl's image/video pipeline (exact re-crawls
    and mirrors collapse before any expensive perceptual hashing)."""
    return (media.select(F.md5(F.col("payload")).alias("digest"),
                         F.col("media_id"), F.col("kind"))
            .groupBy("digest")
            .agg(F.count("*").alias("n_copies"),
                 F.min("media_id").alias("keeper_media_id"),
                 F.countDistinct("kind").alias("n_kinds"))
            .filter(F.col("n_copies") > 1))


def segment_audio(media: DataFrame, win_ms: int = 5000,
                  hop_ms: int = 2500, decode: str = "stub") -> DataFrame:
    """Audio segmentation plumbing: one row per (overlapping) analysis
    window over the clip — the sliding-window fan-out every audio
    featurizer (ASR chunking, VAD, fingerprinting) starts from.
    ``hop_ms < win_ms`` gives overlap; the tail window is clipped to
    the clip end, and every clip yields at least one window.

    Default decode='stub' (no codecs in the container): the
    per-segment payload is a deterministic fake, but the row fan-out,
    integer window arithmetic, schema and Arrow batch shape are the
    real thing.  decode='real' (soundfile required; 'auto' falls back
    to the stub) re-slices the actual samples per window via a
    partition-local mapInPandas over the already-fanned-out rows —
    the fan-out plan is identical.  Narrow posexplode, no shuffle; at
    100 TB the fan-out factor is duration/hop, bounded per row and
    uniform."""
    if decode not in ("stub", "real", "auto"):
        raise ValueError(f"decode must be stub|real|auto, got {decode!r}")
    if decode == "real" and _soundfile is None:
        raise ImportError(
            "decode='real' needs soundfile (pip install soundfile); "
            "use decode='stub' (deterministic fake) or 'auto'")
    n_seg = (F.floor(F.greatest(F.col("duration_ms") - win_ms, F.lit(0))
                     / hop_ms).cast("int") + 1)
    fanned = (media.filter(F.col("kind") == "audio")
              .select("media_id", "payload", "duration_ms",
                      F.posexplode(F.sequence(F.lit(0), n_seg - 1))
                      .alias("seg_idx", "_s"))
              .withColumn("seg_start_ms", F.col("_s") * hop_ms)
              .withColumn("seg_end_ms",
                          F.least(F.col("seg_start_ms") + win_ms,
                                  F.col("duration_ms").cast("long")))
              .drop("_s"))
    if decode == "stub" or _soundfile is None:
        return fanned.withColumn(
            "seg_payload",
            F.sha2(F.concat(F.col("payload").cast("string"),
                            F.col("seg_idx").cast("string")),
                   256).cast("binary"))  # STUB decode

    import pandas as pd

    out_schema = fanned.withColumn(
        "seg_payload", F.lit(b"")).schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        for pdf in batches:
            segs = []
            for p, s0, s1 in zip(pdf["payload"], pdf["seg_start_ms"],
                                 pdf["seg_end_ms"]):
                data, rate = _soundfile.read(_io.BytesIO(p))
                lo, hi = int(s0 * rate / 1000), int(s1 * rate / 1000)
                buf = _io.BytesIO()
                _soundfile.write(buf, data[lo:hi], rate, format="WAV")
                segs.append(buf.getvalue())
            yield pdf.assign(seg_payload=segs)

    return fanned.mapInPandas(run, out_schema)


def phash_pairs(features: DataFrame, dim: int = 16, bands: int = 4,
                max_hamming: int = 2, max_block: int = 256) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over decoded media
    features — the step after :func:`media_dedup`'s exact digest pass
    (re-encodes and crops survive byte-dedup; a pHash catches them).
    Each media's feature vector binarizes against its own mean
    (bit_d = 16·ppm_d > Σppm, pure integer compare on the exact ppm
    lanes) into a ``dim``-bit code; candidate pairs share at least
    one of ``bands`` code bands (the classic Hamming-LSH guarantee:
    distance ≤ bands−1 ⇒ some band equal), then the exact
    ``bit_count(xor)`` distance filters to ≤ ``max_hamming``.

    Scale shape: one narrow code pass, posting lists per (band, value)
    with a ``max_block`` cap (hot postings are degenerate codes — flat
    images — and capping them bounds the pair fanout linearly, the
    dedup_fuzzy lesson), in-array pair expansion, distinct, exact
    integer distance.  Returns (a, b, hamming) with a < b.
    """
    ppm = "transform(feature, x -> CAST(round(x * 1000000) AS BIGINT))"
    tot = f"aggregate({ppm}, 0L, (a, x) -> a + x)"
    code = (f"aggregate(transform(sequence(0, {dim - 1}), "
            f"i -> IF(element_at({ppm}, i + 1) * {dim} > {tot}, "
            f"shiftleft(1L, i), 0L)), 0L, (a, x) -> a + x)")
    width = dim // bands
    coded = features.select(F.col("media_id").alias("m"),
                            F.expr(code).alias("code"))
    banded = coded.select(
        "m", "code",
        F.explode(F.expr(
            f"transform(sequence(0, {bands - 1}), b -> struct(b AS band, "
            f"(code div shiftleft(1L, b * {width})) % {1 << width}"
            " AS bval))")).alias("p")) \
        .select("m", "code", "p.band", "p.bval")
    posting = (banded.groupBy("band", "bval")
               .agg(F.slice(F.sort_array(
                   F.collect_list(F.struct("m", "code"))),
                   1, max_block).alias("ms"))
               .filter(F.size("ms") > 1))
    pairs = posting.select(F.explode(F.expr(
        "flatten(transform(ms, (x, i) -> transform("
        "slice(ms, i + 2, size(ms)), y -> struct(x.m AS a, y.m AS b, "
        "x.code AS ca, y.code AS cb))))")).alias("p")) \
        .select("p.a", "p.b", "p.ca", "p.cb").distinct()
    ham = F.expr("bit_count(ca ^ cb)").cast("long")
    return (pairs.select("a", "b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
