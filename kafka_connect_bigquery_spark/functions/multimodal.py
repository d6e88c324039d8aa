"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to typed metadata, and run decode/feature
extraction as Arrow-batched ``mapInPandas`` stages — the bytes never
leave the executor, Python sees them in columnar batches, and the
output schema is declared up front so the rest of the plan stays
declarative.

General codec libraries (PIL/librosa/ffmpeg) are NOT available in this
container, so ``decode_image_meta`` ships a clearly-marked deterministic
stand-in (md5-derived dimensions) behind the same plumbing — that keeps
results oracle-checkable. The production path exists too:
``decode_image_real`` / ``decode_audio_real`` are dependency-free
header parsers for the public PNG and WAV formats (stdlib
``struct``+``zlib``), contract-tested against synthesized real files;
richer codecs drop into the same ``Decoder`` signature. The Spark-side
contract — schema, batching, partition sizing — carries to production
unchanged either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The codec seam: bytes -> (width, height, n_frames). Anything with this
# signature — PIL, turbojpeg, a model server client — drops into
# decode_image_meta unchanged (contract-tested in tests/test_extensions.py).
Decoder = Callable[[bytes], tuple[int, int, int]]

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def pack_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Text -> opaque binary payload column (stands in for image bytes).

    Real pipelines read payloads from object storage with
    ``spark.read.format("binaryFile")`` — same downstream shape."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """Production image decode seam: a dependency-free PNG header
    parser (pure stdlib ``struct``+``zlib`` over the public PNG spec).

    PNG layout: 8-byte signature, then chunks of
    ``[len u32][type 4s][data][crc u32]`` with IHDR required first;
    IHDR data starts with width/height as big-endian u32. The IHDR CRC
    is verified (zlib.crc32 over type+data) so truncated/corrupt
    payloads fail loudly instead of yielding garbage dimensions.
    n_frames is the APNG ``acTL`` frame count when present, else 1.
    Swap in PIL/turbojpeg here for formats beyond PNG — same signature.
    """
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    if len(payload) < 33 or not payload.startswith(sig):
        raise ValueError("not a PNG payload (bad signature)")
    ln, typ = struct.unpack_from(">I4s", payload, 8)
    if typ != b"IHDR" or ln != 13:
        raise ValueError("malformed PNG: first chunk is not IHDR")
    data = payload[16 : 16 + 13]
    (crc,) = struct.unpack_from(">I", payload, 16 + 13)
    if zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF != crc:
        raise ValueError("malformed PNG: IHDR CRC mismatch")
    width, height = struct.unpack_from(">II", data, 0)
    # APNG animation control chunk (if present before IDAT) carries the
    # frame count; plain PNGs are single-frame
    n_frames, off = 1, 16 + 13 + 4
    while off + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, off)
        if typ == b"acTL" and ln >= 4:
            (n_frames,) = struct.unpack_from(">I", payload, off + 8)
            break
        if typ in (b"IDAT", b"IEND"):
            break
        off += 8 + ln + 4
    return int(width), int(height), int(n_frames)


def decode_image_meta(
    df: DataFrame,
    *,
    decoder: Decoder | None = None,
    batch_hint: int = 10_000,
) -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over (doc_id, payload).

    ``decoder`` is the pluggable codec seam (``Decoder``: bytes ->
    (width, height, n_frames)); pass ``decode_image_real`` once codecs
    exist, or any custom callable. With the default ``None`` the
    deterministic md5 stand-in runs, so results stay oracle-checkable in
    this codec-less environment. Batch shape and the declared output
    schema are the contract either way.
    """

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            md5s = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = pdf["payload"].map(len).astype("int64")
            out["content_md5"] = md5s
            if decoder is None:
                out["width"] = md5s.map(lambda m: 1 + int(m[0:2], 16)).astype("int64")
                out["height"] = md5s.map(lambda m: 1 + int(m[2:4], 16)).astype("int64")
                out["n_frames"] = (1 + out["n_bytes"] % 7).astype("int64")
            else:
                decoded = pdf["payload"].map(lambda b: decoder(bytes(b)))
                out["width"] = decoded.map(lambda t: t[0]).astype("int64")
                out["height"] = decoded.map(lambda t: t[1]).astype("int64")
                out["n_frames"] = decoded.map(lambda t: t[2]).astype("int64")
            yield out

    return df.mapInPandas(batches, IMAGE_META_SCHEMA)


def resize_stub(df: DataFrame, *, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Resize stage stub: declares the production output schema
    (payload -> resized payload + dims) while passing bytes through.
    Marks where per-batch vectorized resize slots in."""
    return df.withColumn("resized_width", F.lit(target[0])).withColumn(
        "resized_height", F.lit(target[1])
    )


def sample_frames(df: DataFrame, *, every_nth: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame index.

    Uses the decoded ``n_frames`` metadata (decode_image_meta) —
    frame indices 0, every_nth, 2*every_nth, … The row explosion stays
    declarative (sequence + explode, no Python), so at corpus scale the
    sampled-frame table partitions like any other fact table."""
    return df.withColumn(
        "frame_index",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
            )
        ),
    )


# --------------------------------------------------------------------------
# audio plumbing: decode seam + fixed-window chunking
# --------------------------------------------------------------------------

# bytes -> (sample_rate, n_samples, n_channels); librosa/soundfile/ffprobe
# all fit this signature.
AudioDecoder = Callable[[bytes], tuple[int, int, int]]

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_channels", T.LongType()),
    ]
)

_AUDIO_RATES = (8000, 16000, 44100)


def decode_audio_real(payload: bytes) -> tuple[int, int, int]:
    """Production audio probe seam: a dependency-free RIFF/WAVE header
    parser (pure stdlib ``struct`` over the public WAV spec).

    WAV layout: ``RIFF <size> WAVE`` then chunks of
    ``[id 4s][size u32le][data]`` (word-aligned); the ``fmt `` chunk
    carries channels/sample-rate/block-align, the ``data`` chunk's size
    over block-align is the per-channel sample count. Swap in
    soundfile/ffprobe here for formats beyond WAV — same signature."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (bad RIFF header)")
    sample_rate = n_channels = block_align = None
    n_samples = None
    off = 12
    while off + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, off)
        if cid == b"fmt " and size >= 16:
            _fmt, n_channels, sample_rate, _byte_rate, block_align = (
                struct.unpack_from("<HHIIH", payload, off + 8)
            )
        elif cid == b"data":
            if block_align is None:
                raise ValueError("malformed WAV: data chunk before fmt")
            n_samples = size // block_align if block_align else 0
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or n_samples is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    return int(sample_rate), int(n_samples), int(n_channels)


def decode_audio_meta(
    df: DataFrame,
    *,
    decoder: AudioDecoder | None = None,
) -> DataFrame:
    """Arrow-batched audio header probe over (doc_id, payload) — the
    audio twin of ``decode_image_meta``. Default is the deterministic
    md5 stand-in (rate from {8k, 16k, 44.1k}, whole-second duration up
    to 120 s) so results stay oracle-checkable without codecs; any
    ``AudioDecoder`` drops into the same batch shape and schema."""

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            md5s = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = pdf["payload"].map(len).astype("int64")
            out["content_md5"] = md5s
            if decoder is None:
                rates = md5s.map(lambda m: _AUDIO_RATES[int(m[0:2], 16) % 3])
                out["sample_rate"] = rates.astype("int64")
                out["n_samples"] = (
                    rates * (1 + md5s.map(lambda m: int(m[4:8], 16) % 120))
                ).astype("int64")
                out["n_channels"] = md5s.map(lambda m: 1 + int(m[2:3], 16) % 2).astype(
                    "int64"
                )
            else:
                decoded = pdf["payload"].map(lambda b: decoder(bytes(b)))
                out["sample_rate"] = decoded.map(lambda t: t[0]).astype("int64")
                out["n_samples"] = decoded.map(lambda t: t[1]).astype("int64")
                out["n_channels"] = decoded.map(lambda t: t[2]).astype("int64")
            yield out

    return df.mapInPandas(batches, AUDIO_META_SCHEMA)


def chunk_audio(df: DataFrame, *, chunk_seconds: int = 10) -> DataFrame:
    """Fixed-window audio chunking over decoded metadata: one row per
    chunk with sample offsets — what an ASR/feature stage consumes
    batch-wise. Pure sequence+explode (no Python), so the chunk table
    partitions and prunes like any fact table at corpus scale; the
    final (usually short) chunk is truncated to ``n_samples``."""
    spc = F.col("sample_rate") * chunk_seconds
    n_chunks = F.floor((F.col("n_samples") + spc - 1) / spc).cast("long")
    # n_samples=0 (reachable via any plugged-in decoder on an empty
    # file) would make sequence(0, -1) the DESCENDING array [0, -1] —
    # the same trap packing._gram_hashes guards against. Empty audio
    # emits zero chunk rows.
    chunk_idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.withColumn("chunk_index", F.explode(chunk_idx))
        .withColumn("start_sample", F.col("chunk_index") * spc)
        .withColumn(
            "end_sample", F.least(F.col("n_samples"), (F.col("chunk_index") + 1) * spc)
        )
    )


FEATURE_DIM = 4

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage over (doc_id, payload): Arrow-batched
    mapInPandas emitting a fixed-dim double vector per payload.

    Stand-in features are md5-derived (deterministic); in production
    the body becomes a vectorized model/codec call with the same
    (batch in -> batch out) shape and declared schema."""

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            md5s = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            out = pdf[["doc_id"]].copy()
            out["feature"] = md5s.map(
                lambda m: [
                    int(m[8 * i : 8 * i + 8], 16) / float(0xFFFFFFFF)
                    for i in range(FEATURE_DIM)
                ]
            )
            yield out

    return df.mapInPandas(batches, FEATURES_SCHEMA)
