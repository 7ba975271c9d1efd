"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``set_decoder`` (a deterministic fake ships for tests) — but the
Spark-side plumbing is real and exercised: schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing. Swapping in Pillow/librosa
on a real cluster is a one-function change.

Design for 100 TB of binaries:
- binaries travel as BINARY columns read via ``spark.read.format
  ("binaryFile")`` or parquet BLOB columns; metadata (dims, codec,
  duration) lives beside them in typed columns so filters prune
  WITHOUT touching bytes.
- decode/feature steps are ``mapInPandas`` (Arrow-batched); batch size
  is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
  partition of 100 MB images doesn't materialize at once.
- frame sampling / resize emit NEW binary columns; the pipeline stays
  columnar end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "id bigint, width int, height int, n_bytes bigint, sha256 string"
EMBED_SCHEMA = "id bigint, feature array<float>"


def fake_decode(raw: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: 'dimensions' derived
    from the payload size (simple arithmetic so the oracle can replicate
    it in SQL). Replace via set_decoder on a real cluster."""
    if raw is None or len(raw) == 0:
        raise ValueError("empty binary payload")
    n = len(raw)
    return 16 + n % 240, 16 + (n * 7) % 240


_decoder: Callable[[bytes], tuple[int, int]] = fake_decode


def set_decoder(fn: Callable[[bytes], tuple[int, int]]) -> None:
    """Install a real decoder (e.g. PIL.Image.open → size)."""
    global _decoder
    _decoder = fn


def real_decoder_unavailable(raw: bytes) -> tuple[int, int]:
    raise NotImplementedError(
        "image/audio codecs are not installed in this container; "
        "call set_decoder(...) with a real implementation"
    )


def decode_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "data") -> DataFrame:
    """BINARY column → typed metadata rows via Arrow-batched mapInPandas.
    Output: (id, width, height, n_bytes, sha256)."""
    dec = _decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, raw in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(raw)
                w, h = dec(raw)
                out.append((i, w, h, len(raw), hashlib.sha256(raw).hexdigest()))
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "n_bytes", "sha256"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, DECODE_SCHEMA)


def feature_extract(
    df: DataFrame, id_col: str = "id", bin_col: str = "data", dim: int = 8
) -> DataFrame:
    """Binary → fixed-dim float feature vector (stub: normalized byte
    histogram folded to ``dim``). Real model inference plugs into the
    same mapInPandas seam (batch-parallel, Arrow transfer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, raw in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(raw)
                hist = [0.0] * dim
                for b in raw:
                    hist[b % dim] += 1.0
                total = sum(hist) or 1.0
                out.append((i, [v / total for v in hist]))
            yield pd.DataFrame(out, columns=["id", "feature"])

    return df.select(id_col, bin_col).mapInPandas(run, EMBED_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "data",
    every: int = 64,
    frame_size: int = 16,
) -> DataFrame:
    """'Video' → sampled 'frames' (stub: every Nth fixed-size byte
    slice), one row per frame: (id, frame_no, frame BINARY). Shows the
    UDTF-ish 1→N expansion shape with bounded output batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, raw in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(raw)
                for n, off in enumerate(range(0, len(raw), every)):
                    ids.append(i)
                    nos.append(n)
                    frames.append(raw[off : off + frame_size])
            yield pd.DataFrame({"id": ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, bin_col).mapInPandas(
        run, "id bigint, frame_no int, frame binary"
    )


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test helper: synthesize a BINARY column from a text column so the
    multimodal plumbing is exercisable on the synthetic tables."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("data")
    )


def fake_resize(raw: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in for an image resampler: keep every
    stride-th byte so the output length is exactly target_w*target_h
    (padding with zero bytes when the source is smaller). Replace via
    set_resizer on a real cluster — the Spark-side plumbing (schema,
    Arrow batching, 1:1 row shape) is identical for a real resampler."""
    n_out = target_w * target_h
    if raw is None:
        raise ValueError("empty binary payload")
    n = len(raw)
    if n >= n_out:
        stride = n // n_out
        out = bytes(raw[i * stride] for i in range(n_out))
    else:
        out = bytes(raw) + b"\x00" * (n_out - n)
    return out


_resizer: Callable[[bytes, int, int], bytes] = fake_resize


def set_resizer(fn: Callable[[bytes, int, int], bytes]) -> None:
    """Install a real resampler (e.g. PIL resize → tobytes)."""
    global _resizer
    _resizer = fn


RESIZE_SCHEMA = "id bigint, out_w int, out_h int, n_bytes_out bigint, data binary"


def resize_images(
    df: DataFrame,
    target_w: int = 16,
    target_h: int = 16,
    id_col: str = "id",
    bin_col: str = "data",
) -> DataFrame:
    """Binary → fixed-size 'image' resize through the same injectable
    mapInPandas seam as decode/feature-extract: Arrow batches in, one
    output row per input, resampler swappable (fake byte-stride stub
    here; codecs are not in this container)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "out_w": [], "out_h": [], "n_bytes_out": [], "data": []}
            for i, raw in zip(pdf[id_col], pdf[bin_col]):
                resized = _resizer(bytes(raw), target_w, target_h)
                out["id"].append(i)
                out["out_w"].append(target_w)
                out["out_h"].append(target_h)
                out["n_bytes_out"].append(len(resized))
                out["data"].append(resized)
            yield pd.DataFrame(out, columns=["id", "out_w", "out_h", "n_bytes_out", "data"])

    return df.select(id_col, bin_col).mapInPandas(run, RESIZE_SCHEMA)


AHASH_SCHEMA = "id bigint, ahash_hi bigint, ahash_lo bigint"


def average_hash(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "data",
    grid: int = 8,
) -> DataFrame:
    """Perceptual average-hash (aHash) per binary payload: resize to a
    grid×grid byte image through the injectable resampler, then one
    bit per cell — set iff the cell is STRICTLY brighter than the
    image mean (integer cross-multiplication n·b > Σb, no float
    threshold). Returns (id, ahash_hi, ahash_lo): the 64-bit hash
    split into two 32-bit halves so both engines stay in non-negative
    BIGINT arithmetic.

    This is the image twin of simhash for text: identical payloads
    share a hash, near-identical payloads differ in few bits — pair
    by equality or a banded hamming join. The resampler is the fake
    byte-stride stub in this container (codecs absent); the hash
    arithmetic and Arrow plumbing are the real thing.
    """
    resized = resize_images(df, grid, grid, id_col, bin_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, raw in zip(pdf["id"], pdf["data"]):
                bs = bytes(raw)
                n, s = len(bs), sum(bs)
                hi = lo = 0
                for idx, b in enumerate(bs):
                    if n * b > s:
                        if idx < 32:
                            lo |= 1 << idx
                        else:
                            hi |= 1 << (idx - 32)
                out.append((i, hi, lo))
            yield pd.DataFrame(out, columns=["id", "ahash_hi", "ahash_lo"])

    return resized.select("id", "data").mapInPandas(run, AHASH_SCHEMA)


def ahash_duplicate_groups(
    df: DataFrame, id_col: str = "id", bin_col: str = "data"
) -> DataFrame:
    """Exact-aHash duplicate groups: one hash-keyed shuffle, groups
    with ≥ 2 images. Returns (ahash_hi, ahash_lo, n_imgs, ids) with
    ids comma-joined ascending (deterministic)."""
    hashed = average_hash(df, id_col, bin_col)
    return (
        hashed.groupBy("ahash_hi", "ahash_lo")
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.array_join(F.array_sort(F.collect_list("id")), ",").alias("ids"),
        )
        .filter(F.col("n_imgs") > 1)
    )


def ahash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "data",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs by aHash Hamming distance: band the
    64-bit hash into four 16-bit slices (a pair within hamming <
    n_bands shares at least one exact band — pigeonhole, the simhash
    blocking argument applied to image hashes), equi-join candidates,
    verify with bit_count. The hash stays as (hi, lo) 32-bit halves —
    a packed 64-bit value can go negative, and ``>>`` on a negative
    BIGINT is arithmetic in some engines (sign-extension would corrupt
    bucket extraction). Returns (id_a, id_b, hamming)."""
    if max_hamming >= 4:
        raise ValueError("4 bands guarantee recall only for hamming <= 3")
    hashed = average_hash(df, id_col, bin_col)
    m16 = (1 << 16) - 1
    banded = hashed.select(
        F.col("id"),
        "ahash_hi",
        "ahash_lo",
        F.posexplode(
            F.array(
                F.col("ahash_lo").bitwiseAND(F.lit(m16)),
                F.shiftrightunsigned("ahash_lo", 16).bitwiseAND(F.lit(m16)),
                F.col("ahash_hi").bitwiseAND(F.lit(m16)),
                F.shiftrightunsigned("ahash_hi", 16).bitwiseAND(F.lit(m16)),
            )
        ).alias("band", "bucket"),
    )
    l_ = banded.select(
        F.col("id").alias("id_a"),
        F.col("ahash_hi").alias("_ha"),
        F.col("ahash_lo").alias("_la"),
        "band",
        "bucket",
    )
    r_ = banded.select(
        F.col("id").alias("id_b"),
        F.col("ahash_hi").alias("_hb"),
        F.col("ahash_lo").alias("_lb"),
        "band",
        "bucket",
    )
    cand = (
        l_.join(r_, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) + F.bit_count(
        F.col("_la").bitwiseXOR(F.col("_lb"))
    )
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
