"""Multimodal column plumbing (BASELINE.json north star).

Image/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schema, partition-preserving batch
transforms, Arrow exchange shapes — is real and tested; the *codec* step is
stubbed (no image/audio libraries in this container) behind
``NotImplementedError`` or a deterministic fake, clearly marked.

Scale shape: blobs ride through ``mapInPandas`` (Arrow record batches, zero
per-row Python overhead); feature extraction is per-partition streaming, so
executor memory holds one batch of blobs, never a partition's worth of
decoded frames. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for 10 MB media blobs
set it to ~32, not the 10k default.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every blob column
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal shape from the documents table: a binary payload
    column + metadata struct. (Stands in for reading real media files via
    ``spark.read.format('binaryFile')``, which has the same shape: path,
    length, content binary.)"""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.length(blob).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("media_meta"),
    )


def decode_media(blob: bytes, media_type: str):
    """Codec stub. Real deployments plug PIL/libav/etc. here.

    STUB: the container ships no media libraries (by design); anything but
    the deterministic text fake raises.
    """
    if media_type == "text/plain":
        return blob  # deterministic fake decode: identity
    raise NotImplementedError(
        f"no codec for {media_type!r}: install a media library and register "
        "a decoder (deliberate stub, see module docstring)"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Per-blob features via mapInPandas (Arrow batches, partition-
    preserving — no shuffle). Features are deterministic byte stats so the
    plumbing is value-checkable without any codec.

    The histogram is ``np.bincount`` over a zero-copy ``np.frombuffer`` view
    and the entropy is one vectorized numpy expression — no per-byte Python
    in the batch loop (round-1 bench: the per-byte dict version cost ~10x
    its mapInPandas siblings)."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["blob"], pdf["media_meta"]
            ):
                raw = decode_media(bytes(blob), meta["media_type"])
                n = len(raw)
                if n:
                    counts = np.bincount(
                        np.frombuffer(raw, dtype=np.uint8), minlength=256
                    )
                    p = counts[counts > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = 0.0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": n,
                        "first_byte": raw[0] if n else -1,
                        "byte_entropy": round(entropy, 4),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: take one byte every
    ``every_n_bytes`` as a fixed-rate sample (the video-frame-sampling shape:
    partition-preserving explode of blob → samples). Pure built-ins."""
    return df.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(int(media_meta.n_bytes / {every_n_bytes}), 1)), "
                f"i -> substring(blob, (i - 1) * {every_n_bytes} + 1, 1))"
            )
        ).alias("frame_idx", "frame_byte"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb_len", T.IntegerType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_blobs(df: DataFrame, target_bytes: int = 32) -> DataFrame:
    """'Resize' over the opaque payload: truncate-or-pad every blob to a
    fixed byte budget (the image-thumbnail / audio-clip shape: constant
    output size per row regardless of input size). Runs in mapInPandas —
    Arrow batch in, Arrow batch out, partition-preserving, no shuffle — and
    emits (length, digest) rather than the raw thumb so results are
    engine-portable for the oracle. A real deployment swaps the byte slice
    for PIL.resize / ffmpeg -s inside the same batch loop."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)[:target_bytes].ljust(target_bytes, b" ")
                rows.append(
                    {
                        "doc_id": doc_id,
                        "thumb_len": len(raw),
                        "thumb_md5": hashlib.md5(raw).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA.fields]
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


#: integer DCT-II basis, K[u][x] = round(cos((2x+1) * u * pi / 16) * 8192)
#: — one shared literal (generated once, no runtime trig) so the Spark
#: numpy fold and the DuckDB relational fold use bit-identical
#: coefficients.  No entry sits on a .5 rounding tie (checked at
#: generation), so the table is rounding-mode-unambiguous.
DCT_K8 = [
    [8192, 8192, 8192, 8192, 8192, 8192, 8192, 8192],
    [8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035],
    [7568, 3135, -3135, -7568, -7568, -3135, 3135, 7568],
    [6811, -1598, -8035, -4551, 4551, 8035, 1598, -6811],
    [5793, -5793, -5793, 5793, 5793, -5793, -5793, 5793],
    [4551, -8035, 1598, 6811, -6811, -1598, 8035, -4551],
    [3135, -7568, 7568, -3135, -3135, 7568, -7568, 3135],
    [1598, -4551, 6811, -8035, 8035, -6811, 4551, -1598],
]

#: fixed-point scale for block means: m_fp = (block_sum << 20) // count.
#: Bounds the DCT accumulator at 64 * 255*2^20 * 8192^2 ~ 1.15e18 < 2^63.
DCT_MEAN_SHIFT = 20


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.IntegerType()),
        T.StructField("b1", T.IntegerType()),
        T.StructField("b2", T.IntegerType()),
        T.StructField("b3", T.IntegerType()),
    ]
)


def phash_bands(df: DataFrame) -> DataFrame:
    """64-bit perceptual fingerprint of every blob as 4 x 16-bit bands —
    the blockhash/aHash family (pHash's structure with the DCT swapped
    for block means, since no image codec ships in this container; a
    real deployment decodes the blob and DCTs inside the same batch
    loop).  Byte position p (0-based, blob length L) belongs to block
    ``r = p * 64 // L``; bit_r = 1 iff the block's byte mean exceeds the
    blob's global mean, compared CROSS-MULTIPLIED in exact integers
    (``block_sum * L > total_sum * block_cnt``) so no float ever enters
    the fingerprint — bit-identical to the character-based SQL oracle on
    this ASCII corpus.  Near-identical blobs (a few perturbed bytes)
    disturb only the touched blocks' means, so their fingerprints differ
    in a handful of bits — the property Hamming-banded LSH exploits.

    Runs in mapInPandas (Arrow batches, partition-preserving, no
    shuffle); block sums are exact int64 cumulative-sum differences, no
    per-byte Python."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                raw = bytes(blob)
                n = len(raw)
                if n == 0:
                    rows.append(
                        {"doc_id": doc_id, "b0": 0, "b1": 0, "b2": 0, "b3": 0}
                    )
                    continue
                arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                cs = np.concatenate(([0], np.cumsum(arr)))
                total = int(cs[-1])
                # block r covers positions [ceil(r*n/64), ceil((r+1)*n/64))
                # == {p : p*64//n == r}
                starts = (np.arange(65, dtype=np.int64) * n + 63) // 64
                bsum = cs[starts[1:]] - cs[starts[:-1]]
                bcnt = starts[1:] - starts[:-1]
                bits = (bsum * n > total * bcnt).astype(np.int64)
                weights = 1 << np.arange(16, dtype=np.int64)
                bands = [
                    int((bits[16 * b : 16 * b + 16] * weights).sum())
                    for b in range(4)
                ]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PHASH_SCHEMA.fields]
            )

    return df.mapInPandas(batches, schema=PHASH_SCHEMA)


def _block_grid(raw: bytes):
    """Exact fixed-point 8x8 block-mean grid of a blob: byte position p
    (0-based, length n) belongs to block r = p * 64 // n (row-major x =
    r // 8, y = r % 8); m_fp[r] = (block_sum << DCT_MEAN_SHIFT) //
    block_count, 0 for uncovered blocks.  Pure int64 — the same floor
    division a BIGINT SQL engine computes."""
    import numpy as np

    n = len(raw)
    m = np.zeros(64, dtype=np.int64)
    if n == 0:
        return m
    arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    cs = np.concatenate(([0], np.cumsum(arr)))
    starts = (np.arange(65, dtype=np.int64) * n + 63) // 64
    bsum = cs[starts[1:]] - cs[starts[:-1]]
    bcnt = starts[1:] - starts[:-1]
    covered = bcnt > 0
    m[covered] = (bsum[covered] << DCT_MEAN_SHIFT) // bcnt[covered]
    return m


def phash_dct_bands(df: DataFrame) -> DataFrame:
    """True-DCT 64-bit perceptual fingerprint as 4 x 16-bit bands (r14
    verdict item 4 — the upgrade over :func:`phash_bands`' blockhash,
    which a low-frequency warp that preserves every block-mean-vs-
    global-mean sign slips through).  Pipeline: exact fixed-point 8x8
    block-mean grid (:func:`_block_grid`) -> 2-D DCT-II via the shared
    integer basis ``C = K @ M @ K^T`` (``DCT_K8``, pure int64 matmul —
    no float enters the fingerprint) -> bit_{u,v} = 1 iff C[u,v] > 0,
    with the always-positive DC coefficient (u=v=0) pinned to 0.  A
    smooth brightness ramp leaves block-mean signs intact but flips
    low-frequency coefficient signs, so the DCT hash separates what
    blockhash cannot (pytested with the planted warp).  Bit order:
    bit index = 8u + v, bands of 16 as in :func:`phash_bands`.

    Runs in mapInPandas (Arrow batches, partition-preserving, no
    shuffle); the DuckDB oracle computes the identical bits as a
    relational fold over the same literal basis, so the contract is
    bit-for-bit."""
    import numpy as np
    import pandas as pd

    k8 = np.array(DCT_K8, dtype=np.int64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                m = _block_grid(bytes(blob)).reshape(8, 8)
                c = k8 @ m @ k8.T  # exact int64
                bits = (c > 0).astype(np.int64).reshape(64)
                bits[0] = 0  # DC: positive whenever the blob is, drop it
                weights = 1 << np.arange(16, dtype=np.int64)
                bands = [
                    int((bits[16 * b : 16 * b + 16] * weights).sum())
                    for b in range(4)
                ]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PHASH_SCHEMA.fields]
            )

    return df.mapInPandas(batches, schema=PHASH_SCHEMA)
