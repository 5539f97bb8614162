"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs, and
implements decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` operators. The actual codec calls are STUBBED (the image/
audio libraries are not in this container): ``decode_fn=None`` uses a
deterministic fake decoder so the Spark-side contract — schema, batch
shape, partitioning, null handling — is real and tested; pass a real
``decode_fn(payload: bytes) -> dict`` to swap in PIL/ffmpeg/etc.

Scale notes: media payloads dominate row size, so operators project the
binary column as late as possible and ``spark.sql.files.maxPartitionBytes``
governs scan granularity; mapInPandas streams Arrow batches so a partition
never fully materializes in Python memory.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, source_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped table from any table: payload = utf-8 bytes of
    ``source_col`` (a deterministic stand-in for real image/audio bytes),
    plus a media_type derived from the id.

    Rows with a NULL id are dropped AT THE GATE: every downstream kernel
    (decode / resize / frame-sample / features) declares ``media_id``
    non-nullable — an unattributable object can never be joined back —
    and letting a null id through surfaces as an Arrow null-in-non-null
    crash deep inside a codegen stage instead of a visible contract
    (``driver_sim --perturb-nulls`` find on NULL-seeded ids)."""
    return df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(source_col), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            # pmod, not %: a NEGATIVE id's sign-following remainder made
            # the element_at index 0 (crash) or -1 (silent last-element
            # pick) — r11 --perturb-neg-ids find, seed 419
            (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo-dimensions
    from the payload hash. Raises on None payloads like a real decoder."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 + h[2] % 30,
    }


def codec_available() -> bool:
    """True when Pillow is importable — the capability probe mirroring
    the delta-jar ``Class.forName`` pattern in ``sources/readers.py``:
    detect at call time, never hard-import, so the module loads (and the
    stub path runs) in codec-less containers."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _skip_gif_subblocks(payload: bytes, pos: int) -> int:
    """Advance past a GIF data-sub-block chain (len-prefixed blocks,
    0x00 terminator); returns the position after the terminator."""
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def header_decode(payload: bytes) -> dict:
    """Dependency-free REAL decoder for the two container formats whose
    metadata lives in fixed public-spec headers: PNG (width/height from
    the IHDR chunk, per the PNG spec every file leads with it) and GIF
    (width/height from the logical screen descriptor; n_frames by
    walking the block stream and counting 0x2C image descriptors).
    Raises ValueError on any other bytes, exactly like a real codec
    meeting a non-image — callers' per-object try/except nulls the
    decode fields.

    Exists so the real-codec decode path has an EXECUTED test in
    codec-less containers (r08 verdict item 6): unlike ``_fake_decode``
    this parses actual image bytes, and unlike ``pil_decode`` it needs
    only the stdlib. Pillow stays the preferred real codec when
    importable (``default_decode_fn``) — this decoder reads container
    headers, it does not decompress pixel data."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("PNG without leading IHDR chunk")
        w, h = struct.unpack(">II", payload[16:24])
        return {"width": w, "height": h, "n_frames": 1}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 13:
            raise ValueError("truncated GIF header")
        w, h = struct.unpack("<HH", payload[6:10])
        flags = payload[10]
        pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
        frames = 0
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x2C:  # image descriptor = one frame
                frames += 1
                if pos + 10 > len(payload):
                    raise ValueError("truncated GIF image descriptor")
                lflags = payload[pos + 9]
                pos += 10 + (3 * (2 << (lflags & 0x07)) if lflags & 0x80 else 0)
                pos += 1  # LZW minimum code size byte
                pos = _skip_gif_subblocks(payload, pos)
            elif b0 == 0x21:  # extension: label byte then sub-blocks
                pos = _skip_gif_subblocks(payload, pos + 2)
            else:
                raise ValueError(f"corrupt GIF block 0x{b0:02x}")
        if frames == 0:
            raise ValueError("GIF with no image descriptors")
        return {"width": w, "height": h, "n_frames": frames}
    raise ValueError("unsupported container (header_decode reads PNG/GIF)")


def pil_decode(payload: bytes) -> dict:
    """Real-codec decode via Pillow: width/height from the image header,
    n_frames from multi-frame formats (GIF/TIFF; 1 otherwise). Raises on
    non-image bytes like any decoder — callers' per-object try/except
    turns that into null decode fields."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return {
            "width": im.width,
            "height": im.height,
            "n_frames": int(getattr(im, "n_frames", 1)),
        }


def pil_resize(payload: bytes, w: int, h: int) -> bytes:
    """Real-codec resize via Pillow, re-encoded in the source format
    (PNG when the source format is unknown)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        fmt = im.format or "PNG"
        out = io.BytesIO()
        im.resize((w, h)).save(out, format=fmt)
        return out.getvalue()


def default_decode_fn() -> Callable[[bytes], dict]:
    """The decode kernel the operators use when the caller passes none:
    the real Pillow codec when importable, else the deterministic stub.
    NOTE for differential-checked pipelines: the CATALOG entries pin
    ``decode_fn=_fake_decode`` explicitly — their DuckDB oracles replay
    the hash-chained stub, which must not silently change value when a
    codec library appears in the environment."""
    return pil_decode if codec_available() else _fake_decode


def default_resize_fn() -> Callable[[bytes, int, int], bytes]:
    """Resize kernel default — real Pillow resize when importable, else
    the hash-chained stub (see ``default_decode_fn``)."""
    if codec_available():
        return pil_resize

    def fake_resize(payload: bytes, w: int, h: int) -> bytes:
        return hashlib.sha256(payload + f"{w}x{h}".encode()).digest()

    return fake_resize


def decode_media_metadata(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Decode payloads → typed metadata via mapInPandas (Arrow batches).

    Output schema is fixed (``MEDIA_META_SCHEMA``); corrupt/null payloads
    yield a row with null decode fields rather than failing the batch —
    at 100 TB a single bad object must not kill the job.

    ``decode_fn=None`` selects by capability: the real Pillow codec when
    importable, else the deterministic stub (``default_decode_fn``).
    """
    fn = decode_fn or default_decode_fn()

    def decode_one(payload) -> tuple:
        # (n_bytes, width, height, n_frames, sha256) for one object; the
        # codec stays per-object (opaque bytes), but only this call is
        # per-row — column assembly below is vectorized.
        if payload is None:
            return (None, None, None, None, None)
        b = bytes(payload)
        # n_bytes and sha256 are DECODER-INDEPENDENT (documented
        # contract) — computed outside the try so a decode failure
        # (routine when the real codec meets non-image bytes) nulls
        # only the decode fields, never the content hash
        sha = hashlib.sha256(b).hexdigest()
        try:
            meta = fn(b)
            return (
                len(b),
                meta.get("width"),
                meta.get("height"),
                meta.get("n_frames"),
                sha,
            )
        except ImportError:
            # environment mismatch, NOT data corruption: codec_available()
            # probed the DRIVER, but this import ran on an EXECUTOR. A
            # driver-only Pillow install would otherwise null every row's
            # decode fields — indistinguishable from 100% corrupt payloads
            # (r08 ADVICE find). Fail the task loudly instead.
            raise
        except Exception:
            return (len(b), None, None, None, sha)  # corrupt -> null decode fields

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [decode_one(p) for p in pdf["payload"].to_list()]
            cols = list(zip(*decoded)) if decoded else [(), (), (), (), ()]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": pd.array(cols[0], dtype="Int32"),
                    "width": pd.array(cols[1], dtype="Int32"),
                    "height": pd.array(cols[2], dtype="Int32"),
                    "n_frames": pd.array(cols[3], dtype="Int32"),
                    "sha256": cols[4],
                },
                columns=[f.name for f in MEDIA_META_SCHEMA.fields],
            )

    # Explicit projection before the Python boundary (guide §4.1): Spark
    # cannot see which columns an opaque mapInPandas touches, so without
    # this every caller-side column crosses Arrow AND scan-side column
    # pruning is defeated. The function reads exactly these three.
    return media.select("media_id", "media_type", "payload").mapInPandas(
        decode_batches, MEDIA_META_SCHEMA
    )


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize contract: binary→binary transform with declared output dims
    (``media_id, payload, width, height``). The stub derives a
    deterministic pseudo-payload (hash-chained to the requested size);
    pass ``resize_fn(payload, w, h) -> bytes`` to plug PIL/ffmpeg.
    Corrupt/null payloads pass through as null payload rows."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    fn = resize_fn or default_resize_fn()

    def resize_one(payload):
        if payload is None:
            return None
        try:
            return fn(bytes(payload), width, height)
        except ImportError:
            raise  # executor-side codec missing: env mismatch, not corruption
        except Exception:
            return None

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        # zip-over-columns, not iterrows: only the codec call is
        # per-object; column assembly is vectorized (same pattern as
        # decode_media_metadata).
        for pdf in batches:
            payloads = pdf["payload"].to_list()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "payload": [resize_one(p) for p in payloads],
                    "width": width,
                    "height": height,
                },
                columns=["media_id", "payload", "width", "height"],
            )

    # column-pruned Arrow feed (see decode_media_metadata)
    return media.select("media_id", "payload").mapInPandas(gen, schema)


def extract_features(
    media: DataFrame,
    dim: int = 64,
    embed_fn: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """Feature extraction contract: payload → dense float embedding
    (``media_id, embedding array<float>``) — the bridge from media columns
    into the similarity operators (``operators/similarity.py``). The stub
    derives a deterministic pseudo-embedding from the payload hash; pass
    ``embed_fn(payload) -> list[float]`` to plug a real model runtime.
    Output vectors are L2-normalized so cosine = dot downstream."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )

    def fake_embed(payload: bytes) -> list:
        # hash-chained pseudo-floats in [-1, 1]: deterministic, spread.
        # The chain feeds HEX digests back in (not raw bytes) so any
        # engine exposing sha256(varchar) — DuckDB, Trino — reproduces
        # the exact vectors for differential checks.
        raw = b""
        seed = hashlib.sha256(payload).hexdigest()
        while len(raw) < dim:
            seed = hashlib.sha256(seed.encode("ascii")).hexdigest()
            raw += bytes.fromhex(seed)
        return [raw[i] / 127.5 - 1.0 for i in range(dim)]

    fn = embed_fn or fake_embed

    def embed_one(payload):
        import math

        if payload is None:
            return None
        try:
            v = [float(x) for x in fn(bytes(payload))]
            norm = math.sqrt(sum(x * x for x in v)) or 1.0
            return [x / norm for x in v]
        except ImportError:
            raise  # executor-side codec missing: env mismatch, not corruption
        except Exception:
            return None

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        # zip-over-columns, not iterrows (see decode_media_metadata).
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "embedding": [embed_one(p) for p in pdf["payload"].to_list()],
                },
                columns=["media_id", "embedding"],
            )

    # column-pruned Arrow feed (see decode_media_metadata)
    return media.select("media_id", "payload").mapInPandas(gen, schema)


def sample_frames(
    media: DataFrame,
    every_nth: int = 10,
    decode_fn: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Frame sampling contract: one output row per sampled frame index.
    Uses the (stubbed) decoder's n_frames; real impl would emit frame
    payloads — here the plumbing (1→N row explosion via mapInPandas
    generator, stable schema) is the tested surface."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
        ]
    )
    fn = decode_fn or default_decode_fn()

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        # zip-over-columns, not iterrows (see decode_media_metadata);
        # the 1→N explosion appends to two flat column lists.
        for pdf in batches:
            ids: list = []
            idxs: list = []
            for mid, payload in zip(
                pdf["media_id"].to_list(), pdf["payload"].to_list()
            ):
                # a NULL media_id is unattributable output — the schema
                # declares media_id non-null, and emitting frames nobody
                # can join back is useless; skip alongside null payloads
                # (pd.isna, not `is None`: Arrow hands a nullable int64
                # column to pandas as float64 with NaN)
                if payload is None or pd.isna(mid):
                    continue
                n = fn(bytes(payload))["n_frames"]
                sampled = range(0, n, every_nth)
                ids.extend([mid] * len(sampled))
                idxs.extend(sampled)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                },
                columns=["media_id", "frame_idx"],
            )

    # column-pruned Arrow feed (see decode_media_metadata)
    return media.select("media_id", "payload").mapInPandas(gen, schema)
