"""Multimodal column operators (BASELINE.json north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct — the layout a 100 TB multimodal training pipeline uses
(media bytes travel with the row; metadata is queryable without decoding).

The Spark-side plumbing here is real and tested: schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partition sizing. Codecs (r14):

* REAL with no optional dependency — stdlib+numpy PNG/BMP decode +
  DCT pHash (``numpy_image_decoder`` via ``functions/imaging.py``; the
  ``image_features`` default auto-dispatches on magic bytes), stdlib
  ``wave`` PCM decode (``wave_audio_decoder``), area-resample resize
  (``numpy_resize_decoder``).
* REAL behind an optional import — Pillow (``pil_image_decoder`` /
  ``pil_resize_decoder``) for JPEG & other compressed formats.
* STUB fallback — ``deterministic_fake_decoder`` derives stable
  pseudo-features from md5(bytes) for payloads no built-in codec
  recognizes (and for the DuckDB oracle, whose fixtures are md5-derived
  bytes by construction); pass a real ffmpeg/torchaudio ``decoder=``
  in production for those.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("format", T.StringType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("phash64", T.LongType()),
])

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("frame", T.BinaryType()),
])


def deterministic_fake_decoder(data: bytes, meta: dict) -> dict:
    """STUB decode: derives stable pseudo-features from md5(bytes).
    Replace with a real codec in production (see module doc)."""
    h = hashlib.md5(data or b"").digest()
    # explicit None checks, not `or`: a legitimate 0 in metadata must
    # win over the hash-derived pseudo-value
    w_meta, h_meta = meta.get("width"), meta.get("height")
    return {
        "width": int(w_meta if w_meta is not None else (h[0] % 64) + 1),
        "height": int(h_meta if h_meta is not None else (h[1] % 64) + 1),
        "mean_luma": h[2] / 255.0,
        "phash64": int.from_bytes(h[:8], "big", signed=True),
    }


def numpy_image_decoder(data: bytes, meta: dict) -> dict:
    """REAL image decoder with nothing beyond the stdlib + numpy:
    8-bit non-interlaced PNG, 24-bit BMP (``functions/imaging.py``)
    and baseline-sequential JFIF (``functions/jpeg.py``, r15), ITU-R
    601 grayscale, and the classic DCT pHash (32x32 area resample →
    2-D DCT → 8x8 low band → median threshold). Progressive JPEG and
    the long-tail formats still need ``pil_image_decoder``."""
    from ncbi_analysis_spark.functions import imaging as im

    arr = im.decode_image(bytes(data))
    h, w = arr.shape[:2]
    return {
        "width": int(w),
        "height": int(h),
        "mean_luma": float(im.to_gray(arr).mean() / 255.0),
        "phash64": im.phash64(arr),
    }


def auto_image_decoder(data: bytes, meta: dict) -> dict:
    """The ``image_features`` DEFAULT since round 14: payloads whose
    headers name a format the stdlib+numpy codecs handle (PNG/BMP, and
    baseline JPEG since r15) get the REAL pixel path
    (``numpy_image_decoder``); everything else falls back to the md5
    stub — which keeps the DuckDB oracle replayable (its fixture
    payloads are md5-derived bytes, never a real image) and keeps the
    unsupported long tail honest about needing the Pillow drop-in
    rather than silently pseudo-hashing it."""
    from ncbi_analysis_spark.functions import imaging as im

    if data is not None and im.is_decodable_image(data):
        try:
            return numpy_image_decoder(data, meta)
        except Exception:  # noqa: BLE001 — crash-safety contract
            # magic-sniffed but malformed (truncated IDAT, bad zlib,
            # header/stream mismatch, JPEG marker soup): degrade to the
            # stub rather than failing the whole mapInPandas batch on
            # one corrupt row. Broad by design — adversarial bytes past
            # the sniff can surface IndexError/struct.error/zlib.error
            # from deep inside the codecs (fuzz test in
            # test_robustness.py), and the contract is "one poisoned
            # row never kills the batch".
            pass
    return deterministic_fake_decoder(data, meta)


def numpy_resize_decoder(data: bytes, meta: dict,
                         width: int, height: int) -> bytes:
    """REAL resize for the stdlib-codec formats: decode (PNG/BMP/
    baseline JPEG), per-channel area-average resample, re-encode PNG.
    The Pillow drop-in (``pil_resize_decoder``) covers the rest."""
    import numpy as np

    from ncbi_analysis_spark.functions import imaging as im

    arr = im.decode_image(bytes(data))
    if arr.ndim == 2:
        out = im._resize_area(arr.astype(np.float64), height, width)
        resized = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    else:
        chans = [
            np.clip(np.rint(im._resize_area(
                arr[:, :, c].astype(np.float64), height, width)),
                0, 255).astype(np.uint8)
            for c in range(arr.shape[2])
        ]
        resized = np.stack(chans, axis=2)
    return im.png_encode(resized)


def deterministic_fake_audio_decoder(data: bytes, meta: dict) -> dict:
    """STUB audio decode: stable pseudo-features from md5(bytes), same
    contract as ``wave_audio_decoder``. Metadata sample_rate/duration win
    when present; otherwise both derive from the hash so the DuckDB
    oracle can replay the exact arithmetic."""
    h = hashlib.md5(data or b"").digest()
    # explicit None checks, not `or`: duration_ms=0 (empty clip) is a
    # legitimate metadata value and must not be replaced by a fabricated
    # 1..600000 ms duration
    r_meta, d_meta = meta.get("sample_rate"), meta.get("duration_ms")
    rate = int(r_meta if r_meta is not None else (8000, 16000, 44100)[h[0] % 3])
    duration_ms = int(d_meta if d_meta is not None
                      else int.from_bytes(h[1:4], "big") % 600_000 + 1)
    return {
        "sample_rate": rate,
        "duration_ms": duration_ms,
        "n_samples": rate * duration_ms // 1000,
        "rms": h[8] / 255.0,
        "peak": h[10] / 255.0,
    }


def wave_audio_decoder(data: bytes, meta: dict) -> dict:
    """REAL audio decoder implementing the ``audio_features`` decoder
    contract for RIFF/WAV payloads via the stdlib ``wave`` module + numpy
    (no third-party codec needed, so this path runs everywhere): actual
    header parse, PCM sample decode, RMS and peak amplitude normalized
    to [0, 1]. ``n_samples`` is the exact FRAME count for any channel
    count; ``duration_ms`` is the truncated ``frames * 1000 // rate``,
    so ``n_samples >= sample_rate * duration_ms / 1000`` with equality
    only when the frame count is a whole number of milliseconds (the
    stub's equality is exact because it derives n_samples FROM the
    duration); rms/peak are computed over all channels.
    Compressed formats (mp3/flac) need an ffmpeg/torchaudio decoder with
    the same (bytes, meta) -> dict contract."""
    import io
    import wave

    import numpy as np

    if not data:
        raise ValueError(
            "wave_audio_decoder got an empty/NULL audio payload; filter "
            "null media rows upstream (the md5 stub tolerates them, a "
            "real codec cannot)"
        )
    with wave.open(io.BytesIO(data)) as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, midpoint 128
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return {
        "sample_rate": int(rate),
        "duration_ms": int(n * 1000 // rate) if rate else 0,
        "n_samples": int(n),
        "rms": float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
        "peak": float(np.max(np.abs(samples))) if len(samples) else 0.0,
    }


def is_wav_audio(data) -> bool:
    """RIFF/WAVE container sniff (magic at 0 and 8) — the audio
    dispatch predicate, same role as ``imaging.is_decodable_image``
    for images. A random binary payload passes once per ~2^64."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return False
    b = bytes(data[:12])
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def auto_audio_decoder(data: bytes, meta: dict) -> dict:
    """The ``audio_features`` DEFAULT since round 15 (the audio twin of
    ``auto_image_decoder``): RIFF/WAVE payloads take the REAL PCM path
    (``wave_audio_decoder``); everything else falls back to the md5
    stub — existing oracle fixtures (md5-derived bytes, never a RIFF
    container) are unchanged by construction, and compressed formats
    stay honest about needing an ffmpeg-class drop-in."""
    if data and is_wav_audio(data):
        try:
            return wave_audio_decoder(data, meta)
        except Exception:  # noqa: BLE001 — crash-safety contract
            # magic-sniffed but malformed: degrade to the stub rather
            # than failing the whole mapInPandas batch on one row. The
            # catch is deliberately broad — stdlib ``wave`` raises
            # wave.Error, EOFError AND RuntimeError depending on where
            # a corrupted container breaks (found by the fuzz test in
            # test_robustness.py), and the contract here is
            # "one poisoned row never kills the batch", not "known
            # failure modes degrade".
            pass
    return deterministic_fake_audio_decoder(data, meta)


def _decode_features_map(
    media: DataFrame,
    kind: str,
    schema: T.StructType,
    decoder: Callable[[bytes, dict], dict],
    batch_decoder: Callable[[list, list], list] | None,
) -> DataFrame:
    """Shared decode->features mapInPandas body for image/audio (one
    Arrow pass; per-row ``decoder`` or whole-batch ``batch_decoder``
    taking (list[bytes], list[meta dict]) -> list[feature dict])."""
    field_names = [f.name for f in schema.fields]
    feat_fields = [n for n in field_names if n != "media_id"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                dict(m) if m is not None else {} for m in pdf["meta"]
            ] if len(pdf) else []
            if batch_decoder is not None:
                feats_list = batch_decoder(list(pdf["data"]), metas)
                if len(feats_list) != len(pdf):
                    # zip would silently truncate/misalign rows otherwise
                    raise ValueError(
                        f"batch_decoder returned {len(feats_list)} feature "
                        f"dicts for {len(pdf)} rows; the contract is "
                        "list-in/list-out with 1:1 positional alignment"
                    )
            else:
                feats_list = [decoder(d, m) for d, m in zip(pdf["data"], metas)]
            out = [
                {"media_id": mid, **{k: feats[k] for k in feat_fields}}
                for mid, feats in zip(pdf["media_id"], feats_list)
            ]
            yield pd.DataFrame(out, columns=field_names)

    rows = media.filter(F.col("kind") == kind).select("media_id", "data", "meta")
    return rows.mapInPandas(gen, schema)


def audio_features(
    media: DataFrame,
    decoder: Callable[[bytes, dict], dict] = auto_audio_decoder,
    batch_decoder: Callable[[list, list], list] | None = None,
) -> DataFrame:
    """Decode + feature-extract audio rows via mapInPandas — the audio
    twin of ``image_features`` (same batch shape, same per-row vs
    whole-batch decoder contracts, same scale notes). The default is
    ``auto_audio_decoder`` since r15: REAL PCM decode for RIFF/WAVE
    payloads, md5 stub otherwise — oracle fixtures (md5-derived bytes)
    keep hitting the stub by construction, exactly like the r14 image
    default flip."""
    return _decode_features_map(
        media, "audio", AUDIO_FEATURES_SCHEMA, decoder, batch_decoder)


def pil_available() -> bool:
    """True when Pillow is importable (this container ships without it;
    production clusters install it)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def pil_image_decoder(data: bytes, meta: dict) -> dict:
    """REAL image decoder implementing the ``image_features`` decoder
    contract via Pillow: actual decode, grayscale mean luma, and a
    64-bit average-hash (8x8 grayscale thresholded by its mean — the
    classic aHash). Optional import: raises ImportError where Pillow is
    absent; tests are skip-marked there, keeping the md5 stub the
    default everywhere."""
    import io

    import numpy as np
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        width, height = im.size
        g = im.convert("L")
        gray = np.asarray(g, dtype=np.float64)
        small = np.asarray(g.resize((8, 8)), dtype=np.float64)
    bits = (small >= small.mean()).flatten()
    phash = 0
    for b in bits:
        phash = (phash << 1) | int(b)
    # two's-complement into a signed 64-bit slot
    if phash >= 1 << 63:
        phash -= 1 << 64
    return {
        "width": int(width),
        "height": int(height),
        "mean_luma": float(gray.mean() / 255.0),
        "phash64": phash,
    }


def pil_resize_decoder(data: bytes, meta: dict, width: int, height: int) -> bytes:
    """REAL resize implementing the ``resize_images`` decoder contract
    via Pillow: decode, resize, re-encode PNG. Optional import — see
    pil_image_decoder."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        out = io.BytesIO()
        im.resize((width, height)).save(out, format="PNG")
        return out.getvalue()


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes, dict], dict] = auto_image_decoder,
    batch_rows: int = 256,
    batch_decoder: Callable[[list], list] | None = None,
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas.

    Default decode is ``auto_image_decoder``: REAL pixels for the
    stdlib-codec formats (PNG/BMP), md5 stub otherwise (r14 — the stub
    was the default for everything before).

    Scale notes: media rows are large (bytes travel with the row) — keep
    ``spark.sql.files.maxPartitionBytes`` low enough that a partition of
    images fits in executor memory, and repartition upstream by size, not
    row count. Arrow moves each batch once; the decoder runs per row
    inside the batch — or pass ``batch_decoder`` taking
    (list[bytes], list[dict]) -> list[feature dict] for codecs that
    vectorize across a batch (GPU decode, batched JPEG turbo), which
    skips the per-row Python loop entirely.
    """
    return _decode_features_map(
        media, "image", IMAGE_FEATURES_SCHEMA, decoder, batch_decoder)


def resize_images(media: DataFrame, width: int, height: int,
                  decoder: Callable | None = None,
                  batch_decoder: Callable | None = None) -> DataFrame:
    """Resize plumbing. Requires a real codec — raises by default
    (pass ``decoder=pil_resize_decoder`` where Pillow is installed, or
    ``batch_decoder`` taking (list[bytes], list[dict], width, height) ->
    list[bytes] for codecs that vectorize across the Arrow batch).

    The Spark shape is identical to image_features: mapInPandas emitting
    (media_id, data) with resized bytes.
    """
    if decoder is None and batch_decoder is None:
        raise NotImplementedError(
            "resize_images needs a real image codec (PIL/opencv); this "
            "container has none. Pass decoder=... implementing "
            "(bytes, meta, width, height) -> bytes (e.g. "
            "pil_resize_decoder), or batch_decoder=... for the "
            "whole-batch form."
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_decoder is not None:
                data = batch_decoder(list(pdf["data"]), list(pdf["meta"]),
                                     width, height)
                data = list(data)
                if len(data) != len(pdf):
                    # same 1:1 contract check as _decode_features_map —
                    # fail with the contract named, not an opaque
                    # DataFrame-construction error (and never let a
                    # mis-indexed Series realign rows silently)
                    raise ValueError(
                        f"batch_decoder returned {len(data)} payloads "
                        f"for {len(pdf)} rows; the contract is "
                        "list-in/list-out with 1:1 positional alignment"
                    )
            else:
                data = [decoder(d, m, width, height)
                        for d, m in zip(pdf["data"], pdf["meta"])]
            yield pd.DataFrame({"media_id": pdf["media_id"], "data": data})

    schema = T.StructType([
        T.StructField("media_id", T.LongType()), T.StructField("data", T.BinaryType()),
    ])
    return media.filter(F.col("kind") == "image").select("media_id", "data", "meta") \
        .mapInPandas(gen, schema)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  extractor: Callable | None = None) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Without a real ``extractor`` codec, emits deterministic frame stubs
    (frame index + timestamp from metadata duration; frame bytes =
    md5-derived placeholder) so downstream plumbing (explode shape,
    per-frame joins) is fully exercisable.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = dict(row.meta) if row.meta is not None else {}
                duration = int(meta.get("duration_ms") or 0)
                n_frames = max(duration // every_ms, 1)
                for i in range(n_frames):
                    ts = i * every_ms
                    if extractor is not None:
                        frame = extractor(row.data, meta, ts)
                    else:
                        frame = hashlib.md5((row.data or b"") + str(ts).encode()).digest()
                    rows.append({
                        "media_id": row.media_id, "frame_idx": i,
                        "ts_ms": ts, "frame": frame,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    vids = media.filter(F.col("kind") == "video").select("media_id", "data", "meta")
    return vids.mapInPandas(gen, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — no decode, pure codegen: bytes, counts,
    dimensions per kind. The point of the typed-meta layout: cheap
    queries never touch the binary column (column pruning drops it at
    the parquet scan)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("data")).alias("total_bytes"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )


# --- Perceptual near-duplicate pairing over 64-bit image hashes ---------
#
# The one LLM-pipeline dedup modality text exact/fuzzy/semantic didn't
# cover: images whose aHash/pHash differ in at most ``max_hamming`` bits
# are near-duplicates (crops/re-encodes/small edits). The pairing is the
# Hamming-space twin of MinHash-LSH banding (operators/dedup.py): split
# the 64-bit hash into ``max_hamming + 1`` bands — by pigeonhole, any
# pair within the radius agrees EXACTLY on at least one band — bucket-
# join on (band, band value), then verify candidates with one
# bit_count(xor) <= r. Recall is exactly 1.0 (pigeonhole, not
# probabilistic) and the join is bucketed, never all-pairs.


def _hash_bands(df: DataFrame, hash_col: str, id_col: str,
                n_bands: int) -> DataFrame:
    """Explode each 64-bit hash into ``(id, band, band_val)`` rows.
    Band widths split 64 as evenly as possible (wider bands first).
    Extraction is ``(h >> shift) & mask`` — mask bits never overlap the
    arithmetic-shift sign fill, so Spark and any SQL oracle agree on
    negative hashes (probed: DuckDB/Spark parity on BIGINT >> and &)."""
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    shift = 64
    bands = []
    for i, w in enumerate(widths):
        shift -= w
        bands.append(F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col(hash_col), shift)
            .bitwiseAND(F.lit((1 << w) - 1)).alias("band_val"),
        ))
    return df.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h"),
        F.explode(F.array(*bands)).alias("b"),
    ).select("id", "h", "b.band", "b.band_val")


def phash_near_dup(
    features: DataFrame,
    hash_col: str = "phash64",
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_band_freq: int | None = 10_000,
) -> DataFrame:
    """Distinct image pairs ``(id_a, id_b, hamming)`` with
    ``hamming(hash_a, hash_b) <= max_hamming``, ``id_a < id_b``.

    Feed it ``image_features`` output (md5-stub ``phash64`` in this
    container, PIL aHash / any perceptual hash in production — the
    decoder plug-in contract); chain ``components.connected_components``
    + a keep-rule for full image dedup, exactly like the text family.

    Scale shape: one explode (x ``max_hamming+1``), one shuffle keyed by
    (band, band_val), candidate verification is a single codegen
    ``bit_count(xor)`` per bucket pair — the corpus is never compared
    all-pairs. ``max_band_freq`` observably drops degenerate buckets
    (``phash_band_cap`` markers — e.g. all-black images hashing equal),
    the ``max_band_freq``/``max_cluster_rows`` knob family."""
    from ncbi_analysis_spark.operators.dedup import _capped

    rows = _hash_bands(features, hash_col, id_col, max_hamming + 1)
    if max_band_freq is not None:
        sizes = rows.groupBy("band", "band_val").agg(
            F.count(F.lit(1)).alias("__n"))
        ok = _capped(sizes, F.col("__n"), max_band_freq, "phash_band")
        rows = rows.join(ok.select("band", "band_val"), ["band", "band_val"])
    left = rows.select("band", "band_val",
                       F.col("id").alias("id_a"), F.col("h").alias("h_a"))
    right = rows.select("band", "band_val",
                        F.col("id").alias("id_b"), F.col("h").alias("h_b"))
    pairs = (
        left.join(right, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")


# --- Audio perceptual fingerprints (feed phash_near_dup) ----------------

AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("fp64", T.LongType()),
])


def deterministic_fake_fingerprint_decoder(data: bytes, meta: dict) -> dict:
    """STUB fingerprint: md5(bytes) top 8 bytes as a signed 64-bit int —
    the same derivation the image stub uses for ``phash64``, so the
    DuckDB oracle replay is shared."""
    h = hashlib.md5(data or b"").digest()
    return {"fp64": int.from_bytes(h[:8], "big", signed=True)}


def wave_fingerprint_decoder(data: bytes, meta: dict,
                             segments: int = 8, bands: int = 8) -> dict:
    """REAL perceptual audio fingerprint for RIFF/WAV payloads —
    stdlib ``wave`` + numpy only, the chromaprint IDEA at toy scale:
    split the clip into ``segments`` equal time slices, rFFT each,
    sum magnitude energy into ``bands`` equal frequency bands, and
    threshold the ``segments x bands`` energy grid by its median into
    a 64-bit hash (MSB = first segment, lowest band).

    Robust by construction to uniform gain (energies and their median
    scale together) and to small additive noise (few grid cells cross
    the median -> small Hamming distance); distinct spectral content
    moves many cells -> far hash. Interleaved multi-channel frames are
    fingerprinted as one stream (the ``wave_audio_decoder`` posture).
    Compressed formats need an ffmpeg/torchaudio decoder with the same
    contract."""
    import io
    import wave as _wave

    import numpy as np

    if segments * bands != 64:
        raise ValueError("segments * bands must be 64 (one bit per cell)")
    if not data:
        raise ValueError(
            "wave_fingerprint_decoder got an empty/NULL audio payload; "
            "filter null media rows upstream"
        )
    with _wave.open(io.BytesIO(data)) as w:
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if len(samples) < segments * 2:
        # too short for spectral slicing: degenerate all-zero-bits hash
        return {"fp64": 0}
    seg_len = len(samples) // segments
    grid = np.empty((segments, bands), dtype=np.float64)
    for s in range(segments):
        spec = np.abs(np.fft.rfft(samples[s * seg_len:(s + 1) * seg_len]))
        # drop DC so silence offsets don't dominate band 0
        spec = spec[1:] if len(spec) > 1 else spec
        band_len = max(1, len(spec) // bands)
        for b in range(bands):
            grid[s, b] = spec[b * band_len:(b + 1) * band_len].sum()
    bits = (grid >= np.median(grid)).flatten()
    fp = 0
    for bit in bits:
        fp = (fp << 1) | int(bit)
    if fp >= 1 << 63:
        fp -= 1 << 64
    return {"fp64": fp}


def audio_fingerprint(
    media: DataFrame,
    decoder: Callable[[bytes, dict], dict] = deterministic_fake_fingerprint_decoder,
    batch_decoder: Callable[[list, list], list] | None = None,
) -> DataFrame:
    """Per-clip 64-bit perceptual fingerprints ``(media_id, fp64)`` —
    one Arrow decode pass (the ``audio_features`` plumbing). Chain into
    ``phash_near_dup(fp, hash_col='fp64')``: the Hamming-band pairing
    is hash-agnostic, so audio near-dup rides the image operator
    unchanged — every modality (text exact/fuzzy/semantic, image,
    audio) now has a bucketed near-dup path."""
    return _decode_features_map(
        media, "audio", AUDIO_FP_SCHEMA, decoder, batch_decoder)


# --- Video near-duplicate pairing over sampled-frame hashes -------------


def default_frame_hasher(frame: bytes) -> int:
    """64-bit hash of one frame: md5 over the frame bytes' HEX encoding
    (hex so a SQL oracle can replay it — DuckDB's md5 is VARCHAR-only;
    for the stub frames the hex IS md5(data+ts), so the whole chain is
    md5(md5(...)) relationally). Swap for a per-frame perceptual hash
    (decode + aHash) in production via ``frame_hasher=``."""
    h = hashlib.md5(frame.hex().encode()).digest()
    return int.from_bytes(h[:8], "big", signed=True)


def video_near_dup(
    media: DataFrame,
    max_hamming: int = 3,
    min_shared_frames: int = 2,
    every_ms: int = 1000,
    frame_hasher: Callable[[bytes], int] = default_frame_hasher,
    max_band_freq: int | None = 10_000,
) -> DataFrame:
    """Clip-level near-duplicate pairs ``(id_a, id_b, n_shared)``: two
    videos pair when at least ``min_shared_frames`` DISTINCT sampled
    frames of the lower-id clip have an in-Hamming-radius match among
    the other clip's frames — re-encodes/trims share frames, unrelated
    clips share none. Completes the modality matrix: text
    exact/fuzzy/semantic, image, audio, video all have bucketed
    near-dup paths.

    Scale shape: frame sampling is map-only; frame hashes ride the SAME
    pigeonhole Hamming-band bucketing as ``phash_near_dup`` (one
    (band, band_val)-keyed shuffle, never all-pairs across frames); the
    clip-pair rollup keys on the candidate pairs only. The hot-band cap
    is the standing observable knob."""
    frames = sample_frames(media, every_ms)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "frame_idx"]].copy()
            out["fh64"] = [frame_hasher(bytes(b)) for b in pdf["frame"]]
            yield out

    hashes = frames.mapInPandas(gen, "media_id long, frame_idx int, fh64 long")
    packed = hashes.select(
        F.struct("media_id", "frame_idx").alias("mf"), "fh64")
    rows = _hash_bands(packed, "fh64", "mf", max_hamming + 1)
    if max_band_freq is not None:
        from ncbi_analysis_spark.operators.dedup import _capped

        sizes = rows.groupBy("band", "band_val").agg(
            F.count(F.lit(1)).alias("__n"))
        ok = _capped(sizes, F.col("__n"), max_band_freq, "vframe_band")
        rows = rows.join(ok.select("band", "band_val"), ["band", "band_val"])
    left = rows.select("band", "band_val",
                       F.col("id").alias("ma"), F.col("h").alias("ha"))
    right = rows.select("band", "band_val",
                        F.col("id").alias("mb"), F.col("h").alias("hb"))
    matched = (
        left.join(right, ["band", "band_val"])
        .filter(F.col("ma.media_id") < F.col("mb.media_id"))
        .select("ma", "mb", "ha", "hb")
        .distinct()
        .filter(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming)
    )
    return (
        matched.groupBy(
            F.col("ma.media_id").alias("id_a"),
            F.col("mb.media_id").alias("id_b"))
        .agg(F.countDistinct(F.col("ma.frame_idx")).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared_frames)
    )
