"""WebDataset-style tar shards: the interchange layout multimodal
training loaders (webdataset/torchdata-style samplers) stream from.

A shard is a plain tar whose members group by key: ``{key}.{ext}``
holds the payload bytes, ``{key}.json`` the sample metadata. Trainers
sequential-read whole shards, so the write side's job is (a) bounded,
deterministic shard membership and (b) byte-reproducible tars — the
same input table always produces the same shard bytes, which is what
makes the artifact diffable/cachable across pipeline re-runs.

Determinism contract: member order inside a tar is sorted by member
name; every tar header carries mtime=0, uid=gid=0, no user/group names
(the committed-golden posture of the other sinks in this package —
see ``sources/sinks.py``). Shard membership is ``media_id //
samples_per_shard`` — a pure function of the row, independent of
partitioning (sparse ids produce sparse shard numbers rather than
nondeterministic packing; rank-based dense packing would make every
shard's content depend on a global sort of the whole corpus, which is
exactly the cross-shard coupling a 100 TB re-run cannot afford).

Scale: one shuffle, keyed by shard id (``applyInPandas``); each task
streams its shard to a temp file and renames — shards never
accumulate in executor memory beyond one group's payloads (size
shards accordingly: the standard 1-10k samples / ~100 MB-1 GB). The
read side is ``binaryFile`` over the tars + an Arrow-batched untar,
partition-parallel per shard.

Reference parity: none (the reference repo has no binary interchange);
LLM-pipeline extension surface, SURVEY §6.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MANIFEST = "_wds_manifest.json"

_KIND_EXT = {"image": "img", "audio": "aud", "video": "vid"}


def _sample_ext(kind: str, fmt) -> str:
    if fmt:
        return str(fmt)
    return _KIND_EXT.get(kind or "", "bin")


def _shard_tar_bytes(pdf: pd.DataFrame) -> bytes:
    """One deterministic tar from a shard's rows (sorted members,
    zeroed headers)."""
    members: list[tuple[str, bytes]] = []
    for r in pdf.itertuples(index=False):
        key = f"{int(r.media_id):012d}"
        meta = {} if r.meta is None else dict(r.meta)
        fmt = meta.get("format")
        ext = _sample_ext(r.kind, fmt)
        doc = {"media_id": int(r.media_id), "kind": r.kind,
               "meta": {k: (None if pd.isna(v) else int(v))
                        if k != "format" else v
                        for k, v in meta.items()}}
        members.append((f"{key}.json",
                        json.dumps(doc, sort_keys=True).encode()))
        payload = b"" if r.data is None else bytes(r.data)
        members.append((f"{key}.{ext}", payload))
    members.sort(key=lambda m: m[0])

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(data)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ""
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def write_webdataset_shards(
    media: DataFrame,
    path: str,
    samples_per_shard: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Write a media table (``multimodal.MEDIA_SCHEMA`` shape) as
    WebDataset tar shards under ``path``: ``shard-{n:06d}.tar`` per
    ``id // samples_per_shard`` bucket plus a ``_wds_manifest.json``
    naming every shard with its sample count and md5 (the re-run diff
    / fsck handle). Returns the manifest as a DataFrame
    ``(shard_id, n_samples, n_bytes, md5)``.

    Byte-reproducible by contract (see module doc): re-running over
    the same table rewrites every shard byte-identically — pinned by
    ``tests/test_webdataset.py``."""
    spark = media.sparkSession
    os.makedirs(path, exist_ok=True)

    with_shard = media.withColumn(
        "__shard", (F.col(id_col) / F.lit(samples_per_shard))
        .cast("long"))

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        pdf = pdf.sort_values("media_id")
        blob = _shard_tar_bytes(pdf)
        name = f"shard-{shard_id:06d}.tar"
        tmp = os.path.join(path, f".{name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(path, name))
        return pd.DataFrame([{
            "shard_id": shard_id,
            "n_samples": len(pdf),
            "n_bytes": len(blob),
            "md5": hashlib.md5(blob).hexdigest(),
        }])

    manifest = (
        with_shard.groupBy("__shard")
        .applyInPandas(
            write_shard,
            "shard_id long, n_samples long, n_bytes long, md5 string")
        .orderBy("shard_id")
    )
    rows = [r.asDict() for r in manifest.collect()]  # bounded: one/shard
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({"samples_per_shard": samples_per_shard,
                   "shards": rows}, f, sort_keys=True, indent=1)
    return spark.createDataFrame(
        rows, "shard_id long, n_samples long, n_bytes long, md5 string")


def read_webdataset_shards(spark, path: str) -> DataFrame:
    """Read WebDataset shards back to the media-table shape
    ``(media_id, kind, data, meta)`` — partition-parallel per shard
    (``binaryFile`` keeps one tar per input split). Samples missing
    either member half raise: a torn shard must fail loudly, not yield
    half-rows."""
    from ncbi_analysis_spark.operators.multimodal import MEDIA_SCHEMA

    tars = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar"))

    def untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for ti in tf.getmembers():
                        key, ext = ti.name.rsplit(".", 1)
                        d = samples.setdefault(key, {})
                        data = tf.extractfile(ti).read()
                        if ext == "json":
                            d["doc"] = json.loads(data)
                        else:
                            d["payload"] = data
                for key in sorted(samples):
                    d = samples[key]
                    if "doc" not in d or "payload" not in d:
                        raise ValueError(
                            f"webdataset sample {key!r} is missing its "
                            f"{'json' if 'doc' not in d else 'payload'} "
                            "member — torn shard")
                    doc = d["doc"]
                    meta = doc.get("meta") or {}
                    out.append({
                        "media_id": doc["media_id"],
                        "kind": doc.get("kind"),
                        "data": d["payload"],
                        "meta": {
                            "width": meta.get("width"),
                            "height": meta.get("height"),
                            "channels": meta.get("channels"),
                            "sample_rate": meta.get("sample_rate"),
                            "duration_ms": meta.get("duration_ms"),
                            "format": meta.get("format"),
                        },
                    })
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "data", "meta"])

    return tars.mapInPandas(untar, MEDIA_SCHEMA)


def verify_webdataset_shards(spark, path: str) -> list[dict]:
    """fsck for a shard directory: manifest present and every named
    shard exists with matching bytes/md5; no unmanifested shard files
    (a crashed re-run's leftovers would double-feed a loader that
    globs). Read-only."""
    out: list[dict] = []
    mp = os.path.join(path, _MANIFEST)
    if not os.path.exists(mp):
        return [{"check": "manifest", "ok": False,
                 "detail": f"no {_MANIFEST}"}]
    man = json.load(open(mp))
    out.append({"check": "manifest", "ok": True, "detail": ""})
    listed = {f"shard-{s['shard_id']:06d}.tar": s for s in man["shards"]}
    ok = True
    details = []
    for name, s in listed.items():
        fp = os.path.join(path, name)
        if not os.path.exists(fp):
            ok, _ = False, details.append(f"{name} missing")
            continue
        blob = open(fp, "rb").read()
        if (len(blob) != s["n_bytes"]
                or hashlib.md5(blob).hexdigest() != s["md5"]):
            ok, _ = False, details.append(f"{name} bytes/md5 drift")
    out.append({"check": "shards_match_manifest", "ok": ok,
                "detail": "; ".join(details)[:200]})
    on_disk = {f for f in os.listdir(path)
               if f.startswith("shard-") and f.endswith(".tar")}
    extra = sorted(on_disk - set(listed))
    out.append({"check": "no_unmanifested_shards", "ok": not extra,
                "detail": ", ".join(extra)[:200]})
    return out
