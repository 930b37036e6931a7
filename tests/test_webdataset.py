"""WebDataset tar-shard sink/source (sources/webdataset.py, r15)."""
from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import multimodal as mm
from ncbi_analysis_spark.sources import webdataset as wds

_FIX = os.path.join(os.path.dirname(__file__), "fixtures", "media")


def _media(spark):
    png = open(f"{_FIX}/gradient_rgb.png", "rb").read()
    jpg = open(f"{_FIX}/gradient_rgb.jpg", "rb").read()
    wav = open(f"{_FIX}/sine440.wav", "rb").read()
    rows = [
        (0, "image", png, (24, 16, 3, None, None, "png")),
        (1, "image", jpg, (24, 16, 3, None, None, "jpg")),
        (2, "audio", wav, (None, None, None, 8000, 250, "wav")),
        (5, "image", b"raw-bytes", (None, None, None, None, None, None)),
        (7, "audio", wav, (None, None, None, 8000, 250, "wav")),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_write_read_roundtrip_and_determinism(spark, tmp_path):
    """Shards round-trip the media table exactly; membership is the
    documented id//n rule; a re-run rewrites every shard
    byte-identically (the diffable-artifact contract)."""
    media = _media(spark)
    p = str(tmp_path / "wds")
    man = {r["shard_id"]: r for r in
           wds.write_webdataset_shards(media, p, samples_per_shard=4)
           .collect()}
    # ids 0,1,2 -> shard 0; 5,7 -> shard 1
    assert {k: man[k]["n_samples"] for k in man} == {0: 3, 1: 2}
    assert sorted(os.listdir(p)) == [
        wds._MANIFEST, "shard-000000.tar", "shard-000001.tar"]

    back = wds.read_webdataset_shards(spark, p)
    want = {r["media_id"]: r for r in media.collect()}
    got = {r["media_id"]: r for r in back.collect()}
    assert set(got) == set(want)
    for k in want:
        assert bytes(got[k]["data"] or b"") == bytes(want[k]["data"] or b"")
        assert got[k]["kind"] == want[k]["kind"]
        assert got[k]["meta"] == want[k]["meta"]

    # deterministic re-run: byte-identical shards, same manifest md5s
    before = {n: hashlib.md5(open(os.path.join(p, n), "rb").read())
              .hexdigest() for n in os.listdir(p) if n.endswith(".tar")}
    # write under a DIFFERENT partitioning to prove layout independence
    man2 = {r["shard_id"]: r for r in
            wds.write_webdataset_shards(media.repartition(7), p,
                                        samples_per_shard=4).collect()}
    after = {n: hashlib.md5(open(os.path.join(p, n), "rb").read())
             .hexdigest() for n in os.listdir(p) if n.endswith(".tar")}
    assert before == after
    assert {k: man2[k]["md5"] for k in man2} \
        == {k: man[k]["md5"] for k in man}


def test_decoders_consume_shard_payloads(spark, tmp_path):
    """The read-back payloads feed the auto decoders' real paths —
    export and re-import preserves decodability end-to-end."""
    p = str(tmp_path / "wds")
    wds.write_webdataset_shards(_media(spark), p, samples_per_shard=100)
    back = wds.read_webdataset_shards(spark, p)
    feats = {r["media_id"]: r for r in mm.image_features(
        back.filter(F.col("kind") == "image")).collect()}
    assert (feats[0]["width"], feats[0]["height"]) == (24, 16)
    assert feats[1]["phash64"] == -8851168403618376406  # the JPEG pin
    aud = {r["media_id"]: r for r in mm.audio_features(
        back.filter(F.col("kind") == "audio")).collect()}
    assert aud[2]["n_samples"] == 2000 and aud[2]["peak"] == 0.5


def test_verify_webdataset_shards(spark, tmp_path):
    """fsck: healthy passes; a bit-flipped shard, a deleted shard and
    an unmanifested extra are each caught."""
    p = str(tmp_path / "wds")
    wds.write_webdataset_shards(_media(spark), p, samples_per_shard=4)
    checks = {c["check"]: c["ok"]
              for c in wds.verify_webdataset_shards(spark, p)}
    assert all(checks.values()) and len(checks) == 3

    # corruption: flip a byte
    fp = os.path.join(p, "shard-000000.tar")
    blob = bytearray(open(fp, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(fp, "wb").write(bytes(blob))
    checks = {c["check"]: c["ok"]
              for c in wds.verify_webdataset_shards(spark, p)}
    assert not checks["shards_match_manifest"]

    # unmanifested extra
    open(os.path.join(p, "shard-000099.tar"), "wb").write(b"junk")
    checks = {c["check"]: c["ok"]
              for c in wds.verify_webdataset_shards(spark, p)}
    assert not checks["no_unmanifested_shards"]

    # torn shard on read: drop a member half
    import io
    import tarfile

    p2 = str(tmp_path / "wds2")
    wds.write_webdataset_shards(_media(spark), p2, samples_per_shard=100)
    fp2 = os.path.join(p2, "shard-000000.tar")
    with tarfile.open(fp2) as tf:
        members = [(m.name, tf.extractfile(m).read())
                   for m in tf.getmembers() if not m.name.endswith(".json")
                   or not m.name.startswith("000000000000")]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    open(fp2, "wb").write(buf.getvalue())
    with pytest.raises(Exception, match="torn shard"):
        wds.read_webdataset_shards(spark, p2).collect()
