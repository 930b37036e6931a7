"""Scheme-agnostic small-file I/O on the cluster's filesystem.

Index directories (`write_lsh_index`, `write_ivf_index`) carry tiny
parameter-marker files next to their parquet partitions. At real scale
those directories live on an object store (s3a://, abfs://, hdfs://),
where driver-local ``open``/``os.makedirs`` silently write to the WRONG
filesystem. These helpers route the byte I/O through the JVM's Hadoop
``FileSystem`` API — the same resolver Spark's own parquet writer uses,
so the marker always lands beside the data whatever the scheme.

Driver-side, small payloads only (a marker is tens of bytes); anything
row-shaped belongs in a DataFrame write.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(spark: SparkSession, path_str: str) -> bool:
    fs, jpath, _ = _fs_path(spark, path_str)
    return bool(fs.exists(jpath))


def write_text(spark: SparkSession, path_str: str, content: str) -> None:
    """Create/overwrite a small text file (parent dirs created)."""
    fs, jpath, _ = _fs_path(spark, path_str)
    parent = jpath.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def create_exclusive(spark: SparkSession, path_str: str,
                     content: str) -> bool:
    """Create a small text file ONLY if it does not already exist —
    the atomic claim primitive behind the maintenance lock. Returns
    False if the path already exists (somebody else holds the claim).

    Scheme-dependent implementation, because atomicity is:

    - ``file`` (and scheme-less local): ``os.open(O_CREAT|O_EXCL)`` —
      kernel-atomic. Hadoop's ``RawLocalFileSystem.create(path,
      overwrite=false)`` is exists-then-create (a TOCTOU window a
      16-thread stress test loses reliably — test_maintenance_lock),
      so it must NOT be used for claims on local paths.
    - HDFS and friends: ``fs.create(path, overwrite=false)`` — the
      namenode makes create-if-absent atomic.
    - object stores without atomic create-if-absent can still admit a
      race the size of one marker write — see
      ``tombstones.maintenance_lock``'s scope note."""
    fs, jpath, _ = _fs_path(spark, path_str)
    parent = jpath.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    uri = jpath.toUri()
    if uri.getScheme() in (None, "file"):
        import os

        try:
            fd = os.open(uri.getPath(),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(content.encode("utf-8"))
        return True
    try:
        out = fs.create(jpath, False)
    except Exception:
        return False
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    return True


def read_text(spark: SparkSession, path_str: str) -> str:
    fs, jpath, jvm = _fs_path(spark, path_str)
    stream = fs.open(jpath)
    try:
        sink = jvm.java.io.ByteArrayOutputStream()
        # copyBytes(in, out, bufSize, close=False) — we close explicitly
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 4096, False)
        return bytes(sink.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def list_subdirs(spark: SparkSession, path_str: str) -> list[str]:
    """Names of the immediate subdirectories of ``path_str`` (sorted),
    resolved through the same Hadoop FileSystem as the data — a
    driver-local ``os.listdir`` would miss object-store layouts."""
    fs, jpath, _ = _fs_path(spark, path_str)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        if st.isDirectory():
            out.append(st.getPath().getName())
    return sorted(out)


def list_children(spark: SparkSession, path_str: str) -> list[str]:
    """Names of ALL immediate children (files and directories, sorted).
    Unlike the parquet reader's listing this does NOT hide ``_``/``.``
    prefixed entries — compaction uses it to enumerate exactly what a
    swap must delete or move."""
    fs, jpath, _ = _fs_path(spark, path_str)
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(jpath))


def delete(spark: SparkSession, path_str: str, recursive: bool = True) -> bool:
    """Delete a file or directory tree; False if it didn't exist."""
    fs, jpath, _ = _fs_path(spark, path_str)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-where-the-FS-allows move (HDFS/local rename; object
    stores emulate). Raises if the filesystem refuses."""
    fs, jsrc, jvm = _fs_path(spark, src)
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(jsrc, jdst):
        raise IOError(f"rename failed: {src} -> {dst}")


def dir_size(spark: SparkSession, path_str: str) -> int:
    """Total bytes under a directory (recursive), via the same Hadoop
    FileSystem as the data — compaction sizes its output file count
    from this."""
    fs, jpath, _ = _fs_path(spark, path_str)
    if not fs.exists(jpath):
        return 0
    return int(fs.getContentSummary(jpath).getLength())
