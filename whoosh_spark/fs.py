"""Driver-side small-file I/O that works on any Hadoop-supported filesystem.

The store's control-plane files (``manifest.json``, ``_build_log.jsonl``,
overlay-directory probes) are tiny driver-side reads/writes.  The data plane
(parquet tables) already goes through Spark and is scheme-agnostic; this
module gives the control plane the same property:

    plain path ("/tmp/ix")        → Python io (no JVM round-trip)
    URI path  ("hdfs://…", "s3a://…", "file:///…")
                                  → Hadoop FileSystem API via the active
                                    SparkSession's JVM gateway

``file://`` deliberately routes through the JVM (Hadoop LocalFileSystem) so
the remote branch is exercised by local tests.

Single-writer assumption: appends on remote filesystems are implemented as
read + atomic-rename rewrite because ``FileSystem.append`` is unsupported on
object stores — fine here, the build log has exactly one writer (the driver),
the same exclusive-writer contract as Whoosh's index lock
(``src/whoosh/index.py::FileIndex.lock ≈L260``).

Rename atomicity caveat (documented 100 TB posture): HDFS renames are atomic;
S3A renames are copy+delete and NOT atomic — for S3, the manifest swap should
go through an Iceberg/table-format catalog commit instead.  The layout maps
1:1 (manifest = snapshot), so that is a sink swap, not a redesign.
"""

from __future__ import annotations

import os
import posixpath
import shutil

_REMOTE_SCHEMES_HINT = ("://",)


def is_uri(path: str) -> bool:
    return "://" in path


def join(path: str, *parts: str) -> str:
    if is_uri(path):
        return posixpath.join(path, *parts)
    return os.path.join(path, *parts)


def _fs(path: str):
    """(jvm, FileSystem, Path) for a URI path via the active session."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(f"no active SparkSession for remote path {path!r}")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def exists(path: str) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    _, fs, p = _fs(path)
    return bool(fs.exists(p))


def isdir_nonempty(path: str) -> bool:
    if not is_uri(path):
        return os.path.isdir(path) and bool(os.listdir(path))
    _, fs, p = _fs(path)
    if not (fs.exists(p) and fs.getFileStatus(p).isDirectory()):
        return False
    return bool(fs.listStatus(p))


def dir_bytes(path: str) -> int:
    """Total bytes under a directory (0 if absent) — used to size the merge
    shuffle: partitions per data volume, not per core count."""
    if not is_uri(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for name in files:
                try:
                    total += os.path.getsize(os.path.join(root, name))
                except OSError:
                    pass
        return total
    _, fs, p = _fs(path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def makedirs(path: str) -> None:
    if not is_uri(path):
        os.makedirs(path, exist_ok=True)
        return
    _, fs, p = _fs(path)
    fs.mkdirs(p)


def create_exclusive(path: str, text: str = "") -> bool:
    """Create ``path`` only if it does not exist (the lock primitive).

    Atomic on POSIX local filesystems (O_CREAT|O_EXCL) and on
    HDFS-semantics stores (``FileSystem.create(overwrite=False)`` raises on
    an existing file); advisory-only on eventually-consistent object
    stores.  Returns False when the file already exists."""
    if not is_uri(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(text)
        return True
    jvm, fs, p = _fs(path)
    try:
        out = fs.create(p, False)
    except Exception:
        return False
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


def read_text(path: str) -> str | None:
    """File contents, or None if absent."""
    if not is_uri(path):
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return f.read()
    jvm, fs, p = _fs(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8"))
        chunks = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            chunks.append(line)
        return "\n".join(chunks) + ("\n" if chunks else "")
    finally:
        stream.close()


def _write_stream(path: str, text: str, overwrite: bool = True) -> None:
    jvm, fs, p = _fs(path)
    out = fs.create(p, overwrite)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(path: str, text: str) -> None:
    """tmp + rename swap (the TOC-generation commit primitive)."""
    if not is_uri(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return
    jvm, fs, p = _fs(path)
    tmp = path + ".tmp"
    _write_stream(tmp, text)
    _, fs2, ptmp = _fs(tmp)
    # Prefer FileContext rename with OVERWRITE — a single atomic replace on
    # HDFS-semantics filesystems.  The delete-then-rename fallback has a
    # window with NO destination file, and FileSystem.rename signals
    # failure by RETURN VALUE, which must be checked or a crashed swap
    # silently leaves the index without a manifest.
    try:
        opts = jvm.org.apache.hadoop.fs.Options
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            p.toUri(), fs.getConf())
        fc.rename(ptmp, p, [opts.Rename.OVERWRITE])
        return
    except Exception:
        pass
    if fs2.exists(p):
        fs2.delete(p, False)
    if not fs2.rename(ptmp, p):
        raise IOError(f"atomic commit failed: rename {tmp} -> {path} "
                      f"returned false")


def append_text(path: str, line: str) -> None:
    """Append one line.  Local: O_APPEND.  Remote: read + atomic rewrite
    (single-writer; see module docstring)."""
    if not is_uri(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            f.write(line)
        return
    cur = read_text(path) or ""
    write_text_atomic(path, cur + line)


def remove(path: str) -> None:
    """Delete a single FILE if it exists (no-op when absent) — rmtree's
    local branch is directory-only (shutil.rmtree ignores files)."""
    if not is_uri(path):
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
        return
    _, fs, p = _fs(path)
    if fs.exists(p):
        fs.delete(p, False)


def rmtree(path: str) -> None:
    if not is_uri(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    _, fs, p = _fs(path)
    if fs.exists(p):
        fs.delete(p, True)


def rename(src: str, dst: str) -> None:
    """Move src to dst (dst must not exist for directories)."""
    if not is_uri(src):
        os.replace(src, dst)
        return
    _, fs, psrc = _fs(src)
    _, _, pdst = _fs(dst)
    fs.rename(psrc, pdst)
