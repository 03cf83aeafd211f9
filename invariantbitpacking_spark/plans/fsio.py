"""Driver-side metadata I/O through the Hadoop FileSystem API.

The pipeline's compute plans are object-store ready (everything rides
``spark.read``/``DataFrame.write``), but its METADATA layer — params
JSON, the FSST table, staging ``_SUCCESS`` probes, wave-directory
listings, staging cleanup — previously used the local-FS Python API
(``os.path`` / ``open`` / ``shutil``), which breaks the moment
``output_dir`` is an ``s3a://`` or ``hdfs://`` URI.  These helpers
route every such call through ``org.apache.hadoop.fs.FileSystem``
resolved from the session's Hadoop configuration, so an object-store
target is a config change, not a code change.  (Reference analog: the
one I/O surface we replaced, ``read_shared``'s mmap loader,
src/ibp_api.cu:51-121.)

Only JDK / Hadoop classes are touched (no optional jars): streams are
drained with ``org.apache.hadoop.io.IOUtils.copyBytes`` into a
``java.io.ByteArrayOutputStream``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def local_root(p: str) -> str | None:
    """Local-filesystem path for ``p`` when it addresses the local FS
    (bare path or a ``file:`` URI), else None.  Lets metadata-heavy
    callers (lineage reads, wave-directory probes) skip the per-call
    py4j round trip — ~0.5-1 ms each, and the pipeline's mutation
    verbs make dozens per commit — while hdfs:/s3a: targets keep the
    Hadoop FileSystem route unchanged."""
    if "://" in p:
        return None
    if p.startswith("file:"):
        p = p[len("file:"):]
        # file:///x and file:/x both mean /x; file://host/x is remote
        if p.startswith("//"):
            rest = p[2:]
            if not rest.startswith("/"):
                return None
            p = rest
    return p


class HadoopFS:
    """Thin py4j wrapper over the FileSystem owning a given path, with
    a direct ``os`` fast path when that FileSystem is the local one
    (semantics identical; only the transport differs)."""

    def __init__(self, spark: SparkSession, base_path: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(base_path).getFileSystem(self._conf)
        # the fast path keys on the BASE path's filesystem: all pipeline
        # metadata lives under output_dir, so mixed-scheme calls resolve
        # per call below (local_root of the argument, not the base)
        self._base_local = local_root(base_path) is not None

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _local(self, p: str) -> str | None:
        if not self._base_local:
            return None
        return local_root(p)

    # -- predicates ------------------------------------------------------

    def exists(self, p: str) -> bool:
        lp = self._local(p)
        if lp is not None:
            import os
            return os.path.exists(lp)
        return bool(self._fs.exists(self._path(p)))

    # -- whole-file text I/O ----------------------------------------------

    def read_text(self, p: str) -> str:
        lp = self._local(p)
        if lp is not None:
            with open(lp, "r", encoding="utf-8") as fh:
                return fh.read()
        stream = self._fs.open(self._path(p))
        try:
            out = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, out, 65536, False)
            return out.toString("UTF-8")
        finally:
            stream.close()

    def write_text_atomic(self, p: str, text: str) -> None:
        """Write-to-temp + rename — same commit discipline the local
        code used with ``os.replace``.  Object-store renames are not
        atomic in the POSIX sense, but the tmp-file pattern still
        guarantees no reader ever sees a partially written file at the
        final path."""
        lp = self._local(p)
        if lp is not None:
            import os
            os.makedirs(os.path.dirname(lp), exist_ok=True)
            tmp = lp + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(text)
            os.replace(tmp, lp)
            return
        target = self._path(p)
        self._fs.mkdirs(target.getParent())
        tmp = self._path(p + ".tmp")
        stream = self._fs.create(tmp, True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        # Delete the old target only once the tmp file verifiably
        # exists, and surface a failed rename loudly: swallowing a
        # false return here would silently lose the previous metadata
        # file (params JSON / FSST table), and a later append would
        # re-learn params and fork the snapshot's encoding.
        if not self._fs.exists(tmp):
            raise IOError(f"write_text_atomic: tmp file vanished: {p}.tmp")
        if self._fs.exists(target):
            self._fs.delete(target, False)
        if not self._fs.rename(tmp, target):
            raise IOError(f"write_text_atomic: rename failed: {p}.tmp -> {p}")

    # -- tree ops ----------------------------------------------------------

    def delete(self, p: str, recursive: bool = True) -> bool:
        lp = self._local(p)
        if lp is not None:
            import os
            import shutil
            if not os.path.exists(lp):
                return False
            if os.path.isdir(lp):
                if recursive:
                    shutil.rmtree(lp)
                else:
                    try:
                        os.rmdir(lp)
                    except OSError:
                        return False
            else:
                os.remove(lp)
            return True
        return bool(self._fs.delete(self._path(p), recursive))

    def rename(self, src: str, dst: str) -> None:
        ls, ld = self._local(src), self._local(dst)
        if ls is not None and ld is not None:
            import os
            # Hadoop local rename refuses to clobber an existing dir;
            # callers always delete the target first, so plain rename
            # keeps the same failure surface
            os.rename(ls, ld)
            return
        if not self._fs.rename(self._path(src), self._path(dst)):
            raise IOError(f"rename failed: {src} -> {dst}")

    def listdir(self, p: str) -> list[str]:
        """Child names (not paths) of a directory; [] if absent."""
        lp = self._local(p)
        if lp is not None:
            import os
            if not os.path.isdir(lp):
                return []
            return os.listdir(lp)
        if not self.exists(p):
            return []
        return [str(s.getPath().getName())
                for s in self._fs.listStatus(self._path(p))]
