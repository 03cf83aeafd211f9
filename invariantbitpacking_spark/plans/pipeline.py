"""Resumable compression pipeline with per-partition lineage.

North-rule scale machinery:

- **Skew-neutralizing partitioning**: documents are salted with
  ``bucket = xxhash64(doc_id) % num_buckets`` and shuffled once so every
  bucket carries a statistically even token mass regardless of the
  long-document tail (``source`` alone would skew; a single mega-doc
  bounds residual skew to its own size since documents are atomic).
- **Wave commits + lineage**: buckets are processed in waves; each wave
  appends its encoded output (parquet, partitioned by ``bucket``) and
  then appends one lineage row per bucket to ``<out>/lineage`` with
  (snapshot_id, bucket, codec mix, doc/token/byte counts, payload
  checksum, wall seconds).  The lineage append is the commit point.
- **Resume**: a rerun anti-joins pending buckets against committed
  lineage rows for the same snapshot and only processes the remainder.
- **Incremental ingest** (:meth:`CompressionPipeline.append`): a delta
  upserts into a committed snapshot as O(delta) merge-on-read delta
  files (or, with ``strategy="rewrite"``, by rewriting only the
  buckets its doc_ids salt into); superseding lineage rows keep the
  checksum audit exact (latest commit per bucket wins).
- **Deletion + time travel** (:meth:`delete`, ``as_of_seq``): deletes
  default to O(delta) tombstone markers resolved latest-wins
  (physical erasure at :meth:`compact`); reads can rewind to any
  still-uncompacted lineage commit.

On a real cluster this is launched via ``spark-submit --py-files
invariantbitpacking_spark.zip run_pipeline.py`` (see scripts/); the
session factory builds the same zip in local mode.

The reference has no persistence/lineage (results live in process
memory, SURVEY.md §1.5); this layer is new work per BASELINE.json.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import strings as fstr
from ..operators import selector
from ..operators.ibp import IbpParams, learn_params
from .fsio import HadoopFS


def _join(*parts: str) -> str:
    """Scheme-safe path join (os.path.join is local-FS thinking; this
    works for file:/, hdfs://, s3a:// and bare paths alike)."""
    return "/".join([parts[0].rstrip("/")] +
                    [p.strip("/") for p in parts[1:]])


def _float_bits_view(df: DataFrame, itemsize: int) -> DataFrame:
    """``tokens array<float|double>`` reinterpreted as its IEEE-754
    integer bit view (``array<int|bigint>``), doc_id/n_tok preserved.

    The round-trip audit of a float snapshot compares on THIS view:
    Spark's value equality is NaN-safe (NaN = NaN holds) but it
    conflates -0.0 with 0.0 and all NaN payload bits — weaker than the
    bit-identical guarantee the codec makes, and the bit view is
    exactly what the encoder packed anyway.  One zero-copy mapInArrow
    pass, no per-row Python."""
    import numpy as np
    import pyarrow as pa

    from ..operators.framing import gather_ranges, list_array_flat

    elem = "bigint" if itemsize == 8 else "int"
    pa_elem = pa.int64() if itemsize == 8 else pa.int32()

    def view(batches):
        for rb in batches:
            names = rb.schema.names
            vals, starts, lens = list_array_flat(
                rb.column(names.index("tokens")), itemsize)
            flat = gather_ranges(vals, starts, lens)
            off = np.zeros(len(lens) + 1, np.int32)
            np.cumsum(lens, out=off[1:])
            toks = pa.ListArray.from_arrays(
                pa.array(off, pa.int32()), pa.array(flat, pa_elem))
            yield pa.RecordBatch.from_arrays(
                [rb.column(names.index("doc_id")), toks,
                 rb.column(names.index("n_tok"))],
                names=["doc_id", "tokens", "n_tok"])

    return (df.select("doc_id", "tokens", "n_tok")
            .mapInArrow(view, schema=("doc_id string, tokens "
                                      f"array<{elem}>, n_tok int")))

LINEAGE_SCHEMA = (
    "snapshot_id string, bucket int, status string, docs long, "
    "tokens long, raw_bytes long, comp_bytes long, codec_mix string, "
    "payload_xxh long, wall_sec double, committed_at double, "
    "commit_seq long"
)

# Decoded-shape schema of an encoded table with ZERO stored rows (a
# fully-deleted-then-compacted snapshot): read_encoded returns this
# empty frame instead of failing schema inference on missing files.
EMPTY_READ_SCHEMA = (
    "doc_id string, source string, n_tok int, n_blocks int, "
    "block_sizes array<int>, block_flags binary, payload binary, "
    "comp_bytes long, raw_bytes long, codec string, "
    "snapshot_id string, bucket int"
)

# Sentinel codec of a DELETE marker row in the delta tree: it wins
# latest-wins resolution like any delta row but is filtered from every
# resolved view, so the document reads as gone while the base bucket
# stays byte-identical until compact() physically erases it.
TOMBSTONE_CODEC = "tombstone"


@dataclass
class PipelineResult:
    snapshot_id: str
    buckets_done: int
    buckets_skipped: int
    docs: int
    tokens: int
    raw_bytes: int
    comp_bytes: int

    @property
    def ratio(self) -> float:
        return self.raw_bytes / max(self.comp_bytes, 1)


class CompressionPipeline:
    def __init__(self, spark: SparkSession, output_dir: str,
                 num_buckets: int = 64, wave_buckets: int = 16,
                 sample_fraction: float | None = 0.1,
                 allowed=selector.CODEC_ORDER,
                 bloom_ndv: int | None = 100_000,
                 delta_compact_threshold: int | None = 12):
        self.spark = spark
        self.output_dir = output_dir
        self.data_dir = _join(output_dir, "encoded")
        self.delta_dir = _join(output_dir, "delta")
        self.lineage_dir = _join(output_dir, "lineage")
        self.params_dir = _join(output_dir, "params")
        # ALL driver-side metadata I/O goes through the Hadoop
        # FileSystem owning output_dir — file:, hdfs:, s3a:, ... alike
        self.fs = HadoopFS(spark, output_dir)
        self.num_buckets = num_buckets
        self.wave_buckets = wave_buckets
        self.sample_fraction = sample_fraction
        self.allowed = allowed
        # Parquet bloom filter on the (FSST-encoded) doc_id column of
        # every BASE data file: fetch()'s pushed IN literal prunes row
        # groups by doc_id min/max only where the clustered sort helps;
        # ids that interleave across the sort order still pass min/max
        # and the bloom filter skips those groups too.  expected_ndv
        # sizes the filter (~1.2 bytes/key at the parquet default fpp);
        # set it near the per-bucket document count in production,
        # None disables.  Delta files skip it (tiny by contract).
        self.bloom_ndv = bloom_ndv
        # Delta-pressure backstop for BATCH mutation callers (streaming
        # has its own compact_every cadence): once a bucket accumulates
        # this many delta_seq directories, the delta append/delete that
        # crossed the line folds that bucket back into its base before
        # returning — read-side resolution cost stays bounded no matter
        # how many small appends a long-lived snapshot receives.  None
        # disables (e.g. to preserve full time-travel history, which
        # compaction collapses).
        self.delta_compact_threshold = delta_compact_threshold

    def _base_writer(self, df: DataFrame):
        """Writer for BASE data files, with the doc_id bloom filter
        options applied (see ``bloom_ndv``)."""
        w = df.write
        if self.bloom_ndv:
            w = (w.option("parquet.bloom.filter.enabled#doc_id", "true")
                 .option("parquet.bloom.filter.expected.ndv#doc_id",
                         str(int(self.bloom_ndv))))
        return w

    # -- lineage -----------------------------------------------------------

    def _heal_lineage(self) -> None:
        """Finish a compact_lineage swap that crashed between its two
        renames: in that window the lineage dir is MISSING while
        encoded/ + delta/ files remain, so without recovery every
        committed bucket would be forgotten — run() would re-encode
        buckets whose live delta files then supersede the fresh base
        rows at read time.  The fully-written ``.compact`` dir (counted
        back before the swap began) is the newest complete state; a
        lone ``.old`` dir means the crash hit before the first rename
        finished and the pre-compaction state is authoritative."""
        if self.fs.exists(self.lineage_dir):
            return
        tmp = self.lineage_dir + ".compact"
        old = self.lineage_dir + ".old"
        if self.fs.exists(tmp):
            self.fs.rename(tmp, self.lineage_dir)
            if self.fs.exists(old):
                self.fs.delete(old, recursive=True)
        elif self.fs.exists(old):
            self.fs.rename(old, self.lineage_dir)

    def lineage(self) -> DataFrame:
        self._heal_lineage()
        try:
            df = (self.spark.read.option("mergeSchema", "true")
                  .parquet(self.lineage_dir))
        except Exception:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        # pre-commit_seq lineage files read as seq 0 (back-compat)
        if "commit_seq" not in df.columns:
            df = df.withColumn("commit_seq", F.lit(0).cast("long"))
        return df

    def _lineage_pdf(self):
        """Lineage as a driver-side pandas frame when the store lives
        on the LOCAL filesystem, else None (caller uses the Spark
        path).  The lineage table is tiny metadata (<= one row per
        bucket per commit), but every mutation verb used to read it
        through 2-4 separate Spark jobs — ~0.2-0.6 s of fixed
        scheduler+worker cost EACH on this box, the dominant wall of
        the 100-doc tombstone delete.  Reading the same parquet files
        with pyarrow costs ~2 ms and returns identical rows; hdfs:/
        s3a: stores keep the distributed read."""
        from .fsio import local_root

        root = local_root(self.lineage_dir)
        if root is None:
            return None
        self._heal_lineage()
        import os

        import pandas as pd

        cols = [f.split(" ")[0] for f in LINEAGE_SCHEMA.split(", ")]
        if not os.path.isdir(root):
            return pd.DataFrame(columns=cols)
        import pyarrow.parquet as pq

        frames = []
        for name in sorted(os.listdir(root)):
            if not name.endswith(".parquet"):
                continue
            pdf = pq.read_table(os.path.join(root, name)).to_pandas()
            if "commit_seq" not in pdf.columns:
                pdf["commit_seq"] = 0  # pre-commit_seq back-compat
            frames.append(pdf)
        if not frames:
            return pd.DataFrame(columns=cols)
        return pd.concat(frames, ignore_index=True)

    def _next_commit_seq(self) -> int:
        """Monotonic per-pipeline commit sequence number: the
        committed_at float ties when two commits of the same bucket
        land within one clock reading (rapid streaming upserts), and a
        tie would let latest_lineage surface a superseded checksum.
        Derived from stored state (max over the tiny lineage table)
        so it survives across pipeline object instances."""
        pdf = self._lineage_pdf()
        if pdf is not None:
            return (0 if len(pdf) == 0
                    else int(pdf["commit_seq"].max())) + 1
        row = self.lineage().agg(
            F.max("commit_seq").alias("m")).collect()[0]
        return int(row["m"] or 0) + 1

    def committed_buckets(self, snapshot_id: str) -> set[int]:
        pdf = self._lineage_pdf()
        if pdf is not None:
            sel = pdf[(pdf["snapshot_id"] == snapshot_id)
                      & (pdf["status"] == "committed")]
            return {int(b) for b in sel["bucket"]}
        rows = (self.lineage()
                .filter((F.col("snapshot_id") == snapshot_id)
                        & (F.col("status") == "committed"))
                .select("bucket").distinct().collect())
        return {r["bucket"] for r in rows}

    def latest_lineage(self, snapshot_id: str) -> DataFrame:
        """One committed row per bucket, LATEST commit wins — appends
        (:meth:`append`) re-commit a bucket with fresh totals and a
        fresh checksum, so consumers must read the newest row, never a
        superseded one.  The window is over <= num_buckets rows."""
        from pyspark.sql import Window

        lin = (self.lineage()
               .filter((F.col("snapshot_id") == snapshot_id)
                       & (F.col("status") == "committed")))
        # commit_seq is the strict tiebreaker (committed_at floats can
        # tie under rapid streaming upserts); legacy rows all carry 0
        # and fall back to committed_at
        w = Window.partitionBy("bucket").orderBy(
            F.desc("commit_seq"), F.desc("committed_at"))
        return (lin.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).drop("rn"))

    def _latest_lineage_map(self, snapshot_id: str,
                            buckets=None) -> dict[int, dict]:
        """Driver-side twin of :meth:`latest_lineage` for consumers
        that COLLECT the result anyway: {bucket: latest committed row
        as a plain dict}.  Same latest-wins order (commit_seq desc,
        committed_at desc)."""
        pdf = self._lineage_pdf()
        if pdf is None:
            df = self.latest_lineage(snapshot_id)
            if buckets is not None:
                df = df.filter(F.col("bucket").isin(list(buckets)))
            return {int(r["bucket"]): r.asDict() for r in df.collect()}
        sel = pdf[(pdf["snapshot_id"] == snapshot_id)
                  & (pdf["status"] == "committed")]
        if buckets is not None:
            sel = sel[sel["bucket"].isin(set(int(b) for b in buckets))]
        out: dict[int, dict] = {}
        if len(sel) == 0:
            return out
        sel = sel.sort_values(["commit_seq", "committed_at"],
                              kind="stable")
        for rec in sel.to_dict("records"):  # later rows overwrite
            out[int(rec["bucket"])] = rec
        return out

    # -- params ------------------------------------------------------------

    def load_or_learn_params(self, toks: DataFrame,
                             snapshot_id: str) -> IbpParams:
        """Codec parameters are part of the snapshot's lineage: learned
        once (on a sample), persisted, and reloaded on resume so every
        wave encodes with identical params."""
        path = _join(self.params_dir, f"{snapshot_id}.json")
        if self.fs.exists(path):
            return IbpParams.from_dict(json.loads(self.fs.read_text(path)))
        params = learn_params(toks, sample_fraction=self.sample_fraction)
        self.fs.write_text_atomic(path, json.dumps(params.to_dict()))
        return params

    def _fsst_path(self, snapshot_id: str | None) -> str | None:
        """Resolve which persisted FSST table file a snapshot decodes
        with: its OWN ``fsst_<snapshot>.json`` when present, else the
        legacy shared ``fsst_table.json`` (pre-evolution outputs), else
        None (v1 plain-string layout)."""
        if snapshot_id is not None:
            own = _join(self.params_dir, f"fsst_{snapshot_id}.json")
            if self.fs.exists(own):
                return own
        legacy = _join(self.params_dir, "fsst_table.json")
        return legacy if self.fs.exists(legacy) else None

    def load_or_learn_fsst(self, toks: DataFrame,
                           snapshot_id: str | None = None):
        """PER-SNAPSHOT FSST symbol table (learned on a driver-side
        sample of the doc_id/source columns, persisted as hex with a
        ``table_id``): each new snapshot fits its own string
        distribution instead of inheriting whatever corpus ran first —
        a later snapshot with different doc_id shapes no longer
        compresses worse forever.  Old snapshots keep decoding with
        the table they were written under (:meth:`_fsst_path` resolves
        per snapshot, falling back to the legacy shared file), so
        evolution never breaks an existing read."""
        path = self._fsst_path(snapshot_id)
        if path is not None:
            meta = json.loads(self.fs.read_text(path))
            return fstr.table_from_hex(meta["hex"],
                                       meta.get("format_version", 2))
        table = fstr.learn_table_df(toks, ("doc_id", "source"))
        own = _join(self.params_dir,
                    f"fsst_{snapshot_id}.json" if snapshot_id is not None
                    else "fsst_table.json")
        # format_version marks the string-column layout: v3 = canonical
        # FSST (1-8-byte symbols), v2 = legacy bigram FSST-lite (still
        # decodable), v1 = plain strings with no table file —
        # read_encoded detects all three
        self.fs.write_text_atomic(own, json.dumps(
            {"hex": fstr.table_to_hex(table),
             "symbols": int(table.size),
             "table_id": snapshot_id or "global",
             "format_version": 3}))
        return table

    # -- staging -------------------------------------------------------------

    def stage_input(self, toks: DataFrame, snapshot_id: str) -> str:
        """One salting pass: the input is scanned ONCE, shuffled on the
        bucket salt, and written partitioned by bucket.  Every wave then
        reads only its own bucket directories (partition pruning) —
        without this, each wave would rescan the whole 100 TB input
        because ``bucket`` is computed, not a prunable column.
        Idempotent per snapshot (_SUCCESS marker)."""
        staging = _join(self.output_dir, "staging", snapshot_id)
        if self.fs.exists(_join(staging, "_SUCCESS")):
            return staging
        nb = self.num_buckets
        salted = toks.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(nb)).cast("int"))
        (salted.repartition(nb, "bucket")
         .write.mode("overwrite").partitionBy("bucket").parquet(staging))
        return staging

    def _wave_paths(self, snapshot_id: str, wave) -> list[str]:
        """Partition directories a wave just wrote (empty buckets write
        nothing) — existence probes through the Hadoop FileSystem, so
        the same code lists hdfs:/s3a: output."""
        paths = [_join(self.data_dir, f"snapshot_id={snapshot_id}",
                       f"bucket={b}") for b in wave]
        return [p for p in paths if self.fs.exists(p)]

    def _load_params(self, snapshot_id: str) -> IbpParams:
        """The snapshot's PERSISTED codec params — read-side twin of
        load_or_learn_params for operations (fetch) that must never
        learn fresh params."""
        path = _join(self.params_dir, f"{snapshot_id}.json")
        if not self.fs.exists(path):
            raise ValueError(
                f"no persisted params for snapshot {snapshot_id!r} "
                f"at {path} — run() the snapshot first")
        return IbpParams.from_dict(json.loads(self.fs.read_text(path)))

    def _fsst_table(self, snapshot_id: str | None = None):
        """The FSST table a snapshot decodes with (per-snapshot file,
        legacy shared file, or None for v1 plain-string outputs)."""
        path = self._fsst_path(snapshot_id)
        if path is None:
            return None
        meta = json.loads(self.fs.read_text(path))
        return fstr.table_from_hex(meta["hex"],
                                   meta.get("format_version", 2))

    # -- merge-on-read deltas ------------------------------------------------
    #
    # Small appends write per-bucket DELTA files instead of rewriting
    # the bucket (an O(bucket) cost class that made a 20-doc upsert pay
    # ~25% of a from-scratch encode).  Layout:
    #   <out>/delta/snapshot_id=S/bucket=B/delta_seq=N/part-*.parquet
    # delta_seq is the pipeline's monotonic commit sequence, so
    # latest-wins ordering is exact.  Readers resolve
    #   current = base ANTI-JOIN delta-doc_ids  UNION  latest-delta-rows
    # where the anti-join key set is broadcast — deltas are small by
    # contract (that is what makes them deltas); once they are not,
    # :meth:`compact` folds them into the base and the read plan
    # returns to a pure scan.

    def _snapshot_max_seq(self, snapshot_id: str) -> int:
        """Max commit_seq over THIS snapshot's committed lineage rows.
        Every committed delta dir satisfies delta_seq <= this value
        (the delta commit appends lineage rows carrying the delta's own
        seq), so any delta dir above it is an orphan from a crashed
        append."""
        pdf = self._lineage_pdf()
        if pdf is not None:
            sel = pdf[(pdf["snapshot_id"] == snapshot_id)
                      & (pdf["status"] == "committed")]
            return 0 if len(sel) == 0 else int(sel["commit_seq"].max())
        row = (self.lineage()
               .filter((F.col("snapshot_id") == snapshot_id)
                       & (F.col("status") == "committed"))
               .agg(F.max("commit_seq").alias("m")).collect()[0])
        return int(row["m"] or 0)

    def _purge_orphan_deltas(self, snapshot_id: str) -> int:
        """Delete every delta_seq dir STRICTLY greater than the
        snapshot's lineage max commit_seq.  A crashed append leaves its
        delta files with no lineage commit; if other snapshots advance
        the GLOBAL sequence before the retry, the retry's fresh seq no
        longer matches the orphan's, so matching only the next seq
        (the old scheme) left the orphan behind as fake committed data
        — the incremental stats then drift permanently.  The
        per-snapshot max is crash-ordering-proof.  Returns dirs
        removed."""
        snap = _join(self.delta_dir, f"snapshot_id={snapshot_id}")
        if not self.fs.exists(snap):
            return 0
        max_seq = self._snapshot_max_seq(snapshot_id)
        removed = 0
        for bname in self.fs.listdir(snap):
            if not bname.startswith("bucket="):
                continue
            bdir = _join(snap, bname)
            for sname in self.fs.listdir(bdir):
                if not sname.startswith("delta_seq="):
                    continue
                if int(sname.split("=", 1)[1]) > max_seq:
                    self.fs.delete(_join(bdir, sname), recursive=True)
                    removed += 1
            if not any(c.startswith("delta_seq=")
                       for c in self.fs.listdir(bdir)):
                self.fs.delete(bdir, recursive=True)
        if not any(c.startswith("bucket=")
                   for c in self.fs.listdir(snap)):
            self.fs.delete(snap, recursive=True)
        return removed

    def _delta_buckets(self, snapshot_id: str) -> list[int]:
        """Buckets of a snapshot that currently carry delta files —
        childless bucket dirs (orphan-cleanup leftovers) don't count;
        listing them would feed schema inference an empty tree."""
        snap = _join(self.delta_dir, f"snapshot_id={snapshot_id}")
        out = []
        for n in self.fs.listdir(snap):
            if not n.startswith("bucket="):
                continue
            if any(c.startswith("delta_seq=")
                   for c in self.fs.listdir(_join(snap, n))):
                out.append(int(n.split("=", 1)[1]))
        return sorted(out)

    def _maybe_compact_deltas(self, snapshot_id: str,
                              buckets) -> list[int]:
        """Fold any of ``buckets`` whose delta_seq directory count has
        reached ``delta_compact_threshold`` back into the base.  Called
        by the delta append and tombstone-delete paths after their
        lineage commit, so N small mutations cost O(delta) each plus
        ONE amortized O(bucket) rewrite every threshold-th mutation —
        the read path then resolves at most ``threshold`` delta files
        per bucket, a bound that holds at any corpus size.  Returns the
        buckets that were compacted."""
        thr = self.delta_compact_threshold
        if not thr:
            return []
        snap = _join(self.delta_dir, f"snapshot_id={snapshot_id}")
        pressured = []
        for b in buckets:
            bdir = _join(snap, f"bucket={b}")
            if not self.fs.exists(bdir):
                continue
            n = sum(1 for c in self.fs.listdir(bdir)
                    if c.startswith("delta_seq="))
            if n >= thr:
                pressured.append(b)
        if pressured:
            self.compact(snapshot_id, buckets=pressured)
        return pressured

    def _delta_paths(self, snapshot_id: str, buckets=None) -> list[str]:
        have = self._delta_buckets(snapshot_id)
        if buckets is not None:
            have = [b for b in have if b in set(buckets)]
        return [_join(self.delta_dir, f"snapshot_id={snapshot_id}",
                      f"bucket={b}") for b in have]

    def _dir_schema(self, path: str, partition_fields):
        """Read schema of a LOCAL parquet directory (walking into
        partition subdirs for the first data file) and append the given
        partition fields — sparing every bucket-pruned read its
        driver-side schema-inference footer pass.  Field order mirrors
        what discovery produces (data columns, then partition columns),
        so supplied-schema and inferred reads are interchangeable.
        Returns None when the path is not local or holds no parquet
        file yet (caller falls back to inference)."""
        from .fsio import local_root

        root = local_root(path)
        if root is None:
            return None
        import os

        def first_parquet(d: str, depth: int):
            try:
                names = sorted(os.listdir(d))
            except OSError:
                return None
            for n in names:
                if n.endswith(".parquet") and not n.startswith((".", "_")):
                    return os.path.join(d, n)
            if depth > 0:
                for n in names:
                    sub = os.path.join(d, n)
                    if os.path.isdir(sub):
                        f = first_parquet(sub, depth - 1)
                        if f is not None:
                            return f
            return None

        f = first_parquet(root, 3)
        if f is None:
            return None
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import _parse_datatype_string, StructField

        try:
            sch = from_arrow_schema(pq.read_schema(f))
        except Exception:
            return None
        have = {fl.name for fl in sch.fields}
        for name, t in partition_fields:
            if name not in have:
                sch = sch.add(StructField(name, _parse_datatype_string(t)))
        return sch

    @staticmethod
    def _latest_delta(deltas: DataFrame) -> DataFrame:
        """One row per (snapshot_id, doc_id), highest delta_seq wins.
        The window runs over the SMALL delta set only — never the
        base."""
        from pyspark.sql import Window

        w = (Window.partitionBy("snapshot_id", "doc_id")
             .orderBy(F.desc("delta_seq")))
        return (deltas.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn", "delta_seq"))

    def _resolved(self, snapshot_id: str | None = None,
                  buckets=None, as_of_seq: int | None = None) -> DataFrame:
        """The snapshot's CURRENT logical rows: base minus doc_ids
        superseded by deltas, plus the latest delta rows — minus
        documents whose latest delta is a TOMBSTONE (codec
        'tombstone', the O(delta) delete marker).  The big side (base)
        is never shuffled — superseded rows fall to a broadcast
        anti-join on the small delta key set.  ``buckets`` prunes both
        listings to the given bucket dirs (the fetch path).

        ``as_of_seq`` is TIME TRAVEL: only delta files with
        ``delta_seq <= as_of_seq`` participate (delta_seq is a
        partition directory, so the filter prunes at listing level) —
        an upsert or tombstone committed after that sequence is
        invisible and the superseded/deleted row resurfaces.  History
        reaches back to the last :meth:`compact` of the affected
        buckets: compaction folds deltas into the base and deletes the
        delta files, garbage-collecting everything older."""
        if buckets is not None:
            if snapshot_id is None:
                raise ValueError("bucket pruning needs a snapshot_id")
            base_paths = self._wave_paths(snapshot_id, buckets)
            if not base_paths:
                base = None
            else:
                reader = self.spark.read.option("basePath", self.data_dir)
                sch = self._dir_schema(base_paths[0],
                                       (("snapshot_id", "string"),
                                        ("bucket", "int")))
                if sch is not None:
                    reader = reader.schema(sch)
                base = reader.parquet(*base_paths)
            delta_paths = self._delta_paths(snapshot_id, buckets)
        else:
            try:
                base = self.spark.read.parquet(self.data_dir)
            except Exception:
                base = None
            if snapshot_id is not None:
                if base is not None:
                    base = base.filter(F.col("snapshot_id") == snapshot_id)
                delta_paths = self._delta_paths(snapshot_id)
            else:
                # only snapshot dirs that still hold bucket children:
                # compaction can leave empty snapshot dirs (and the
                # root write drops a _SUCCESS marker) — reading those
                # would fail schema inference
                delta_paths = [
                    _join(self.delta_dir, s)
                    for s in self.fs.listdir(self.delta_dir)
                    if s.startswith("snapshot_id=")
                    and any(c.startswith("bucket=") for c in
                            self.fs.listdir(_join(self.delta_dir, s)))]
        if not delta_paths:
            if base is None:
                raise ValueError("nothing stored at "
                                 f"{self.data_dir} / {self.delta_dir}")
            return base
        dreader = self.spark.read.option("basePath", self.delta_dir)
        dsch = self._dir_schema(delta_paths[0],
                                (("snapshot_id", "string"),
                                 ("bucket", "int"), ("delta_seq", "long")))
        if dsch is not None:
            dreader = dreader.schema(dsch)
        deltas = dreader.parquet(*delta_paths)
        if as_of_seq is not None:
            deltas = deltas.filter(F.col("delta_seq") <= int(as_of_seq))
        latest = self._latest_delta(deltas)
        # a tombstone that wins latest-wins DELETES the document: it
        # must still shadow the base row (stay in the anti-join keys)
        # but contribute no output row itself
        live = latest.filter(F.col("codec") != TOMBSTONE_CODEC)
        if base is None:
            return live
        keys = latest.select("snapshot_id", "doc_id")
        kept = base.join(F.broadcast(keys), ["snapshot_id", "doc_id"],
                         "left_anti")
        return kept.unionByName(live, allowMissingColumns=True)

    # -- main --------------------------------------------------------------

    def run(self, toks: DataFrame, snapshot_id: str,
            max_waves: int | None = None) -> PipelineResult:
        nb = self.num_buckets
        params = self.load_or_learn_params(toks, snapshot_id)
        fsst_table = self.load_or_learn_fsst(toks, snapshot_id)
        staging = self.stage_input(toks, snapshot_id)
        staged = (self.spark.read.parquet(staging)
                  .withColumn("snapshot_id", F.lit(snapshot_id)))

        done = self.committed_buckets(snapshot_id)
        pending = [b for b in range(nb) if b not in done]
        totals = {"docs": 0, "tokens": 0, "raw_bytes": 0, "comp_bytes": 0}

        waves = [pending[i:i + self.wave_buckets]
                 for i in range(0, len(pending), self.wave_buckets)]
        if max_waves is not None:
            waves = waves[:max_waves]
        buckets_run = sum(len(w) for w in waves)
        for wave in waves:
            t0 = time.perf_counter()
            part = staged.filter(F.col("bucket").isin(wave))  # dir-pruned
            enc = selector.encode_auto(part, params, allowed=self.allowed,
                                       passthrough=("bucket", "snapshot_id"))
            # string columns ride FSST-encoded against the global table
            enc = fstr.encode_string_cols(enc, fsst_table,
                                          ("doc_id", "source"))
            # persisted per-row payload hash: lets delta-append commits
            # recompute bucket checksums from THIN columns (no payload
            # read) — see _append_delta
            enc = enc.withColumn("row_xxh", F.xxhash64("payload"))
            # doc_id-clustered row groups: a local sort (no shuffle)
            # gives each parquet row group a tight doc_id min/max, so
            # fetch()'s pushed IN filter can SKIP row groups, not just
            # bucket dirs
            enc = enc.sortWithinPartitions("bucket", "doc_id")
            # Idempotent wave commit: dynamic partition overwrite replaces
            # exactly the (snapshot_id, bucket) dirs present in this wave's
            # output, so a wave retried after a crash between the data
            # write and the lineage append REPLACES its partitions instead
            # of appending duplicate documents.
            (self._base_writer(enc).mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("snapshot_id", "bucket")
             .parquet(self.data_dir))
            wall = time.perf_counter() - t0
            for r in self._commit_wave(snapshot_id, wave, wall):
                for k in totals:
                    totals[k] += int(r[k])

        self._maybe_compact_lineage()
        return PipelineResult(snapshot_id, buckets_run, len(done),
                              totals["docs"], totals["tokens"],
                              totals["raw_bytes"], totals["comp_bytes"])

    # every wave/delta/delete commit appends one small lineage parquet
    # file; past this many files the next run() folds the history to
    # latest rows (the stream path has its own compact_every cadence)
    LINEAGE_COMPACT_FILES = 256

    def _maybe_compact_lineage(self) -> None:
        """Batch-side lineage maintenance: a long-lived pipeline (many
        runs/appends/deletes) accumulates one parquet file per commit
        and every lineage read pays a growing listing.  Fold to latest
        rows once the file count crosses the threshold — crash-safe
        (the two-rename swap self-heals on read) and invisible to
        consumers, who only ever read the newest row per bucket."""
        try:
            n = sum(1 for f in self.fs.listdir(self.lineage_dir)
                    if f.endswith(".parquet"))
        except Exception:
            return
        if n > self.LINEAGE_COMPACT_FILES:
            self.compact_lineage()

    def _commit_wave(self, snapshot_id: str, wave, wall: float) -> list:
        """Wave commit point: read back ONLY the wave's just-written
        partition directories (a filter over data_dir would re-list
        every snapshot/bucket ever written, a listing that grows with
        pipeline history), aggregate totals + XOR-fold checksum + codec
        mix at (bucket, codec) grain in ONE pass (XOR of XOR-folds and
        sums of sums compose exactly; the collected frame is <= buckets
        x codecs rows), and append one committed lineage row per
        bucket.  Returns the per-bucket stat dicts."""
        paths = self._wave_paths(snapshot_id, wave)
        if paths:
            written = (self.spark.read
                       .option("basePath", self.data_dir)
                       .parquet(*paths))
            fine = (written.groupBy("bucket", "codec").agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_tok").alias("tokens"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("comp_bytes").alias("comp_bytes"),
                F.expr("bit_xor(xxhash64(payload))").alias("payload_xxh"),
            ).collect())
            agg: dict[int, dict] = {}
            for r in fine:
                b = int(r["bucket"])
                a = agg.setdefault(b, {
                    "bucket": b, "docs": 0, "tokens": 0, "raw_bytes": 0,
                    "comp_bytes": 0, "payload_xxh": 0, "mix": {}})
                for k in ("docs", "tokens", "raw_bytes", "comp_bytes"):
                    a[k] += int(r[k])
                a["payload_xxh"] ^= int(r["payload_xxh"] or 0)
                a["mix"][r["codec"]] = int(r["docs"])
            stats = list(agg.values())
            mixes = {a["bucket"]: a["mix"] for a in stats}
        else:  # every bucket in the wave was empty
            stats, mixes = [], {}
        now = time.time()
        seq = self._next_commit_seq()
        rows = []
        for r in stats:
            b = int(r["bucket"])
            rows.append((snapshot_id, b, "committed", r["docs"],
                         r["tokens"], r["raw_bytes"], r["comp_bytes"],
                         json.dumps({k: int(v) for k, v in
                                     (mixes.get(b) or {}).items()},
                                    sort_keys=True),
                         int(r["payload_xxh"] or 0),
                         wall / max(len(wave), 1), now, seq))
        # empty buckets still commit (so resume skips them)
        got = {int(r["bucket"]) for r in stats}
        for b in wave:
            if b not in got:
                rows.append((snapshot_id, b, "committed",
                             0, 0, 0, 0, "{}", 0,
                             wall / max(len(wave), 1), now, seq))
        self._append_lineage_rows(rows)
        return stats

    def _append_lineage_rows(self, rows: list) -> None:
        """One lineage commit = ONE parquet file.  On a local store the
        file is written DRIVER-side with pyarrow — no Spark job at all
        (round 7 already cut this from 3.85 s [coalesce(1) python-slice
        tax] to 0.29 s [1-slice parallelize]; the remaining 0.29 s was
        still one full scheduler+python-worker round trip for a <=
        num_buckets-row metadata write).  Types mirror LINEAGE_SCHEMA
        exactly so Spark and pyarrow readers see one schema.  Remote
        stores keep the Spark write."""
        from .fsio import local_root

        root = local_root(self.lineage_dir)
        if root is not None:
            import os
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = pa.schema([
                ("snapshot_id", pa.string()), ("bucket", pa.int32()),
                ("status", pa.string()), ("docs", pa.int64()),
                ("tokens", pa.int64()), ("raw_bytes", pa.int64()),
                ("comp_bytes", pa.int64()), ("codec_mix", pa.string()),
                ("payload_xxh", pa.int64()), ("wall_sec", pa.float64()),
                ("committed_at", pa.float64()),
                ("commit_seq", pa.int64()),
            ])
            cols = list(zip(*rows)) if rows else [[] for _ in schema]
            table = pa.table(
                {f.name: pa.array(list(c), f.type)
                 for f, c in zip(schema, cols)}, schema=schema)
            os.makedirs(root, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(root, f".{name}.tmp")  # dotfile: readers skip
            pq.write_table(table, tmp, compression="snappy")
            os.replace(tmp, os.path.join(root, name))
            return
        (self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(rows, 1), LINEAGE_SCHEMA)
         .write.mode("append").parquet(self.lineage_dir))

    # -- incremental ingest --------------------------------------------------

    def append(self, toks_delta: DataFrame, snapshot_id: str,
               mode: str = "upsert",
               order_col: str | None = None,
               strategy: str = "delta") -> PipelineResult:
        """Incremental ingest into a COMMITTED snapshot: the delta's
        documents salt into their buckets, and ONLY those bucket
        directories are rewritten (surviving existing rows plus the
        newly encoded delta) — at 100 TB this touches
        ``len(affected)/num_buckets`` of the table instead of
        re-encoding the corpus, which is what makes the layout viable
        for a living dataset.

        - ``mode="upsert"`` (default): existing documents whose doc_id
          appears in the delta are REPLACED.  Matching happens on the
          FSST-encoded doc_id bytes — the encoding is deterministic
          given the persisted global table, so equality on encoded
          bytes IS equality on ids, with no decode pass.
        - ``mode="append"``: the caller guarantees delta doc_ids are
          new; existing rows are kept as-is.  Only meaningful with
          ``strategy="rewrite"`` — delta files resolve latest-wins at
          read time, so the delta strategy ALWAYS has upsert semantics
          and ``mode="append"`` with it raises rather than silently
          upserting.

        Commit protocol per wave of affected buckets: the combined
        frame is staged to its own directory first (Spark refuses to
        overwrite a path it is reading, and staging keeps the rewrite
        crash-safe), then dynamic-partition-overwritten into the data
        dir, read back, and committed as a FRESH lineage row per bucket
        — superseding, not mutating, the old row; consumers read
        through :meth:`latest_lineage`.  Re-running the same upsert
        delta converges to identical bytes and checksums (idempotent);
        codec params and the FSST table are the snapshot's persisted
        ones, so every appended document is encoded exactly as the
        original run would have.

        ``strategy="delta"`` (default) is O(delta): the encoded delta
        lands as per-bucket DELTA files (merge-on-read, see the delta
        section above) and the lineage commit recomputes bucket stats
        incrementally from thin columns — no existing row is re-read
        in bulk or rewritten.  ``strategy="rewrite"`` is the original
        bucket rewrite (what :meth:`compact` uses internally) — the
        right call for bulk deltas comparable to the bucket size.

        Delta pressure is self-bounding: once an affected bucket holds
        ``delta_compact_threshold`` delta_seq dirs, this call folds it
        into the base before returning (see
        :meth:`_maybe_compact_deltas`), so repeated small appends never
        degrade the read path unboundedly."""
        if mode not in ("upsert", "append"):
            raise ValueError(f"append: unknown mode {mode!r}")
        if strategy not in ("delta", "rewrite"):
            raise ValueError(f"append: unknown strategy {strategy!r}")
        if mode == "append" and strategy == "delta":
            # read-side delta resolution is unconditionally latest-wins,
            # so keep-existing semantics cannot be honored on this path
            raise ValueError(
                'append: mode="append" (keep existing rows) requires '
                'strategy="rewrite" — delta files always resolve as '
                "latest-wins upserts at read time")
        # Dedupe the delta ITSELF on doc_id: the upsert anti-join only
        # removes pre-existing rows, so a doc_id appearing twice within
        # one delta (two inbox files carrying the same revised doc in a
        # single availableNow micro-batch) would be written twice,
        # corrupting counts.  ``order_col`` names a column whose
        # largest value wins (e.g. a revision timestamp); without one
        # the winner is picked by a deterministic content hash so that
        # re-running the same delta converges to identical bytes.
        from pyspark.sql import Window
        tie = (F.col(order_col) if order_col is not None
               else F.xxhash64("tokens", "n_tok", "source"))
        w = Window.partitionBy("doc_id").orderBy(F.desc(tie))
        toks_delta = (toks_delta
                      .withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") == 1).drop("_rn"))
        if order_col is not None:  # ordering column is not payload
            toks_delta = toks_delta.drop(order_col)
        done = self.committed_buckets(snapshot_id)
        if len(done) < self.num_buckets:
            # appending into a half-run snapshot would commit lineage
            # rows for buckets the resumed run() then SKIPS, silently
            # dropping the original corpus docs of those buckets
            raise ValueError(
                f"append: snapshot {snapshot_id!r} has "
                f"{len(done)}/{self.num_buckets} buckets committed — "
                "finish run() before appending")
        nb = self.num_buckets
        params = self.load_or_learn_params(toks_delta, snapshot_id)
        # Legacy v1 outputs carry PLAIN string columns (no table file);
        # appending binary-encoded strings next to them would fork the
        # schema, so only encode strings when the snapshot already does.
        fsst_table = self._fsst_table(snapshot_id)
        salted = (toks_delta.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(nb)).cast("int"))
            .withColumn("snapshot_id", F.lit(snapshot_id)))
        affected = sorted(r["bucket"] for r in
                          salted.select("bucket").distinct().collect())
        if strategy == "delta":
            return self._append_delta(salted, snapshot_id, params,
                                      fsst_table, affected)
        # -- rewrite strategy: purge crash orphans FIRST — this path's
        # _commit_wave advances the snapshot's lineage max commit_seq,
        # so an orphan delta from an append that died before its
        # lineage commit would otherwise end up at seq <= max forever
        # (readable as phantom committed rows, invisible to every later
        # purge).  Then fold pending deltas into the base so the bucket
        # rewrite sees ONE physical copy (a rewrite that ignored live
        # delta files would be silently superseded by them at read
        # time).
        self._purge_orphan_deltas(snapshot_id)
        delta_b = sorted(set(self._delta_buckets(snapshot_id))
                         & set(affected))
        if delta_b:
            self.compact(snapshot_id, delta_b)
        totals = {"docs": 0, "tokens": 0, "raw_bytes": 0, "comp_bytes": 0}
        waves = [affected[i:i + self.wave_buckets]
                 for i in range(0, len(affected), self.wave_buckets)]
        stage_root = _join(self.output_dir, "append_staging", snapshot_id)
        for wi, wave in enumerate(waves):
            t0 = time.perf_counter()
            part = salted.filter(F.col("bucket").isin(wave))
            enc = selector.encode_auto(part, params, allowed=self.allowed,
                                       passthrough=("bucket", "snapshot_id"))
            if fsst_table is not None:
                enc = fstr.encode_string_cols(enc, fsst_table,
                                              ("doc_id", "source"))
            paths = self._wave_paths(snapshot_id, wave)
            if paths:
                existing = (self.spark.read
                            .option("basePath", self.data_dir)
                            .parquet(*paths))
                if "row_xxh" in existing.columns:
                    existing = existing.drop("row_xxh")
                if mode == "upsert":
                    keys = enc.select(F.col("doc_id").alias("_k")).distinct()
                    existing = (existing.join(
                        keys, existing["doc_id"] == keys["_k"], "left_anti"))
                combined = existing.select(*enc.columns).unionByName(enc)
            else:
                combined = enc
            combined = (combined.withColumn("row_xxh",
                                            F.xxhash64("payload"))
                        .sortWithinPartitions("bucket", "doc_id"))
            stage = _join(stage_root, f"wave{wi}")
            (combined.write.mode("overwrite")
             .partitionBy("snapshot_id", "bucket").parquet(stage))
            (self._base_writer(
                self.spark.read.option("basePath", stage).parquet(
                    *[_join(stage, f"snapshot_id={snapshot_id}",
                            f"bucket={b}")
                      for b in wave
                      if self.fs.exists(_join(stage,
                                              f"snapshot_id={snapshot_id}",
                                              f"bucket={b}"))]))
             .mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("snapshot_id", "bucket")
             .parquet(self.data_dir))
            wall = time.perf_counter() - t0
            for r in self._commit_wave(snapshot_id, wave, wall):
                for k in totals:
                    totals[k] += int(r[k])
        if self.fs.exists(stage_root):
            self.fs.delete(stage_root, recursive=True)
        return PipelineResult(snapshot_id, len(affected),
                              nb - len(affected), totals["docs"],
                              totals["tokens"], totals["raw_bytes"],
                              totals["comp_bytes"])

    def _append_delta(self, salted: DataFrame, snapshot_id: str,
                      params: IbpParams, fsst_table,
                      affected: list) -> PipelineResult:
        """O(delta) upsert: encode ONLY the delta, land it as
        per-bucket delta files, and commit superseding lineage rows
        whose stats are updated INCREMENTALLY —
        ``new_xxh = old_xxh ^ xor(replaced row hashes) ^ xor(added
        row hashes)`` — from thin columns (doc_id, codec, counts,
        row_xxh).  The bucket's payload bytes are neither read in bulk
        nor rewritten, which is what moves a 20-doc upsert out of the
        O(bucket) cost class.  Read-side semantics are always
        latest-wins upsert (see ``_resolved``)."""
        nb = self.num_buckets
        totals = {"docs": 0, "tokens": 0, "raw_bytes": 0, "comp_bytes": 0}
        # Crash-retry hygiene: an attempt that died between the delta
        # write and the lineage commit left orphan delta dirs whose seq
        # never made it into lineage.  They must go before the
        # replaced-stats read — otherwise repl would subtract the
        # orphan rows instead of the base rows they superseded.  The
        # purge keys on the SNAPSHOT's lineage max (every committed
        # delta_seq <= it), so it catches orphans even when other
        # snapshots advanced the global sequence since the crash.
        self._purge_orphan_deltas(snapshot_id)
        # ONE wave: waves exist to bound the memory of bucket REWRITES,
        # but a delta wave's work is O(delta) regardless of how many
        # buckets it salts into — splitting it would only multiply the
        # fixed per-wave job overhead (scan, commit, lineage append)
        waves = [affected] if affected else []
        for wave in waves:
            t0 = time.perf_counter()
            part = salted.filter(F.col("bucket").isin(wave))
            enc = selector.encode_auto(part, params, allowed=self.allowed,
                                       passthrough=("bucket", "snapshot_id"))
            if fsst_table is not None:
                enc = fstr.encode_string_cols(enc, fsst_table,
                                              ("doc_id", "source"))
            enc = enc.withColumn("row_xxh", F.xxhash64("payload"))
            seq = self._next_commit_seq()
            enc = enc.withColumn("delta_seq", F.lit(seq).cast("long"))
            # Stats of the rows this delta SUPERSEDES, computed from
            # the pre-delta resolved view restricted (broadcast
            # semi-join) to the delta's keys.
            keys = (part.select("snapshot_id", "doc_id").distinct())
            if fsst_table is not None:
                keys = fstr.encode_string_cols(keys, fsst_table,
                                               ("doc_id",))
            repl = self._replaced_stats(snapshot_id, wave, keys)
            (enc.write.mode("append")
             .partitionBy("snapshot_id", "bucket", "delta_seq")
             .parquet(self.delta_dir))
            # read BACK the written delta (thin columns) for the added
            # stats — same read-back discipline as _commit_wave, and it
            # avoids evaluating the encode twice
            new_paths = [
                _join(self.delta_dir, f"snapshot_id={snapshot_id}",
                      f"bucket={b}", f"delta_seq={seq}")
                for b in wave]
            new_paths = [p for p in new_paths if self.fs.exists(p)]
            added = []
            if new_paths:
                written = (self.spark.read
                           .option("basePath", self.delta_dir)
                           .parquet(*new_paths))
                added = (written.groupBy("bucket", "codec").agg(
                    F.count(F.lit(1)).alias("docs"),
                    F.sum("n_tok").alias("tokens"),
                    F.sum("raw_bytes").alias("raw_bytes"),
                    F.sum("comp_bytes").alias("comp_bytes"),
                    F.expr("bit_xor(row_xxh)").alias("xxh"))
                    .collect())
            wall = time.perf_counter() - t0
            for r in self._commit_delta_wave(snapshot_id, wave, repl,
                                             added, wall, seq):
                for k in totals:
                    totals[k] += int(r[k])
        self._maybe_compact_deltas(snapshot_id, affected)
        return PipelineResult(snapshot_id, len(affected),
                              nb - len(affected), totals["docs"],
                              totals["tokens"], totals["raw_bytes"],
                              totals["comp_bytes"])

    def _replaced_stats(self, snapshot_id: str, wave, keys) -> list:
        """Per-(bucket, codec) stats of the CURRENT rows matching
        ``keys`` (a DataFrame of (snapshot_id, doc_id) with doc_id
        already encoded to the storage layout) — the rows a delta
        upsert or tombstone delete supersedes.  row_xxh keeps the scan
        thin; a legacy base without the column (or with null rows in
        it) falls back to hashing payload for this wave (documented
        degradation)."""
        try:
            cur = self._resolved(snapshot_id, wave)
        except ValueError:
            return []
        matched = cur.join(F.broadcast(keys),
                           ["snapshot_id", "doc_id"], "left_semi")

        def _repl_agg(hx):
            return (matched.withColumn("_hx", hx)
                    .groupBy("bucket", "codec").agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_tok").alias("tokens"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("comp_bytes").alias("comp_bytes"),
                F.expr("bit_xor(_hx)").alias("xxh"),
                F.sum(F.when(F.col("_hx").isNull(), 1)
                      .otherwise(0)).alias("nulls"))
                .collect())

        # thin path: the persisted row hash keeps payload bytes
        # UNREAD.  Only a legacy base (files written before row_xxh
        # existed => nulls) forces the degraded pass.
        if "row_xxh" in cur.columns:
            repl = _repl_agg(F.col("row_xxh"))
            if any(int(r["nulls"] or 0) > 0 for r in repl):
                repl = _repl_agg(F.xxhash64("payload"))
        else:
            repl = _repl_agg(F.xxhash64("payload"))
        return repl

    def _commit_delta_wave(self, snapshot_id: str, wave, repl, added,
                           wall: float, seq: int) -> list:
        """Superseding lineage rows for a delta wave: per bucket,
        old stats minus replaced plus added (counts subtract/add, the
        XOR-fold composes exactly: x ^ x cancels a replaced row's
        hash).  ``seq`` is the SAME sequence number the delta files
        were written under — committing lineage at the delta's own seq
        is what makes 'committed delta_seq <= snapshot lineage max'
        a structural invariant (the orphan purge depends on it).
        Returns the per-bucket ADDED-minus-REPLACED dicts so the
        caller's running totals stay meaningful."""
        old = self._latest_lineage_map(snapshot_id, wave)
        agg: dict[int, dict] = {}

        def acc(rows, sign):
            for r in rows:
                b = int(r["bucket"])
                a = agg.setdefault(b, {
                    "bucket": b, "docs": 0, "tokens": 0, "raw_bytes": 0,
                    "comp_bytes": 0, "xxh": 0, "mix": {}})
                for k in ("docs", "tokens", "raw_bytes", "comp_bytes"):
                    a[k] += sign * int(r[k])
                a["xxh"] ^= int(r["xxh"] or 0)
                c = r["codec"]
                a["mix"][c] = a["mix"].get(c, 0) + sign * int(r["docs"])

        acc(repl, -1)
        acc(added, +1)
        now = time.time()
        rows, out = [], []
        for b in wave:
            d = agg.get(b)
            if d is None:
                continue
            o = old.get(b)
            omix = json.loads(o["codec_mix"]) if o else {}
            for c, n in d["mix"].items():
                omix[c] = omix.get(c, 0) + n
            omix = {c: n for c, n in omix.items() if n > 0}
            rows.append((
                snapshot_id, b, "committed",
                (int(o["docs"]) if o else 0) + d["docs"],
                (int(o["tokens"]) if o else 0) + d["tokens"],
                (int(o["raw_bytes"]) if o else 0) + d["raw_bytes"],
                (int(o["comp_bytes"]) if o else 0) + d["comp_bytes"],
                json.dumps(omix, sort_keys=True),
                (int(o["payload_xxh"]) if o else 0) ^ d["xxh"],
                wall / max(len(wave), 1), now, seq))
            out.append({k: d[k] for k in
                        ("docs", "tokens", "raw_bytes", "comp_bytes")})
        if rows:
            self._append_lineage_rows(rows)
        return out

    def compact_lineage(self) -> int:
        """Fold the lineage's one-file-per-commit history into a single
        file of LATEST rows.  Every wave/delta commit appends one small
        parquet file, so a long-lived pipeline (streaming upserts
        especially) accumulates files and every lineage read pays a
        growing listing.  Readers only ever consume the newest row per
        (snapshot, bucket) — :meth:`latest_lineage` — so compaction
        keeps exactly those rows; ``commit_seq`` is preserved, so
        monotonicity continues across the compaction.  The swap is
        write-to-tmp-dir + two renames (the same non-atomic-rename
        window as every metadata write; run it as maintenance, not
        concurrently with commits).  Returns rows kept."""
        from pyspark.sql import Window

        lin = self.lineage()
        rows = lin.count()
        if rows == 0:
            return 0
        w = (Window.partitionBy("snapshot_id", "bucket")
             .orderBy(F.desc("commit_seq"), F.desc("committed_at")))
        latest = (lin.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))
        tmp = self.lineage_dir + ".compact"
        old = self.lineage_dir + ".old"
        if self.fs.exists(tmp):
            self.fs.delete(tmp, recursive=True)
        (latest.select(*[f.split(" ")[0] for f in
                         LINEAGE_SCHEMA.split(", ")])
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        kept = self.spark.read.parquet(tmp).count()
        if self.fs.exists(old):
            self.fs.delete(old, recursive=True)
        self.fs.rename(self.lineage_dir, old)
        self.fs.rename(tmp, self.lineage_dir)
        self.fs.delete(old, recursive=True)
        return int(kept)

    def compact(self, snapshot_id: str, buckets=None) -> PipelineResult:
        """Fold delta files back into the base: rewrite each affected
        bucket from its RESOLVED view (the one-time O(bucket) cost
        delta appends deferred), drop the bucket's delta dirs, and
        re-commit lineage from a full read-back — which also resets any
        accumulated incremental-stat drift to ground truth.  Same
        staged dynamic-partition-overwrite commit as the rewrite path;
        crash-safe at every step because base ⊕ deltas resolve to the
        same logical rows before AND after each transition.  Orphan
        delta dirs from a crashed append are purged first — folding
        them into the base would promote uncommitted rows to committed
        state."""
        self._purge_orphan_deltas(snapshot_id)
        have = self._delta_buckets(snapshot_id)
        if buckets is not None:
            have = [b for b in have if b in set(buckets)]
        nb = self.num_buckets
        if not have:
            return PipelineResult(snapshot_id, 0, nb, 0, 0, 0, 0)
        totals = {"docs": 0, "tokens": 0, "raw_bytes": 0, "comp_bytes": 0}
        waves = [have[i:i + self.wave_buckets]
                 for i in range(0, len(have), self.wave_buckets)]
        stage_root = _join(self.output_dir, "compact_staging", snapshot_id)
        for wi, wave in enumerate(waves):
            t0 = time.perf_counter()
            resolved = self._resolved(snapshot_id, wave)
            if "row_xxh" in resolved.columns:
                resolved = resolved.drop("row_xxh")
            resolved = (resolved.withColumn("row_xxh",
                                            F.xxhash64("payload"))
                        .sortWithinPartitions("bucket", "doc_id"))
            stage = _join(stage_root, f"wave{wi}")
            (resolved.write.mode("overwrite")
             .partitionBy("snapshot_id", "bucket").parquet(stage))
            staged_dirs = [
                _join(stage, f"snapshot_id={snapshot_id}", f"bucket={b}")
                for b in wave
                if self.fs.exists(_join(stage, f"snapshot_id={snapshot_id}",
                                        f"bucket={b}"))]
            if staged_dirs:
                (self._base_writer(self.spark.read.option("basePath", stage)
                                   .parquet(*staged_dirs))
                 .mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("snapshot_id", "bucket")
                 .parquet(self.data_dir))
            # a bucket whose every document was tombstoned resolves to
            # ZERO rows — no staged dir, so dynamic overwrite leaves the
            # old base files untouched; dropping the delta dirs below
            # would then resurrect the deleted documents.  Drop the data
            # dir outright (same rule as the erasure-delete path).
            staged_set = set(staged_dirs)
            for b in wave:
                if (_join(stage, f"snapshot_id={snapshot_id}",
                          f"bucket={b}") not in staged_set):
                    ddir = _join(self.data_dir,
                                 f"snapshot_id={snapshot_id}",
                                 f"bucket={b}")
                    if self.fs.exists(ddir):
                        self.fs.delete(ddir, recursive=True)
            for b in wave:
                self.fs.delete(
                    _join(self.delta_dir, f"snapshot_id={snapshot_id}",
                          f"bucket={b}"), recursive=True)
            # fully-drained snapshot: drop the now-empty delta dir so
            # multi-snapshot readers never try to infer a schema from it
            snap_dir = _join(self.delta_dir, f"snapshot_id={snapshot_id}")
            if not any(c.startswith("bucket=")
                       for c in self.fs.listdir(snap_dir)):
                self.fs.delete(snap_dir, recursive=True)
            wall = time.perf_counter() - t0
            for r in self._commit_wave(snapshot_id, wave, wall):
                for k in totals:
                    totals[k] += int(r[k])
        if self.fs.exists(stage_root):
            self.fs.delete(stage_root, recursive=True)
        return PipelineResult(snapshot_id, len(have), nb - len(have),
                              totals["docs"], totals["tokens"],
                              totals["raw_bytes"], totals["comp_bytes"])

    def delete(self, ids: DataFrame, snapshot_id: str,
               strategy: str = "tombstone") -> PipelineResult:
        """Delete documents from a committed snapshot.

        - ``strategy="tombstone"`` (default): O(delta) LOGICAL delete —
          one marker row per existing victim lands in the delta tree
          (codec ``tombstone``, winning latest-wins resolution), a
          superseding lineage commit subtracts the victims' stats from
          thin columns, and every read path (``read_encoded``,
          ``fetch``, ``verify_checksums``) sees the documents as gone
          — while the base bucket files stay byte-identical.  Physical
          erasure happens at the next :meth:`compact` of those
          buckets, which rewrites the base from the resolved view
          (markers excluded) and drops the delta files.  Cost is
          independent of bucket payload size: the only base read is
          the thin-column stats pass.
        - ``strategy="erasure"``: immediate physical rewrite of the
          buckets the ids salt into — the right-to-erasure operation,
          same staged dynamic-partition-overwrite commit as
          :meth:`append`'s rewrite path; pays O(bucket) per affected
          bucket.  Equivalent to tombstone-then-compact.

        ``ids`` is a DataFrame with a plain-string ``doc_id`` column;
        matching against the stored table happens on FSST-encoded
        bytes exactly like upsert.  Deleting ids that don't exist is a
        no-op either way (tombstone writes no marker for them;
        erasure rewrites the bucket byte-identical) — idempotent."""
        if strategy not in ("tombstone", "erasure"):
            raise ValueError(f"delete: unknown strategy {strategy!r}")
        done = self.committed_buckets(snapshot_id)
        if len(done) < self.num_buckets:
            raise ValueError(
                f"delete: snapshot {snapshot_id!r} has "
                f"{len(done)}/{self.num_buckets} buckets committed — "
                "finish run() before deleting")
        nb = self.num_buckets
        fsst_table = self._fsst_table(snapshot_id)
        if strategy == "tombstone":
            # Bounded victim sets take the driver fast path: the bucket
            # salt and FSST key encoding are computed driver-side
            # (exactly as fetch() does), so the whole verb costs ONE
            # thin-column scan + one marker write instead of four-plus
            # scheduler round trips.  An id set too large to collect
            # falls back to the DataFrame path below.
            id_list = self._collect_delete_ids(ids)
            if id_list is not None:
                return self._delete_tombstone_fast(id_list, snapshot_id,
                                                   fsst_table)
        salted = ids.select(
            F.col("doc_id").cast("string").alias("doc_id")).withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(nb)).cast("int"))
        affected = sorted(r["bucket"] for r in
                          salted.select("bucket").distinct().collect())
        if strategy == "tombstone":
            return self._delete_tombstone(salted, snapshot_id,
                                          fsst_table, affected)
        # Purge crash orphans unconditionally before the erasure
        # rewrite: its _commit_wave advances the lineage max
        # commit_seq, which would legitimize any orphan delta sitting
        # above the old max (same hazard as append's rewrite path).
        self._purge_orphan_deltas(snapshot_id)
        # merge-on-read: fold affected buckets' deltas into the base
        # first so erasure rewrites the ONE physical copy (delta rows
        # left behind would resurrect deleted documents at read time)
        delta_b = sorted(set(self._delta_buckets(snapshot_id))
                         & set(affected))
        if delta_b:
            self.compact(snapshot_id, delta_b)
        totals = {"docs": 0, "tokens": 0, "raw_bytes": 0, "comp_bytes": 0}
        waves = [affected[i:i + self.wave_buckets]
                 for i in range(0, len(affected), self.wave_buckets)]
        stage_root = _join(self.output_dir, "delete_staging", snapshot_id)
        for wi, wave in enumerate(waves):
            t0 = time.perf_counter()
            paths = self._wave_paths(snapshot_id, wave)
            if not paths:
                continue
            keys = salted.filter(F.col("bucket").isin(wave))
            if fsst_table is not None:
                keys = fstr.encode_string_cols(keys, fsst_table, ("doc_id",))
            keys = keys.select(F.col("doc_id").alias("_k")).distinct()
            existing = (self.spark.read
                        .option("basePath", self.data_dir)
                        .parquet(*paths))
            kept = existing.join(keys, existing["doc_id"] == keys["_k"],
                                 "left_anti")
            stage = _join(stage_root, f"wave{wi}")
            (kept.write.mode("overwrite")
             .partitionBy("snapshot_id", "bucket").parquet(stage))
            staged_dirs = [
                _join(stage, f"snapshot_id={snapshot_id}", f"bucket={b}")
                for b in wave
                if self.fs.exists(_join(stage, f"snapshot_id={snapshot_id}",
                                        f"bucket={b}"))]
            if staged_dirs:
                (self._base_writer(self.spark.read.option("basePath", stage)
                                   .parquet(*staged_dirs))
                 .mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("snapshot_id", "bucket")
                 .parquet(self.data_dir))
            # Per-bucket: dynamic partition overwrite rewrites ONLY the
            # partitions present in the staged frame, so a bucket whose
            # every document was deleted (no staged dir) must have its
            # data dir dropped outright — even when the same wave also
            # carries partially-emptied buckets.  Gating this on
            # staged_dirs being entirely empty left fully-emptied
            # buckets' old files in place (a right-to-erasure
            # violation that verify_checksums couldn't see, because
            # _commit_wave would re-commit the stale bucket's stats).
            staged_set = set(staged_dirs)
            for b in wave:
                ddir = _join(self.data_dir, f"snapshot_id={snapshot_id}",
                             f"bucket={b}")
                sdir = _join(stage, f"snapshot_id={snapshot_id}",
                             f"bucket={b}")
                if sdir not in staged_set and self.fs.exists(ddir):
                    self.fs.delete(ddir, recursive=True)
            wall = time.perf_counter() - t0
            for r in self._commit_wave(snapshot_id, wave, wall):
                for k in totals:
                    totals[k] += int(r[k])
        if self.fs.exists(stage_root):
            self.fs.delete(stage_root, recursive=True)
        return PipelineResult(snapshot_id, len(affected),
                              nb - len(affected), totals["docs"],
                              totals["tokens"], totals["raw_bytes"],
                              totals["comp_bytes"])

    # ids below this bound are deleted via the driver fast path (collect
    # the id strings, salt/encode them driver-side); larger sets keep the
    # DataFrame path.  100k ids ~= a few MB of driver strings — the same
    # cost class as fetch()'s id list and the delta-append key broadcast.
    MAX_DRIVER_DELETE_IDS = 100_000

    def _collect_delete_ids(self, ids: DataFrame) -> list | None:
        """The distinct requested doc_ids as a driver-side sorted list,
        or None when the set exceeds MAX_DRIVER_DELETE_IDS (caller
        falls back to the DataFrame path).  Plain collect, not
        limit+collect: CollectLimit costs ~0.18 s extra per call
        (measured) and offers no memory protection this path doesn't
        already have — the DataFrame fallback materializes the same
        key set driver-side when building its broadcast."""
        cap = self.MAX_DRIVER_DELETE_IDS
        rows = (ids.select(F.col("doc_id").cast("string").alias("doc_id"))
                .collect())
        if len(rows) > cap:
            return None
        return sorted({r["doc_id"] for r in rows})

    def _delete_tombstone_fast(self, id_list: list, snapshot_id: str,
                               fsst_table) -> PipelineResult:
        """Driver fast path of the O(delta) tombstone delete — same
        markers, same lineage rows, same idempotence as
        :meth:`_delete_tombstone`, structured as exactly ONE
        distributed scan plus one tiny write:

        1. bucket salt + FSST key encoding driver-side (fetch()'s
           trick: the encoding is deterministic, byte equality IS id
           equality), so the victim lookup is a literal ``IN``
           predicate that reaches the parquet scan as a PushedFilter —
           row groups are skipped by doc_id min/max AND the doc_id
           bloom filter, where the old broadcast semi-join could only
           prune whole files;
        2. one thin-column scan collects the victims' (bucket, doc_id,
           codec, n_tok, raw_bytes, comp_bytes, row_xxh) — bounded by
           len(id_list) — and the replaced-stats aggregation happens
           driver-side (sums and XOR-folds compose identically);
        3. marker rows are BUILT driver-side from the collected
           victims (the old path re-ran the resolved-view semi-join a
           second time just to project three columns) and land as one
           single-partition write;
        4. lineage read/append ride the pyarrow metadata path —
           zero Spark jobs.

        Measured (sf0.1 store, 100-doc batch, local[32]): 5.0 s -> the
        q9 number in OPTIMIZATION_r08.md; phase breakdown in
        scripts/profile_r08.py."""
        nb = self.num_buckets
        self._purge_orphan_deltas(snapshot_id)
        from ..functions.hashing import bucket_of

        affected = sorted({bucket_of(d, nb) for d in id_list})
        if not affected:
            return PipelineResult(snapshot_id, 0, nb, 0, 0, 0, 0)
        t0 = time.perf_counter()
        try:
            cur = self._resolved(snapshot_id, affected)
        except ValueError:
            return PipelineResult(snapshot_id, 0, nb, 0, 0, 0, 0)
        is_binary = dict(cur.dtypes).get("doc_id") == "binary"
        if fsst_table is not None and is_binary:
            key_vals = fstr.encode_id_literals(id_list, fsst_table)
        else:
            key_vals = id_list
        hits = cur.filter(F.col("doc_id").isin(key_vals))
        thin = ["bucket", "doc_id", "codec", "n_tok",
                "raw_bytes", "comp_bytes"]
        if "row_xxh" in cur.columns:
            victims = hits.select(*thin, "row_xxh").collect()
            if any(r["row_xxh"] is None for r in victims):
                # legacy base without persisted row hashes: one more
                # pass hashing payload (documented degradation, same
                # as _replaced_stats)
                victims = hits.select(
                    *thin, F.xxhash64("payload").alias("row_xxh")
                ).collect()
        else:
            victims = hits.select(
                *thin, F.xxhash64("payload").alias("row_xxh")).collect()
        if not victims:
            # nothing matched: pure ghost delete, a no-op
            return PipelineResult(snapshot_id, 0, nb, 0, 0, 0, 0)
        # replaced-stats at (bucket, codec) grain, composed driver-side
        # exactly as the _replaced_stats aggregation would (sums of
        # sums; XOR of XOR-folds)
        repl_agg: dict[tuple, dict] = {}
        for r in victims:
            k = (int(r["bucket"]), r["codec"])
            a = repl_agg.setdefault(k, {
                "bucket": k[0], "codec": k[1], "docs": 0, "tokens": 0,
                "raw_bytes": 0, "comp_bytes": 0, "xxh": 0})
            a["docs"] += 1
            a["tokens"] += int(r["n_tok"])
            a["raw_bytes"] += int(r["raw_bytes"])
            a["comp_bytes"] += int(r["comp_bytes"])
            a["xxh"] ^= int(r["row_xxh"])
        repl = list(repl_agg.values())
        seq = self._next_commit_seq()
        if not self._write_tombstones_local(snapshot_id, seq, victims,
                                            is_binary, fsst_table):
            src_t = "binary" if fsst_table is not None else "string"
            id_t = "binary" if is_binary else "string"
            tomb_schema = (
                f"snapshot_id string, doc_id {id_t}, bucket int, "
                f"source {src_t}, n_tok int, n_blocks int, "
                "block_sizes array<int>, block_flags binary, "
                "payload binary, comp_bytes long, raw_bytes long, "
                "codec string, row_xxh long, delta_seq long")
            tomb_rows = [
                (snapshot_id,
                 bytes(r["doc_id"]) if is_binary else r["doc_id"],
                 int(r["bucket"]), None, 0, 0, [], None, None, 0, 0,
                 TOMBSTONE_CODEC, 0, seq)
                for r in victims]
            tomb = self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(tomb_rows, 1),
                tomb_schema)
            (tomb.write.mode("append")
             .partitionBy("snapshot_id", "bucket", "delta_seq")
             .parquet(self.delta_dir))
        wall = time.perf_counter() - t0
        totals = {"docs": 0, "tokens": 0, "raw_bytes": 0, "comp_bytes": 0}
        for r in self._commit_delta_wave(snapshot_id, affected, repl, [],
                                         wall, seq):
            for k in totals:
                totals[k] -= int(r[k])  # removed amounts, as positives
        self._maybe_compact_deltas(snapshot_id, affected)
        return PipelineResult(snapshot_id, len(affected),
                              nb - len(affected), totals["docs"],
                              totals["tokens"], totals["raw_bytes"],
                              totals["comp_bytes"])

    def _write_tombstones_local(self, snapshot_id: str, seq: int,
                                victims, is_binary: bool,
                                fsst_table) -> bool:
        """Driver-side tombstone-marker write for LOCAL stores: the
        markers are <= len(ids) rows spread over <= num_buckets delta
        dirs, but the Spark dynamic-partition write paid ~1.0 s of
        commit-protocol fixed cost (measured, 100 rows / 32 dirs /
        local[32]).  One pyarrow file per bucket dir, tmp + rename,
        column types matching the Spark-written delta files exactly.
        Returns False when the store is not local (caller uses the
        Spark write)."""
        from .fsio import local_root

        root = local_root(self.delta_dir)
        if root is None:
            return False
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        id_t = pa.binary() if is_binary else pa.string()
        src_t = pa.binary() if fsst_table is not None else pa.string()
        schema = pa.schema([
            ("doc_id", id_t), ("source", src_t),
            ("n_tok", pa.int32()), ("n_blocks", pa.int32()),
            ("block_sizes", pa.list_(pa.int32())),
            ("block_flags", pa.binary()), ("payload", pa.binary()),
            ("comp_bytes", pa.int64()), ("raw_bytes", pa.int64()),
            ("codec", pa.string()), ("row_xxh", pa.int64()),
        ])
        by_bucket: dict[int, list] = {}
        for r in victims:
            by_bucket.setdefault(int(r["bucket"]), []).append(
                bytes(r["doc_id"]) if is_binary else r["doc_id"])
        for b, ids in sorted(by_bucket.items()):
            n = len(ids)
            table = pa.table({
                "doc_id": pa.array(ids, id_t),
                "source": pa.array([None] * n, src_t),
                "n_tok": pa.array([0] * n, pa.int32()),
                "n_blocks": pa.array([0] * n, pa.int32()),
                "block_sizes": pa.array([[]] * n, pa.list_(pa.int32())),
                "block_flags": pa.array([None] * n, pa.binary()),
                "payload": pa.array([None] * n, pa.binary()),
                "comp_bytes": pa.array([0] * n, pa.int64()),
                "raw_bytes": pa.array([0] * n, pa.int64()),
                "codec": pa.array([TOMBSTONE_CODEC] * n, pa.string()),
                "row_xxh": pa.array([0] * n, pa.int64()),
            }, schema=schema)
            d = os.path.join(root, f"snapshot_id={snapshot_id}",
                             f"bucket={b}", f"delta_seq={seq}")
            os.makedirs(d, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(d, f".{name}.tmp")
            pq.write_table(table, tmp, compression="snappy")
            os.replace(tmp, os.path.join(d, name))
        return True

    def _delete_tombstone(self, salted: DataFrame, snapshot_id: str,
                          fsst_table, affected: list) -> PipelineResult:
        """O(delta) delete: per existing victim, one marker row with
        codec ``tombstone`` in the delta tree at a fresh delta_seq —
        latest-wins resolution then shadows the base row and the
        tombstone itself is filtered from every resolved view.  Stats
        are subtracted incrementally via the same thin-column
        replaced-stats pass as delta appends (XOR checksum algebra
        composes: removing a row XORs its hash back out), so
        ``verify_checksums`` is green immediately.  Ghost ids write no
        marker (the victim set is the semi-join of the resolved view
        with the requested keys), keeping the committed-delta-has-
        lineage invariant intact."""
        nb = self.num_buckets
        self._purge_orphan_deltas(snapshot_id)
        if not affected:
            return PipelineResult(snapshot_id, 0, nb, 0, 0, 0, 0)
        t0 = time.perf_counter()
        keys = salted.withColumn("snapshot_id", F.lit(snapshot_id))
        if fsst_table is not None:
            keys = fstr.encode_string_cols(keys, fsst_table, ("doc_id",))
        keys = keys.select("snapshot_id", "doc_id").distinct()
        try:
            cur = self._resolved(snapshot_id, affected)
        except ValueError:
            return PipelineResult(snapshot_id, 0, nb, 0, 0, 0, 0)
        repl = self._replaced_stats(snapshot_id, affected, keys)
        if not repl:
            # nothing matched: pure ghost delete, a no-op
            return PipelineResult(snapshot_id, 0, nb, 0, 0, 0, 0)
        seq = self._next_commit_seq()
        src_t = "binary" if fsst_table is not None else "string"
        tomb = (cur.join(F.broadcast(keys), ["snapshot_id", "doc_id"],
                         "left_semi")
                .select("snapshot_id", "doc_id", "bucket")
                .withColumn("source", F.lit(None).cast(src_t))
                .withColumn("n_tok", F.lit(0).cast("int"))
                .withColumn("n_blocks", F.lit(0).cast("int"))
                .withColumn("block_sizes",
                            F.expr("array()").cast("array<int>"))
                .withColumn("block_flags", F.lit(None).cast("binary"))
                .withColumn("payload", F.lit(None).cast("binary"))
                .withColumn("comp_bytes", F.lit(0).cast("long"))
                .withColumn("raw_bytes", F.lit(0).cast("long"))
                .withColumn("codec", F.lit(TOMBSTONE_CODEC))
                .withColumn("row_xxh", F.lit(0).cast("long"))
                .withColumn("delta_seq", F.lit(seq).cast("long")))
        (tomb.write.mode("append")
         .partitionBy("snapshot_id", "bucket", "delta_seq")
         .parquet(self.delta_dir))
        wall = time.perf_counter() - t0
        totals = {"docs": 0, "tokens": 0, "raw_bytes": 0, "comp_bytes": 0}
        for r in self._commit_delta_wave(snapshot_id, affected, repl, [],
                                         wall, seq):
            for k in totals:
                totals[k] -= int(r[k])  # removed amounts, as positives
        self._maybe_compact_deltas(snapshot_id, affected)
        return PipelineResult(snapshot_id, len(affected),
                              nb - len(affected), totals["docs"],
                              totals["tokens"], totals["raw_bytes"],
                              totals["comp_bytes"])

    def cleanup_staging(self, snapshot_id: str) -> None:
        """Drop the staged (uncompressed) copy once every bucket of the
        snapshot is committed — it exists only to make waves prunable."""
        done = self.committed_buckets(snapshot_id)
        if len(done) >= self.num_buckets:
            staging = _join(self.output_dir, "staging", snapshot_id)
            if self.fs.exists(staging):
                self.fs.delete(staging, recursive=True)

    def read_encoded(self, snapshot_id: str | None = None,
                     as_of_seq: int | None = None) -> DataFrame:
        """Encoded table; partition pruning on (snapshot_id, bucket)
        dirs makes per-snapshot reads touch only their own files.

        ``as_of_seq`` is SNAPSHOT TIME TRAVEL: read the table as it
        stood when lineage commit_seq was ``as_of_seq`` — delta files
        (upserts AND tombstone deletes) with ``delta_seq > as_of_seq``
        are ignored, so superseded rows come back bit-identical.
        History is bounded by garbage collection: :meth:`compact`
        folds deltas into the base and deletes them, so as-of reads
        older than the last compaction of a bucket return the
        compacted (current-base) state for that bucket.  Requires a
        ``snapshot_id``.
        String columns decode transparently via the persisted global
        FSST table when the data dir carries the v2 (FSST) layout;
        legacy dirs (plain string columns, no fsst_table.json) read
        unchanged — detected both by the table file's presence and by
        the columns' actual parquet types, so a v1 directory never hits
        a FileNotFoundError or a spurious binary decode.  The view is
        the RESOLVED state: base rows superseded by merge-on-read
        deltas are replaced by the latest delta rows."""
        if as_of_seq is not None and snapshot_id is None:
            raise ValueError("read_encoded: as_of_seq needs a snapshot_id")
        try:
            df = self._resolved(snapshot_id, as_of_seq=as_of_seq)
        except ValueError:
            # a COMMITTED snapshot can legitimately hold zero rows
            # (every document tombstone-deleted, then compacted: all
            # bucket dirs dropped).  That is an empty table, not an
            # error — raising here broke the delete-everything
            # lifecycle.  With no lineage either, the path truly holds
            # nothing and the error stands.
            if (snapshot_id is None
                    or not self.committed_buckets(snapshot_id)):
                raise
            return self.spark.createDataFrame([], EMPTY_READ_SCHEMA)
        if "row_xxh" in df.columns:
            df = df.drop("row_xxh")
        enc_cols = tuple(
            c for c in ("doc_id", "source")
            if dict(df.dtypes).get(c) == "binary")
        if not enc_cols:
            return df
        if snapshot_id is not None:
            table = self._fsst_table(snapshot_id)
            if table is None:
                return df
            return fstr.decode_string_cols(df, table, enc_cols)
        # multi-snapshot read: snapshots may have EVOLVED onto their
        # own tables; group them by resolved table file and decode each
        # group with its table (distinct on the partition column is a
        # listing-level scan, one row per snapshot)
        snaps = [r[0] for r in df.select("snapshot_id")
                 .distinct().collect()]
        groups: dict = {}
        for s in snaps:
            groups.setdefault(self._fsst_path(s), []).append(s)
        if len(groups) == 1:
            path = next(iter(groups))
            if path is None:
                return df
            return fstr.decode_string_cols(df, self._fsst_table(snaps[0]),
                                           enc_cols)
        parts = []
        for path, ss in groups.items():
            sub = df.filter(F.col("snapshot_id").isin(ss))
            if path is None:
                parts.append(sub)
            else:
                parts.append(fstr.decode_string_cols(
                    sub, self._fsst_table(ss[0]), enc_cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def fetch(self, ids, snapshot_id: str, decode: bool = True,
              as_of_seq: int | None = None) -> DataFrame:
        """Store-level point fetch — "give me these documents", the
        most common operation against a compressed corpus store, and
        the durable twin of ``decompress_fetch(index_arr)`` (reference
        src/decompress.cu:56-98, proven at DataFrame level by the
        gather_decode query).

        ``ids`` is a bounded list of doc_id strings (a point lookup,
        not a scan).  Because ``bucket = xxhash64(doc_id) % nb`` is
        computable from the ids alone (one tiny local job, exactly as
        :meth:`append`/:meth:`delete` salt their deltas), the read
        lists ONLY the ids' own bucket directories — a 10-doc fetch
        from a 100 TB snapshot opens <= 10 bucket dirs instead of
        listing every partition the way :meth:`read_encoded` must.
        Inside those buckets a broadcast semi-join on the
        FSST-encoded doc_id bytes selects the hits (deterministic
        encoding => byte equality IS id equality, no decode pass),
        and only the hits are decoded.

        ``decode=False`` returns the matching ENCODED rows (payload,
        block_sizes, flags...) with string columns decoded — the
        store-side gather for consumers that ship blobs onward.
        ``as_of_seq`` time-travels the lookup (see
        :meth:`read_encoded`): upserts and tombstone deletes after
        that lineage commit are invisible."""
        from ..operators import selector

        from ..functions.hashing import bucket_of

        ids = [str(i) for i in ids]
        nb = self.num_buckets
        # bucket salt computed DRIVER-side (pure-Python XXH64, pinned
        # bit-equal to Spark's xxhash64) — a point lookup should not
        # pay a scheduler round-trip just to hash ten strings
        buckets = sorted({bucket_of(i, nb) for i in ids})
        paths = self._wave_paths(snapshot_id, buckets)
        params = self._load_params(snapshot_id)
        if not paths and not self._delta_paths(snapshot_id, buckets):
            # Nothing stored in any target bucket.  The empty frame
            # must carry the SAME schema the non-empty path would
            # return — the decoded shape for this snapshot's params
            # (float corpora decode to array<float>), or the encoded
            # row shape when decode=False — so unions with non-empty
            # fetches stay well-typed.
            if not decode:
                return self.spark.createDataFrame([], EMPTY_READ_SCHEMA)
            return self.spark.createDataFrame(
                [], selector.decoded_schema(params))
        enc = self._resolved(snapshot_id, buckets, as_of_seq=as_of_seq)
        if "row_xxh" in enc.columns:
            enc = enc.drop("row_xxh")
        table = self._fsst_table(snapshot_id)
        is_binary = dict(enc.dtypes).get("doc_id") == "binary"
        if len(ids) <= 1024:
            # Literal IN predicate instead of a join: it reaches the
            # parquet scan as a PushedFilter, so the doc_id-CLUSTERED
            # row groups the write path lays down are SKIPPED by their
            # min/max stats — a broadcast join can never prune below
            # the file level.  Keys are FSST-encoded driver-side (the
            # encoding is deterministic, so literal byte equality IS id
            # equality).
            key_vals = (fstr.encode_id_literals(ids, table)
                        if is_binary and table is not None else ids)
            hits = enc.filter(F.col("doc_id").isin(key_vals))
        else:
            keys = self.spark.createDataFrame([(i,) for i in ids],
                                              "doc_id string")
            if table is not None and is_binary:
                keys = fstr.encode_string_cols(keys, table, ("doc_id",))
            hits = enc.join(F.broadcast(keys), "doc_id", "left_semi")
        enc_cols = tuple(c for c in ("doc_id", "source")
                         if dict(hits.dtypes).get(c) == "binary")
        if table is not None and enc_cols:
            hits = fstr.decode_string_cols(hits, table, enc_cols)
        if not decode:
            return hits
        return selector.decode_auto(hits, params)

    def verify_checksums(self, snapshot_id: str) -> int:
        """Integrity audit against lineage: recompute each committed
        bucket's payload XOR-fold from the written table and compare to
        the checksum recorded at commit time.  Returns the number of
        buckets that mismatch or vanished (0 == intact) — the read-side
        half of the north rule's per-partition metrics.  The audit runs
        over the RESOLVED view and recomputes hashes from the payload
        bytes themselves (a deep check — the persisted row_xxh column
        is deliberately not trusted here), so it also validates the
        incremental checksum math of delta commits."""
        try:
            enc = self._resolved(snapshot_id)
        except ValueError:
            # zero stored rows (fully-deleted snapshot): intact iff
            # lineage agrees nothing should be there
            return (self.latest_lineage(snapshot_id)
                    .filter(F.col("docs") > 0).count())
        got = enc.groupBy("bucket").agg(
            F.expr("bit_xor(xxhash64(payload))").alias("xxh"))
        # latest commit per bucket: appends supersede earlier rows
        lin = (self.latest_lineage(snapshot_id)
               .filter(F.col("docs") > 0)
               .select("bucket", "payload_xxh"))
        bad = (got.join(lin, "bucket")
               .filter(F.col("xxh") != F.col("payload_xxh")).count())
        missing = lin.join(got, "bucket", "left_anti").count()
        return bad + missing

    def verify_roundtrip(self, toks: DataFrame, params: IbpParams,
                         snapshot_id: str | None = None) -> int:
        """Full decode of the written table vs the source; returns the
        mismatch count PLUS the count of source documents missing from
        the table (0 == the corpus is complete and bit-identical).
        The missing half matters for a living snapshot: an inner join
        alone would silently pass a table that lost documents.

        Float snapshots compare on the IEEE integer bit view (see
        :func:`_float_bits_view`): value equality would wave through a
        0.0 that decoded as -0.0 or a NaN whose payload bits changed —
        the codec's contract is bit-identity, so the audit's is too."""
        dec = selector.decode_auto(self.read_encoded(snapshot_id), params)
        src = toks
        if params.value_kind.startswith("float"):
            isz = 8 if params.value_kind == "float64" else 4
            src = _float_bits_view(src, isz)
            dec = _float_bits_view(dec, isz)
        bad = (src.alias("a").join(dec.alias("b"), "doc_id")
               .filter((F.col("a.tokens") != F.col("b.tokens"))
                       | (F.col("a.n_tok") != F.col("b.n_tok")))
               .count())
        missing = src.join(dec.select("doc_id"), "doc_id",
                           "left_anti").count()
        return bad + missing
