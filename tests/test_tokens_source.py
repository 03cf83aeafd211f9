"""Determinism contract of the synthetic corpus writer.

Every recorded bench/oracle number is anchored to the seed-42 corpus,
and the 100x scale points reuse smaller corpora as prefixes — so the
chunked ParquetWriter path must produce bit-identical rows at every
size, and a prefix of a larger corpus must equal the smaller corpus."""

import numpy as np
import pytest

from invariantbitpacking_spark.sources import tokens as tk


def test_rows_prefix_property():
    small = tk.generate_tokens_rows(333)
    big = tk.generate_tokens_rows(1000)
    assert len(small) == 333 and len(big) == 1000
    for (da, ta, na, sa), (db, tb, nb, sb) in zip(small, big):
        assert (da, na, sa) == (db, nb, sb)
        assert np.array_equal(ta, tb)


def test_written_parquet_matches_rows(tmp_path):
    """The chunked writer emits exactly generate_tokens_rows' rows, in
    order, across a chunk boundary (chunk_docs < num_rows)."""
    import pyarrow.parquet as pq

    n = 257
    path = tk.write_tokens_parquet(str(tmp_path / "toks"), n,
                                   chunk_docs=100, row_group_docs=50)
    table = pq.read_table(path + "/part-0.parquet")
    rows = tk.generate_tokens_rows(n)
    assert table.num_rows == n
    doc_ids = table.column("doc_id").to_pylist()
    n_toks = table.column("n_tok").to_pylist()
    toks = table.column("tokens").to_pylist()
    for i, (doc_id, t, n_tok, _src) in enumerate(rows):
        assert doc_ids[i] == doc_id
        assert n_toks[i] == n_tok
        assert np.array_equal(np.asarray(toks[i], np.int32), t)


def test_writer_is_idempotent(tmp_path):
    p = str(tmp_path / "toks")
    tk.write_tokens_parquet(p, 50)
    import os

    mtime = os.path.getmtime(p + "/part-0.parquet")
    tk.write_tokens_parquet(p, 50)  # _SUCCESS short-circuit
    assert os.path.getmtime(p + "/part-0.parquet") == mtime


def test_profiles_cover_every_source():
    rows = tk.generate_tokens_rows(len(tk.PROFILES))
    assert {r[3] for r in rows} == set(tk.PROFILES)
