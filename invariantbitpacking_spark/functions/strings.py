"""Global-FSST string-column codec (Spark wiring).

The reference has no string surface (its mmap loader reads raw numeric
arrays, src/ibp_api.cu:51-121); FSST is north-rule new work.  The
symbol table here is learned ONCE on a driver-side sample, rides to
executors in the UDF closure (broadcast-variable semantics), and is
persisted as hex alongside snapshot params — so encoded string columns
written to disk remain decodable by later sessions, unlike a
per-batch table, which makes FSST-lite a *storable* codec.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..codecs import fsst


def table_to_hex(table: np.ndarray) -> str:
    return table.astype("<u2").tobytes().hex()


def table_from_hex(s: str) -> np.ndarray:
    return np.frombuffer(bytes.fromhex(s), "<u2").astype(np.uint16)


def learn_table_df(df: DataFrame, cols=("doc_id", "source"),
                   sample_rows: int = 2048,
                   sample_bytes: int = 1_000_000) -> np.ndarray:
    """Learn one global symbol table from a driver-side sample of the
    given string columns.  Deterministic: ordered by the first column
    before the limit (a bare limit is partition-order dependent)."""
    pdf = df.select(*cols).orderBy(cols[0]).limit(sample_rows).toPandas()
    texts: list[str] = []
    for c in cols:
        texts.extend(pdf[c].fillna("").astype(str).tolist())
    flat, _ = fsst.strings_to_flat(texts)
    return fsst.build_table(flat[:sample_bytes])


def _schema_with(df: DataFrame, cols, new_type: str) -> str:
    return ", ".join(
        f"{f.name} {new_type if f.name in cols else f.dataType.simpleString()}"
        for f in df.schema.fields)


def encode_string_cols(df: DataFrame, table: np.ndarray,
                       cols=("doc_id", "source")) -> DataFrame:
    """Replace string columns with their FSST-encoded binary twins
    (same names).  One Arrow-batched pass; the table is closure-borne."""
    cols = tuple(c for c in cols if c in df.columns)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for c in cols:
                texts = pdf[c].fillna("").astype(str).tolist()
                flat, lens = fsst.strings_to_flat(texts)
                e, el = fsst.encode_strings(flat, lens, table)
                off = np.cumsum(el) - el
                out[c] = [e[o:o + n].tobytes()
                          for o, n in zip(off, el)]
            yield out

    return df.mapInPandas(enc, schema=_schema_with(df, cols, "binary"))


def decode_string_cols(df: DataFrame, table: np.ndarray,
                       cols=("doc_id", "source")) -> DataFrame:
    """Inverse of :func:`encode_string_cols`."""
    cols = tuple(c for c in cols if c in df.columns)

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for c in cols:
                blobs = [bytes(b) if b is not None else b""
                         for b in pdf[c].values]
                enc_lens = np.fromiter((len(b) for b in blobs), np.int64,
                                       count=len(blobs))
                flat = np.frombuffer(b"".join(blobs), np.uint8)
                d, dl = fsst.decode_strings(flat, enc_lens, table)
                out[c] = fsst.flat_to_strings(d, dl)
            yield out

    return df.mapInPandas(dec, schema=_schema_with(df, cols, "string"))
