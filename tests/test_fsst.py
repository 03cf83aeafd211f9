"""FSST-lite string codec: lossless round-trip + compression sanity."""

import numpy as np
import pytest

from invariantbitpacking_spark.codecs import fsst


def roundtrip(strings, table=None):
    flat, lens = fsst.strings_to_flat(strings)
    if table is None:
        table = fsst.build_table(flat)
    enc, enc_lens = fsst.encode_strings(flat, lens, table)
    dec, dec_lens = fsst.decode_strings(enc, enc_lens, table)
    out = fsst.flat_to_strings(dec, dec_lens)
    return out, int(enc.size), int(flat.size), table


def test_ascii_corpus_compresses():
    words = ["the", "quick", "brown", "fox", "jumps", "scan", "join"]
    rng = np.random.default_rng(1)
    docs = [" ".join(rng.choice(words, 40)) for _ in range(200)]
    out, enc_size, raw_size, table = roundtrip(docs)
    assert out == docs
    assert enc_size < raw_size * 0.8  # bigram symbols must help

def test_repeated_ids():
    ids = [f"src{i % 20}-{i:08d}" for i in range(500)]
    out, enc_size, raw_size, _ = roundtrip(ids)
    assert out == ids
    assert enc_size < raw_size


def test_utf8_and_high_bytes():
    docs = ["héllo wörld ÿ", "日本語テキスト", "\xff\xff\xff", "",
            "mixed ÿascii日", "\x7f\x80\x81"]
    out, enc_size, raw_size, _ = roundtrip(docs)
    assert out == docs


def test_empty_table_passthrough():
    docs = ["abc", "ÿ", ""]
    out, enc_size, raw_size, _ = roundtrip(docs, table=np.zeros(0, np.uint16))
    assert out == docs


def test_adversarial_escape_chains():
    docs = ["\xff" * 50, "a\xffb\xff\xffc", "\xfe\xff\xfe\xff"]
    out, *_ = roundtrip(docs)
    assert out == docs


def test_deterministic_table():
    flat, lens = fsst.strings_to_flat(["abcabcabc"] * 50)
    t1 = fsst.build_table(flat)
    t2 = fsst.build_table(flat.copy())
    np.testing.assert_array_equal(t1, t2)
