"""Deterministic sampling/split operators: stability, exhaustiveness,
rate accuracy, and partitioning-independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg.ops.sample import assign_splits, hash_sample, stratified_sample

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, n=2000):
    langs = ["en", "de", "es", "fr"]
    rows = [
        (i, f"text {i}", langs[i % 4], f"src{i % 7}", 10 + i % 90)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_hash_sample_rate_and_determinism(spark):
    d = _docs(spark)
    s1 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.3).collect()}
    s2 = {r["doc_id"] for r in hash_sample(d.repartition(7), "doc_id", 0.3).collect()}
    assert s1 == s2  # partitioning-independent, rerun-stable
    assert 0.25 < len(s1) / 2000 < 0.35  # binomial(2000, .3) 3.5σ band
    assert hash_sample(d, "doc_id", 1.0).count() == 2000
    # nested: a 0.3 sample of a 0.6 sample IS the 0.3 sample (intervals nest)
    s6 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.6).collect()}
    assert s1 <= s6


def test_hash_sample_salt_independence(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.5, salt="b").collect()}
    overlap = len(a & b) / 2000
    assert 0.17 < overlap < 0.33  # ~0.25 if independent; far from 0.5


def test_stratified_rates(spark):
    d = _docs(spark)  # 500 docs per lang
    out = stratified_sample(
        d, "doc_id", "lang", {"en": 0.8, "de": 0.2}, default_rate=0.0
    )
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("es") is None and counts.get("fr") is None
    assert 350 < counts["en"] <= 500
    assert 60 < counts["de"] < 150
    # rate 1.0 stratum keeps every row
    full = stratified_sample(d, "doc_id", "lang", {"fr": 1.0}, default_rate=0.0)
    assert full.count() == 500
    assert full.where(F.col("lang") != "fr").count() == 0


def test_split_assignment_exhaustive_and_stable(spark):
    d = _docs(spark)
    asg = assign_splits(d, "doc_id")
    got = {r["doc_id"]: r["split"] for r in asg.collect()}
    assert len(got) == 2000
    assert set(got.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in got.values() if v == "train")
    assert 0.74 < n_train / 2000 < 0.86
    # growth-stability: the assignment of an existing row never changes
    # when new rows arrive (contrast randomSplit)
    sub = assign_splits(d.where(F.col("doc_id") < 500), "doc_id")
    for r in sub.collect():
        assert got[r["doc_id"]] == r["split"]


def test_split_uncorrelated_with_sample(spark):
    d = _docs(spark)
    sampled = hash_sample(d, "doc_id", 0.5)  # salt="sample"
    asg = assign_splits(sampled, "doc_id")   # salt="split"
    n = asg.count()
    n_train = asg.where(F.col("split") == "train").count()
    assert 0.72 < n_train / n < 0.88  # still ~0.8 inside the sample


def test_split_contamination_flags_cross_split_near_dups(spark):
    from kg.ops.sample import assign_splits, split_contamination

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the quiet green forest tonight")
    # find two doc_ids landing in different splits so the planted pair
    # is guaranteed to straddle a boundary
    probe = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id long"
    )
    got = {r["doc_id"]: r["split"]
           for r in assign_splits(probe, "doc_id").collect()}
    a = next(i for i, s in got.items() if s == "train")
    b = next(i for i, s in got.items() if s != "train")
    rows = [
        (a, base + " alpha", "en", "s", 100),
        (b, base + " beta", "en", "s", 100),       # near-dup of a, other split
        (10_000, "totally different content with no overlap whatsoever at all",
         "en", "s", 60),  # id outside the probe range — never collides
    ]
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = split_contamination(d, threshold=0.3).collect()
    assert len(out) == 1
    r = out[0]
    assert {r["doc_a"], r["doc_b"]} == {a, b}
    assert r["split_a"] != r["split_b"]
    assert r["jaccard"] >= 0.3


def test_ngram_contamination_planted_substring_leak(spark):
    """A 13-word span copied verbatim from a train doc into an eval doc
    must light up that eval doc's contamination rate, while a clean eval
    doc reports 0 — and a LOW-Jaccard doc pair still triggers (the
    substring leak split_contamination's doc-level check misses)."""
    from kg.ops.sample import ngram_overlap_contamination

    span = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen")  # exactly 13 words → exactly one 13-gram
    train_rows = [
        (1, "lots of ordinary training prose here and then " + span +
         " followed by much more unrelated filler text going on and on "
         "for a while longer so the quoted span is a small fraction",
         "en", "s", 300),
        (2, "another train document with entirely different words", "en", "s", 60),
    ]
    eval_rows = [
        # leaked: quotes the span verbatim inside otherwise-new text
        (10, "fresh evaluation material surrounds " + span +
         " plus novel closing words never seen in training data at all",
         "en", "s", 250),
        # clean: no 13-gram overlap
        (11, "completely clean evaluation document whose words never "
         "appear consecutively thirteen at a time anywhere in the "
         "training corpus text", "en", "s", 150),
        # too short for any 13-gram
        (12, "short doc", "en", "s", 9),
    ]
    train = spark.createDataFrame(train_rows, DOCS_SCHEMA)
    ev = spark.createDataFrame(eval_rows, DOCS_SCHEMA)
    rows = {r["doc_id"]: r
            for r in ngram_overlap_contamination(train, ev, n=13).collect()}
    assert set(rows) == {10, 11, 12}
    leaked, clean, short = rows[10], rows[11], rows[12]
    assert leaked["n_contaminated"] >= 1
    assert leaked["contamination_rate"] > 0.0
    # only the quoted span overlaps, not the whole doc
    assert leaked["n_contaminated"] < leaked["n_ngrams"]
    assert clean["n_contaminated"] == 0 and clean["contamination_rate"] == 0.0
    assert short["n_ngrams"] == 0 and short["contamination_rate"] == 0.0


def test_ngram_contamination_bloom_prefilter(spark):
    """The opt-in bloom path (VERDICT r4 item 6) must (a) return the
    SAME rows as the exact path — bloom positives are re-verified by the
    exact equality pass, so error is one-sided and then eliminated: rate
    can never fall below exact — and (b) actually prune: on a mostly-
    clean eval corpus the bloom-positive candidate set is far smaller
    than the eval gram universe."""
    import math

    from kg.ops.dedup import with_shingles
    from kg.ops.sample import (
        _bloom_positives,
        _bloom_words,
        ngram_overlap_contamination,
    )

    # train: 40 docs of shared vocabulary; eval: 1 doc quoting a train
    # trigram span + 30 clean docs with disjoint vocabulary
    train_rows = [
        (i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}", "en", "s", 50)
        for i in range(40)
    ]
    eval_rows = [(100, "alpha7 beta7 gamma7 delta7 plus new tail", "en", "s", 40)]
    eval_rows += [
        (200 + i, f"zeta{i} eta{i} theta{i} iota{i} kappa{i}", "en", "s", 50)
        for i in range(30)
    ]
    train = spark.createDataFrame(train_rows, DOCS_SCHEMA)
    ev = spark.createDataFrame(eval_rows, DOCS_SCHEMA)

    exact = sorted(map(tuple, ngram_overlap_contamination(train, ev, n=3).collect()))
    bloom = sorted(
        map(
            tuple,
            ngram_overlap_contamination(train, ev, n=3, bloom_fpp=0.01).collect(),
        )
    )
    assert bloom == exact
    r100 = [t for t in bloom if t[0] == 100][0]
    assert r100[2] >= 1  # the quoted span still detected through the bloom

    # candidate-volume reduction: clean-eval grams are pruned by the bloom
    gh = F.md5(F.col("g").cast("binary")).alias("gh")
    tg = with_shingles(train, 3).select(F.explode("sh").alias("g")).select(gh)
    eg = (
        with_shingles(ev, 3)
        .select(F.explode("sh").alias("g"))
        .select(gh)
        .distinct()
    )
    n_items = tg.count()
    m_bits = min(max(int(-n_items * math.log(0.01) / math.log(2) ** 2), 64), 1 << 26)
    k = max(1, round(m_bits / n_items * math.log(2)))
    words = _bloom_words(tg, "gh", m_bits, k)
    n_eval_grams = eg.count()
    n_cand = _bloom_positives(eg, "gh", words, m_bits, k).count()
    assert n_cand < n_eval_grams / 2  # most clean grams pruned map-side


def test_pack_chunks_invariants(spark):
    """Concat-and-chunk packing: offsets tile each bucket contiguously,
    chunk spans match the offset arithmetic, straddling docs appear in
    2+ chunks, zero-token docs are excluded, and the assignment is
    invariant to input partitioning/order."""
    from kg.ops.pack import chunk_manifest, pack_chunks

    rows = [(i, "tok " * (i % 37 + 1), "en", "s", 10) for i in range(120)]
    rows.append((900, "", "en", "s", 0))           # empty → excluded
    rows.append((901, "   \t  ", "en", "s", 6))    # ws-only → excluded
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    L = 32
    packed = pack_chunks(d, chunk_tokens=L, n_buckets=4).collect()
    assert {r["doc_id"] for r in packed} == set(range(120))
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r["start_offset"])
        pos = 0
        for r in rs:  # contiguous tiling, no gaps or overlaps
            assert r["start_offset"] == pos
            assert r["start_chunk"] == pos // L
            assert r["end_chunk"] == (pos + r["n_tokens"] - 1) // L
            assert r["n_chunks"] == r["end_chunk"] - r["start_chunk"] + 1
            pos += r["n_tokens"]
    assert any(r["n_chunks"] >= 2 for r in packed)  # straddles exist

    # manifest: every chunk except each bucket's last holds exactly L
    man = chunk_manifest(
        pack_chunks(d, chunk_tokens=L, n_buckets=4), chunk_tokens=L
    ).collect()
    last = {}
    for r in man:
        last[r["bucket"]] = max(last.get(r["bucket"], -1), r["chunk_idx"])
    for r in man:
        if r["chunk_idx"] < last[r["bucket"]]:
            assert r["n_tokens"] == L, r
        else:
            assert 0 < r["n_tokens"] <= L
    # total tokens conserved
    assert sum(r["n_tokens"] for r in man) == sum(r["n_tokens"] for r in packed)

    # partitioning invariance
    again = pack_chunks(
        d.repartition(7).sortWithinPartitions("text"), chunk_tokens=L, n_buckets=4
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, packed))


def test_top_n_per_stratum_cap_and_growth_stability(spark):
    from kg.ops.sample import top_n_per_stratum

    rows = [(i, f"doc {i}", "en" if i % 3 else "de", "s", 10)
            for i in range(300)]
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    kept = top_n_per_stratum(d, "lang", 40, "doc_id").collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["en"]) == 40 and len(by_lang["de"]) == 40
    # growth: adding one row changes the kept set by AT MOST one swap
    # within its own stratum
    d2 = spark.createDataFrame(rows + [(999, "new", "en", "s", 10)], DOCS_SCHEMA)
    kept2 = {r["doc_id"] for r in
             top_n_per_stratum(d2, "lang", 40, "doc_id").collect()
             if r["lang"] == "en"}
    assert len(by_lang["en"] - kept2) <= 1
    assert len(kept2) == 40


def test_top_n_per_stratum_two_phase_equals_one_phase(spark):
    """The bucketed two-phase cap must keep EXACTLY the rows the naive
    single-window form keeps (VERDICT r4 item 1 Done criterion)."""
    from pyspark.sql.window import Window as W

    from kg.ops.sample import _bucket, top_n_per_stratum

    rows = [(i, f"doc {i}", ["en", "de", "es"][i % 3], "s", 10)
            for i in range(2000)]
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    for n in (1, 7, 40):
        got = {(r["doc_id"], r["lang"])
               for r in top_n_per_stratum(d, "lang", n, "doc_id").collect()}
        w = W.partitionBy("lang").orderBy(
            _bucket(F.col("doc_id"), "cap"), F.col("doc_id"))
        ref = {(r["doc_id"], r["lang"]) for r in
               d.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= n).drop("_rn").collect()}
        assert got == ref, f"n={n}: {len(got)} vs {len(ref)}"


def test_top_n_per_stratum_no_single_task_stratum(spark):
    """On a ONE-stratum corpus the phase-1 window must NOT funnel the
    whole stratum through one task: its partition spec includes the salt
    bucket, and rows spread across many buckets."""
    from kg.ops.sample import top_n_per_stratum

    rows = [(i, f"doc {i}", "en", "s", 10) for i in range(5000)]
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = top_n_per_stratum(d, "lang", 10, "doc_id", n_buckets=16)
    assert out.count() == 10
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two windows; the first (inner) one is partitioned by the salt bucket
    assert plan.count("Window") >= 2
    assert "pmod(xxhash64" in plan
    # per-bucket distribution: no phase-1 window partition receives the
    # full stratum (bound is |stratum|/B up to hash variance)
    sb = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(16))
    counts = [r["c"] for r in
              d.groupBy(sb.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()]
    assert len(counts) == 16 and max(counts) < 5000 / 4


def test_bloom_autosize_targets_fpp_from_distinct_cardinality(spark):
    """r6 (VERDICT r5 item 5): m_bits must be derived from the DISTINCT
    train-gram cardinality (approx_count_distinct), so on a corpus with
    heavy gram duplication the bitmap is sized for n_distinct, within
    HLL error, of the textbook m = -n ln(p) / ln(2)^2."""
    import math

    from pyspark.sql import functions as F

    from kg.ops.dedup import with_shingles
    from kg.ops.sample import ngram_overlap_contamination

    # 50 docs sharing ONE repeated sentence => tiny distinct-gram set
    rows = [(i, "alpha beta gamma delta epsilon zeta", "en", "s", 30)
            for i in range(50)]
    train = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    ev = spark.createDataFrame(
        [(1000, "alpha beta gamma something else entirely", "en", "s", 40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    gh = F.unhex(F.md5(F.col("g").cast("binary"))).alias("gh")
    grams = (
        with_shingles(train, 3).select(F.explode_outer("sh").alias("g"))
        .where(F.col("g").isNotNull()).select(gh)
    )
    n_distinct = grams.distinct().count()
    n_raw = grams.count()
    assert n_raw == 50 * n_distinct  # heavy duplication by construction
    captured = {}
    import kg.ops.sample as S
    orig = S._bloom_words

    def spy(g, col, m_bits, k):
        captured["m"], captured["k"] = m_bits, k
        return orig(g, col, m_bits, k)

    S._bloom_words = spy
    try:
        out = ngram_overlap_contamination(train, ev, n=3, bloom_fpp=0.01)
        rowz = {r["doc_id"]: r for r in out.collect()}
    finally:
        S._bloom_words = orig
    # sized from n_distinct (± HLL error), NOT from the 50x raw count
    textbook = -n_distinct * math.log(0.01) / (math.log(2) ** 2)
    assert captured["m"] >= 64  # floor
    assert captured["m"] <= 3 * textbook + 64  # nowhere near the 50x raw size
    # and the result still equals the exact path
    exact = {r["doc_id"]: r for r in
             ngram_overlap_contamination(train, ev, n=3).collect()}
    assert {k: tuple(v) for k, v in rowz.items()} == {
        k: tuple(v) for k, v in exact.items()
    }
