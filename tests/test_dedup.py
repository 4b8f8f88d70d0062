"""Tests for dedup operators: exact, n-gram Jaccard, MinHash LSH,
SimHash, embedding near-dup."""

import pytest
from pyspark.sql import functions as F

from bht_etl_app_spark.operators import (
    dedup_exact,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)

TEXT_A = "the cat sat on the mat and looked at the dog outside the window today"
TEXT_A2 = TEXT_A.replace("today", "tonight")  # near-dup of A
TEXT_B = "completely different content about spark dataframes and shuffles everywhere"

DOCS = [
    (0, TEXT_A),
    (1, "The   cat sat on the mat and looked at the dog outside the window today"),
    (2, TEXT_A2),
    (3, TEXT_B),
    (4, "tiny"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dedup_exact_groups_normalized_duplicates(docs):
    rows = {r["doc_id"]: r for r in dedup_exact(docs).collect()}
    # doc 1 differs from doc 0 only by case/whitespace -> same group
    assert 0 in rows and rows[0]["group_size"] == 2
    assert 1 not in rows  # loser of min-id
    assert rows[2]["group_size"] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # 0 and 1 are identical after normalization -> jaccard 1.0
    assert pairs[(0, 1)] == 1.0
    # 0 and 2 differ by one word -> high but < 1
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_ngram_jaccard_short_doc_no_shingles(docs):
    # "tiny" has < 3 tokens: must not crash, must produce no pairs
    pairs = ngram_jaccard_pairs(docs, threshold=0.0).where(
        (F.col("id_a") == 4) | (F.col("id_b") == 4)
    )
    assert pairs.count() == 0


def test_minhash_lsh_recovers_near_dups(docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in got  # identical pair must survive banding
    # verified jaccard matches the exact computation
    assert got[(0, 1)] == 1.0


def test_minhash_lsh_pairs_precomputed_banded(docs):
    """ADVICE r11: the ``banded`` seam (the incremental band-store
    probe shape) must yield EXACTLY the owns-banded path's pairs when
    the supplied frame was banded at the same shingle ``n`` — and the
    caller-owned frame must still be usable afterwards (the operator
    must not unpersist what it doesn't own)."""
    from pyspark import StorageLevel

    from bht_etl_app_spark.operators.dedup import minhash_bands

    banded = minhash_bands(docs, n=3, num_hashes=16, bands=4).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        via_seam = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(
                docs, n=3, threshold=0.5, banded=banded
            ).collect()
        }
        owned = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(docs, n=3, threshold=0.5).collect()
        }
        assert via_seam == owned and (0, 1) in via_seam
        # caller-owned frame survives the call
        assert banded.count() > 0
    finally:
        banded.unpersist()


def test_minhash_signature_deterministic(docs):
    a = minhash_signatures(docs).orderBy("doc_id").collect()
    b = minhash_signatures(docs).orderBy("doc_id").collect()
    assert [r["sig"] for r in a] == [r["sig"] for r in b]
    # identical normalized docs share a signature
    assert a[0]["sig"] == a[1]["sig"]


def test_simhash_near_dup_small_hamming(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert hamming(sh[0], sh[1]) == 0  # same tokens after lowering
    assert hamming(sh[0], sh[2]) <= 12  # one word swapped
    assert hamming(sh[0], sh[3]) > 12  # unrelated text


def test_simhash_banded_pairs_match_brute_force(spark, docs):
    from bht_etl_app_spark.operators import simhash_near_dup_pairs

    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    for k in (0, 3, 7):
        expect = {
            (a, b, hamming(sh[a], sh[b]))
            for a in sh
            for b in sh
            if a < b and hamming(sh[a], sh[b]) <= k
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dup_pairs(docs, max_hamming=k, bands=8).collect()
        }
        # bands=8 > k for all tested k -> pigeonhole recall is exact
        assert got == expect, f"max_hamming={k}"


def test_hash_family_twins_agree(spark):
    """The xxhash64 production family and the md5 oracle-portable
    family (r4 VERDICT item #3) must find the SAME verified near-dup
    pairs on the fixture corpus: LSH banding only affects candidate
    RECALL, and at the fixture's (num_hashes=16, bands=4) both
    families' banding recovers every >=0.5-Jaccard pair, while the
    exact-Jaccard verify stage is family-independent. Checked against
    the real sf0.001 documents table, not the toy docs."""
    from bht_etl_app_spark.session import load_table

    real = load_table(spark, "/root/testdata/sf0.001", "documents")
    md5_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(real, threshold=0.5, hash_fn="md5").collect()
    }
    xx_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(real, threshold=0.5).collect()  # default=xxhash64
    }
    assert md5_pairs == xx_pairs
    assert len(xx_pairs) > 0


def test_simhash_families_agree_on_identical_docs(spark, docs):
    """SimHash BITS are family-specific, so near-dup pair sets may
    legitimately differ between families at a hamming cutoff (each
    family's banded recall is exactly pinned vs brute force by
    test_simhash_banded_pairs_match_brute_force, which runs on the
    xxhash64 default). The family-independent invariant: identical
    normalized token streams hash to hamming 0, unrelated text far
    apart — in BOTH families."""
    for fam in ("md5", "xxhash64"):
        sh = {
            r["doc_id"]: r["simhash"]
            for r in simhash64(docs, hash_fn=fam).collect()
        }

        def hamming(x, y):
            return bin((x ^ y) & ((1 << 64) - 1)).count("1")

        assert hamming(sh[0], sh[1]) == 0, fam
        assert hamming(sh[0], sh[3]) > 12, fam


def test_simhash_banded_pairs_validates_params(docs):
    from bht_etl_app_spark.operators import simhash_near_dup_pairs

    with pytest.raises(ValueError):
        simhash_near_dup_pairs(docs, max_hamming=3, bands=3)
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(docs, max_hamming=3, bands=5)


def test_embedding_near_dup(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),   # ~parallel to 0
            (2, [0.0, 1.0, 0.0]),      # orthogonal
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(emb, threshold=0.95).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 2) not in pairs


def test_dedup_corpus_end_to_end(spark):
    from bht_etl_app_spark.operators.dedup import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                              # exact dup of 1
            (3, base.replace("today", "tonight")),  # near dup of 1
            (4, "completely different text about spark engines and parquet files"),
            (5, "  THE  quick brown fox jumps over the lazy dog again and again today "),
            # ^ exact dup of 1 modulo case/whitespace normalization
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_corpus(docs, threshold=0.5, bands=8, num_hashes=16).collect()
    )
    assert kept == [1, 4]


def test_training_pipeline_example_invariants(spark):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))
    from training_data_pipeline import build_training_set
    from bht_etl_app_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    train, test = build_training_set(docs)
    tr = train.select("doc_id").collect()
    te = test.select("doc_id").collect()
    tr_ids = {r["doc_id"] for r in tr}
    te_ids = {r["doc_id"] for r in te}
    assert len(tr) == len(tr_ids) and len(te) == len(te_ids)  # no dups
    assert not (tr_ids & te_ids)  # splits disjoint
    assert tr_ids and te_ids


def test_minhash_signatures_drop_shingle_less_docs(spark):
    """Docs shorter than n tokens have no shingles; they must be
    excluded from the signature/banding stage (ADVICE r1: their
    all-null signatures collide in every band -> O(short²) candidate
    blowup at scale) — and they can never be near-dups anyway."""
    many_short = [(i, "tiny") for i in range(50)] + [(100, TEXT_A), (101, TEXT_A2)]
    docs = spark.createDataFrame(many_short, "doc_id long, text string")
    sigs = minhash_signatures(docs)
    assert sigs.count() == 2  # only the two long docs
    # 2-row bands so the jaccard≈0.6 planted pair reliably collides
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5, bands=8).collect()
    }
    assert pairs == {(100, 101)}  # and never a short-doc pair


def test_embedding_lsh_pairs_subset_and_near_dup_recall(spark):
    """Bucketed LSH pairs must be a subset of the exact cross-join
    result, and true near-dups (tiny angle) must be recovered."""
    from bht_etl_app_spark.operators.dedup import embedding_lsh_near_dup_pairs
    from bht_etl_app_spark.operators.similarity import lsh_planes

    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = [(0, [float(x) for x in base]),
            (1, [float(x) for x in base + 1e-3 * rng.standard_normal(16)])]
    rows += [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(2, 40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    planes = lsh_planes(16, 16, seed=42)
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_lsh_near_dup_pairs(emb, planes, bands=4, threshold=0.5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=0.5).collect()
    }
    assert set(lsh) <= set(exact)          # never invents a pair
    assert (0, 1) in lsh                   # planted near-identical pair found
    assert lsh[(0, 1)] == exact[(0, 1)]    # verify stage is the exact cosine


def test_dedup_clusters_driver_and_distributed_paths_agree(spark):
    """The r4 small-graph union-find fast path must produce exactly
    the distributed min-label iteration's output (same components,
    same min-id cluster representatives)."""
    from bht_etl_app_spark.operators.dedup import dedup_clusters

    # two chains, a triangle, and an isolated pair
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (30, 31)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = sorted(tuple(r) for r in dedup_clusters(pairs).collect())
    slow = sorted(
        tuple(r)
        for r in dedup_clusters(pairs, driver_edge_threshold=0).collect()
    )
    assert fast == slow
    got = dict(fast)
    assert got[3] == 1 and got[11] == 10 and got[22] == 20 and got[31] == 30


def test_near_dup_incremental_hits_and_sides(spark):
    """Hits against history carry side='history'; in-batch hits keep
    doc_id > matched_id so each in-batch group's min id is never
    reported; unrelated docs produce no rows."""
    from bht_etl_app_spark.operators.dedup import near_dup_incremental

    base = "the quick brown fox jumps over the lazy dog again and again"
    hist = spark.createDataFrame(
        [(100, base), (101, "completely different historical text body here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),                       # dup of history 100
            (2, base + " extra"),            # near-dup of history + of 1
            (3, "nothing like the others at all in any way whatsoever"),
        ],
        "doc_id long, text string",
    )
    rows = near_dup_incremental(new, hist, threshold=0.5).collect()
    got = {(r["doc_id"], r["matched_id"], r["side"]) for r in rows}
    assert (1, 100, "history") in got
    assert (2, 100, "history") in got
    assert (2, 1, "batch") in got
    assert not any(r["doc_id"] == 3 for r in rows)
    assert all(r["side"] != "batch" or r["doc_id"] > r["matched_id"] for r in rows)


def test_simhash_combinatorial_banding_is_result_invariant(spark, docs):
    """Manku combinatorial banding (bands=8 -> C(8,5)=56 tables on
    40-bit keys) must yield EXACTLY the bands=4 pair set: exact-recall
    pigeonhole + hamming verification make the output independent of
    the banding config — the retune changes constants, never values."""
    from bht_etl_app_spark.operators.dedup import simhash_near_dup_pairs

    base = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    retuned = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            docs, max_hamming=3, bands=8
        ).collect()
    }
    assert base == retuned


def test_simhash_banding_guards(spark, docs):
    import pytest

    from bht_etl_app_spark.operators.dedup import simhash_near_dup_pairs

    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(docs, max_hamming=3, bands=5)
    with pytest.raises(ValueError, match="exceed"):
        simhash_near_dup_pairs(docs, max_hamming=3, bands=2)
    # bands=16 at k=3 would need 560 full-width tables; the subset
    # size degrades (C(16, s) <= 64 -> s = 1, classic one-block
    # banding) instead of erroring, and results stay banding-invariant
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(docs, max_hamming=3, bands=16).collect()
    }
    base = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert got == base


def test_simhash_wide_recall_matches_brute_force(spark):
    """128-bit multiword SimHash banded join vs brute-force pair scan:
    pigeonhole recall is exact, so the banded output must equal the
    all-pairs hamming filter at the same threshold."""
    from pyspark.sql import functions as F

    from bht_etl_app_spark.operators.dedup import (
        simhash_multiword,
        simhash_near_dup_pairs_wide,
    )

    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(30):
        rows.append((i, base + f" extra{i % 7}"))
    rows.append((100, base + " extra0"))  # near-dup of doc 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sig = simhash_multiword(docs, words=2)
    brute = (
        sig.alias("x")
        .crossJoin(sig.alias("y"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.aggregate(
                F.zip_with(
                    F.col("x.sim"),
                    F.col("y.sim"),
                    lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda a, b: a + b,
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 6)
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs_wide(
            docs, max_hamming=6, words=2
        ).collect()
    }
    exp = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    assert got == exp
    assert got, "expected at least one near-dup pair in the fixture"


def test_simhash_multiword_drops_empty_docs(spark):
    from bht_etl_app_spark.operators.dedup import simhash_multiword

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id for r in simhash_multiword(docs).collect()}
    assert got == {1}


def _python_jaccard_pairs(rows, n=3, threshold=0.8):
    """Independent brute force: all-pairs shingle Jaccard in pure
    Python (no inverted index, no filters) — the ground truth the
    PPJoin losslessness claim is checked against."""
    import itertools

    sets = {}
    for doc_id, text in rows:
        toks = [t for t in text.lower().split() if t]
        sets[doc_id] = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = round(inter / (len(sa) + len(sb) - inter), 6)
        if j >= threshold:
            out.add((ia, ib, j))
    return out


def test_ppjoin_matches_brute_force_boundary_sizes(spark):
    """Adversarial size boundaries for the prefix/length filters at
    t=0.8: a 4-shingle doc vs a 5-shingle superset doc has J exactly
    4/5 = 0.8 — the float guard 0.8*5 = 4.0000000000000004 would
    wrongly exclude it without the epsilon relaxation."""
    from bht_etl_app_spark.operators.dedup import ngram_jaccard_pairs_ppjoin

    base = "w1 w2 w3 w4 w5 w6"          # 4 shingles
    sup = base + " w7"                   # 5 shingles, superset
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, sup),
            (2, "w1 w2 w3 w4 w5 w6"),   # duplicate of 0 (J = 1.0)
            (3, "x1 x2 x3 x4 x5 x6"),   # disjoint
            (4, "w1 w2"),                # too short: no shingles
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs_ppjoin(docs, threshold=0.8).collect()
    }
    exp = _python_jaccard_pairs(
        [(0, base), (1, sup), (2, "w1 w2 w3 w4 w5 w6"), (3, "x1 x2 x3 x4 x5 x6"), (4, "w1 w2")]
    )
    assert (0, 1, 0.8) in exp, "fixture must hit the J == t boundary"
    assert got == exp


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.8, 0.95])
def test_ppjoin_matches_brute_force_random_corpus(spark, threshold):
    """Seeded random corpus over a small vocabulary (dense overlap —
    the worst case for candidate filters): PPJoin output must equal
    the all-pairs Python brute force at every threshold."""
    import random

    from bht_etl_app_spark.operators.dedup import ngram_jaccard_pairs_ppjoin

    rng = random.Random(71)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 18))))
        for i in range(40)
    ]
    # seed guaranteed near-dups: exact clones and one-token mutations
    # of existing docs, so every threshold level has expected pairs
    for i in range(40, 52):
        src = rows[i % 20][1]
        toks = src.split()
        if i % 3 == 0 and len(toks) > 4:
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs_ppjoin(docs, threshold=threshold).collect()
    }
    exp = _python_jaccard_pairs(rows, threshold=threshold)
    assert got == exp
    assert exp, "seeded corpus should produce at least one pair"


def test_ppjoin_prefix_index_smaller_than_full_postings(spark):
    """The point of the prefix filter: the pair-producing join reads
    ~(1-t)|x|+1 postings per doc, not all of them. Checked
    structurally — the candidate join must sit on top of a
    row_number <= prefix-length filter, and the full posting explode
    must appear only in df-count and verify branches."""
    from bht_etl_app_spark.operators.dedup import ngram_jaccard_pairs_ppjoin

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j k l m n o p q r s t u v w x y z") for i in range(4)],
        "doc_id long, text string",
    )
    plan = ngram_jaccard_pairs_ppjoin(docs, threshold=0.8)._jdf.queryExecution().toString()
    assert "row_number" in plan.lower()


def test_containment_catches_subsumption_jaccard_misses(spark):
    from bht_etl_app_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"           # 3 trigram shingles
    long = short + " zeta eta theta iota kappa lam mu" # 10 shingles, superset
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "completely different words here now")],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    # all 3 of doc 1's shingles appear in doc 2 -> c_a = 1.0
    assert (r["id_a"], r["id_b"], r["shared"], r["c_a"]) == (1, 2, 3, 1.0)
    assert r["c_b"] == 0.3
    # the same pair is INVISIBLE to a 0.8-Jaccard dedup (J = 3/10)
    assert ngram_jaccard_pairs(docs, threshold=0.8).count() == 0


def test_containment_respects_stop_shingle_cap(spark):
    from bht_etl_app_spark.operators.dedup import containment_pairs

    # every doc shares one boilerplate sentence; with the cap at 2 the
    # boilerplate shingles (df=3) drop and no pair survives
    boiler = "same legal footer text here"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(3)], "doc_id long, text string"
    )
    assert containment_pairs(docs, threshold=0.9, max_shingle_df=2).count() == 0
    assert containment_pairs(docs, threshold=0.9, max_shingle_df=None).count() == 3


def test_source_overlap_matrix_hand_computed(spark):
    from bht_etl_app_spark.operators.dedup import source_overlap_matrix

    # source A: shingles {a b c, b c d}; source B shares exactly
    # {a b c}; source C disjoint
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "A"),
            (2, "a b c x y", "B"),
            (3, "p q r s", "C"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r["src_a"], r["src_b"]): r for r in source_overlap_matrix(docs).collect()}
    # A: {abc, bcd}; B: {abc, bcx, cxy}; C: {pqr, qrs}
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert r["shared"] == 1
    assert r["overlap"] == 0.5       # 1 / min(2, 3)
    assert r["jaccard"] == 0.25      # 1 / (2 + 3 - 1)


def test_near_dup_recall_report_vs_python_truth(spark):
    """The audit row against an independent pure-Python all-pairs
    truth on the seeded random corpus: n_exact_pairs equals the
    brute-force pair count, n_matched <= n_exact_pairs, and
    precision is exactly 1.0 whenever LSH emits pairs (its
    candidates are exact-verified, so any sub-1.0 value means the
    two pipelines' shingle/verify stages drifted)."""
    import random

    from bht_etl_app_spark.operators.dedup import near_dup_recall_report

    rng = random.Random(71)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 18))))
        for i in range(40)
    ]
    for i in range(40, 52):
        src = rows[i % 20][1]
        toks = src.split()
        if i % 3 == 0 and len(toks) > 4:
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exp = _python_jaccard_pairs(rows, threshold=0.8)
    r = near_dup_recall_report(docs, threshold=0.8).collect()[0]
    assert r["n_exact_pairs"] == len(exp) and len(exp) > 0
    assert r["n_matched"] <= r["n_exact_pairs"]
    assert r["n_lsh_pairs"] == r["n_matched"]  # verified candidates only
    if r["n_lsh_pairs"] > 0:
        assert r["pair_precision"] == 1.0
    assert r["pair_recall"] == round(r["n_matched"] / r["n_exact_pairs"], 6)


def test_near_dup_banding_frontier_monotone_dials(spark):
    """The banding table's structural facts on a planted corpus:
    recall never decreases with more bands (flatter S-curve),
    candidate count never decreases either (the verify-work price),
    precision is the harness invariant 1.0 (candidates are
    exact-verified), and every count is consistent."""
    from bht_etl_app_spark.operators.dedup import near_dup_banding_frontier

    base = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(12):
        toks = list(base)
        toks[0] = f"v{d}"          # near-dup cluster around base
        rows.append((d, " ".join(toks)))
    rows += [(100 + d, " ".join(f"u{d}_{j}" for j in range(12))) for d in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.asDict() for r in
         near_dup_banding_frontier(docs, threshold=0.8, hash_fn="md5").collect()),
        key=lambda r: (r["num_hashes"], r["bands"]),
    )
    assert [(r["num_hashes"], r["bands"]) for r in got] == [
        (16, 2), (16, 4), (16, 8), (32, 2), (32, 4), (32, 8)
    ]
    for r in got:
        assert r["rows_per_band"] * r["bands"] == r["num_hashes"]
        assert r["sig_bytes"] == 8 * r["num_hashes"]
        assert r["pair_precision"] in (1.0, None)
        assert r["n_matched"] <= min(r["n_exact_pairs"], r["n_lsh_pairs"])
        assert r["n_lsh_pairs"] <= r["n_candidate_pairs"]
    for nh in (16, 32):
        per = [r for r in got if r["num_hashes"] == nh]
        recalls = [r["pair_recall"] for r in per]
        cands = [r["n_candidate_pairs"] for r in per]
        assert recalls == sorted(recalls), (nh, recalls)
        assert cands == sorted(cands), (nh, cands)
        assert per[-1]["pair_recall"] == 1.0  # 8 narrow bands catch it


def test_banding_frontier_builds_signatures_once_per_width(spark, monkeypatch):
    """ADVICE r10 pin: the frontier runs the tokenize->shingle->
    minhash projection ONCE per signature width (persisted, then
    banded per arm by the cheap slice projection) — the r10 cut
    rebuilt it per (width, band) arm via minhash_lsh_pairs."""
    from bht_etl_app_spark.operators import dedup as D

    calls = []
    real = D.minhash_signatures

    def counting(*a, **kw):
        calls.append(a[4] if len(a) > 4 else kw.get("num_hashes"))
        return real(*a, **kw)

    monkeypatch.setattr(D, "minhash_signatures", counting)
    docs = spark.createDataFrame(
        [(i, f"a b c d e f g{i}") for i in range(4)], "doc_id long, text string"
    )
    D.near_dup_banding_frontier(docs, threshold=0.8, hash_fn="md5")
    assert sorted(calls) == [16, 32]
