"""Property-based tests (hypothesis) for the write-path and skew kernels:
each Spark kernel is compared against a brute-force driver-side model over
randomly generated small tables, so key-edge cases (empty sides, all-NULL
values, duplicate non-key columns, hot keys) are explored mechanically
rather than hand-picked.

Examples are kept small (max ~12 rows) and few (Spark round-trips are the
cost); deadline disabled for JVM warm-up jitter.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from inspig_etl_spark.operators.skew import salted_join, two_stage_count_distinct
from inspig_etl_spark.sources.sinks import insert_if_absent, merge_upsert

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, value) rows with a NARROW domain so collisions/hot keys are common.
KV = st.lists(
    st.tuples(st.integers(0, 5), st.one_of(st.none(), st.integers(-3, 3))),
    max_size=12,
)
SCHEMA = "k int, v int"


def _unique_by_key(rows):
    out = {}
    for k, v in rows:
        out[k] = v  # last wins, like dropDuplicates upstream of MERGE
    return out


class TestMergeProperties:
    @SETTINGS
    @given(target=KV, updates=KV)
    def test_merge_upsert_matches_dict_model(self, spark, target, updates):
        t, u = _unique_by_key(target), _unique_by_key(updates)
        got = merge_upsert(
            spark.createDataFrame(list(t.items()), SCHEMA),
            spark.createDataFrame(list(u.items()), SCHEMA),
            keys=["k"],
        ).collect()
        want = {**t, **u}  # update wins wholesale in full mode
        assert {r.k: r.v for r in got} == want and len(got) == len(want)

    @SETTINGS
    @given(target=KV, updates=KV)
    def test_merge_upsert_partial_keeps_target_on_null(self, spark, target, updates):
        t, u = _unique_by_key(target), _unique_by_key(updates)
        got = merge_upsert(
            spark.createDataFrame(list(t.items()), SCHEMA),
            spark.createDataFrame(list(u.items()), SCHEMA),
            keys=["k"],
            partial=True,
        ).collect()
        want = dict(t)
        for k, v in u.items():
            # NVL(:new, old): a NULL update value keeps the target's value
            # (absent target key -> the NULL inserts).
            want[k] = v if v is not None else t.get(k)
        assert {r.k: r.v for r in got} == want

    @SETTINGS
    @given(target=KV, updates=KV)
    def test_merge_upsert_is_idempotent(self, spark, target, updates):
        t = spark.createDataFrame(list(_unique_by_key(target).items()), SCHEMA)
        u = spark.createDataFrame(list(_unique_by_key(updates).items()), SCHEMA)
        once = merge_upsert(t, u, keys=["k"])
        twice = merge_upsert(once, u, keys=["k"])
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    @SETTINGS
    @given(target=KV, updates=KV)
    def test_insert_if_absent_never_clobbers(self, spark, target, updates):
        t, u = _unique_by_key(target), _unique_by_key(updates)
        got = insert_if_absent(
            spark.createDataFrame(list(t.items()), SCHEMA),
            spark.createDataFrame(list(u.items()), SCHEMA),
            keys=["k"],
        ).collect()
        want = {**{k: v for k, v in u.items() if k not in t}, **t}  # target wins
        assert {r.k: r.v for r in got} == want


class TestSkewKernelProperties:
    @SETTINGS
    @given(
        big=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9)), max_size=12),
        small=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9)), max_size=6),
        n_salts=st.integers(2, 5),
    )
    def test_salted_join_equals_plain_join(self, spark, big, small, n_salts):
        b = spark.createDataFrame(big or [(99, 0)], "k int, a int")
        s = spark.createDataFrame(small or [(98, 0)], "k int, b int")
        salted = salted_join(b, s, on=["k"], n_salts=n_salts).collect()
        plain = b.join(s, ["k"]).collect()
        assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))

    @SETTINGS
    @given(rows=KV)
    def test_two_stage_distinct_matches_model(self, spark, rows):
        df = spark.createDataFrame(rows or [(0, None)], SCHEMA)
        got = {
            r.k: r.n
            for r in two_stage_count_distinct(df, ["k"], "v", alias="n").collect()
        }
        want = {}
        for k, v in rows or [(0, None)]:
            want.setdefault(k, set())
            if v is not None:
                want[k].add(v)
        assert got == {k: len(s) for k, s in want.items()}


def test_histogram_quantile_brackets_exact_rank(spark):
    """The histogram sketch's bucket-edge answer must BRACKET the exact
    rank statistic it approximates: for quantile q over n values, the
    value at rank ceil(q*n/100) lies inside the answering bucket, i.e.
    in [ub - HIST_WIDTH, ub). Plus the structural invariants: answers are
    bucket-edge multiples and monotone across quantiles."""
    import math

    from tests.conftest import SF_CORRECT
    from inspig_etl_spark.catalog import table
    from inspig_etl_spark.queries.analytics_ext import (
        HIST_BUCKETS,
        HIST_WIDTH,
        order_value_percentiles_approx,
    )

    approx = {
        r.o_orderpriority: r
        for r in order_value_percentiles_approx(spark, SF_CORRECT).collect()
    }
    assert len(approx) == 5
    vals: dict[str, list[float]] = {}
    for row in (
        table(spark, SF_CORRECT, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        vals.setdefault(row.o_orderpriority, []).append(row.o_totalprice)
    assert set(vals) == set(approx)
    # Domain-coverage guard (ADVICE r14): a value at or beyond the clamp
    # ceiling lands in the edge bucket and silently voids the one-bucket
    # bracket bound below while cross-engine parity stays green (both
    # engines clamp identically). Fail HERE, loudly, if a data regen ever
    # outgrows the histogram domain — the fix is widening HIST_WIDTH.
    domain = HIST_BUCKETS * HIST_WIDTH
    observed_max = max(max(v) for v in vals.values())
    assert observed_max < domain, (
        f"o_totalprice max {observed_max} reached the histogram clamp "
        f"ceiling {domain}; widen HIST_WIDTH in queries/analytics_ext.py "
        f"(bracket bound is void for clamped values)"
    )
    for prio, a in approx.items():
        v = sorted(vals[prio])
        assert a.n_orders == len(v)
        assert a.p50_ub <= a.p90_ub <= a.p99_ub
        for q, col in ((50, "p50_ub"), (90, "p90_ub"), (99, "p99_ub")):
            ub = getattr(a, col)
            assert ub % HIST_WIDTH == 0
            rank_val = v[math.ceil(q * len(v) / 100) - 1]
            assert ub - HIST_WIDTH <= rank_val < ub, (prio, col, ub, rank_val)


def test_chunk_dedup_conservation_invariants(spark):
    """Per doc kept+removed == chunks; global kept == distinct chunk count;
    total chunks == sum of floor(tokens/3) over docs — the C4-style pass
    must never lose or invent a chunk whatever the corpus."""
    from tests.conftest import SF_CORRECT
    from inspig_etl_spark.functions.text import tokens
    from inspig_etl_spark.queries.llm_dedup import docs_chunk_dedup
    from inspig_etl_spark.catalog import table
    from pyspark.sql import functions as F

    out = docs_chunk_dedup(spark, SF_CORRECT).collect()
    assert all(r.n_kept_chunks + r.n_removed_chunks == r.n_chunks for r in out)

    docs = table(spark, SF_CORRECT, "documents")
    per_doc = docs.select(
        F.floor(F.size(tokens(F.col("text"))) / 3).cast("bigint").alias("nc")
    )
    expected_total = per_doc.agg(F.sum("nc")).first()[0]
    assert sum(r.n_chunks for r in out) == expected_total

    idxs = F.sequence(F.lit(0), (F.floor(F.size("toks") / 3) - 1).cast("int"))
    chunks = F.transform(
        idxs, lambda i: F.array_join(F.slice(F.col("toks"), i * 3 + 1, 3), " ")
    )
    distinct_chunks = (
        docs.select(tokens(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(F.explode(chunks).alias("c"))
        .distinct()
        .count()
    )
    assert sum(r.n_kept_chunks for r in out) == distinct_chunks


def test_pii_redaction_accounting(spark):
    """Redaction accounting must close: a doc is clean iff zero detections,
    every doc with injected PII is detected (doc_id-derived injection rules),
    and redacted text never shrinks below aug minus the matched spans."""
    from tests.conftest import SF_CORRECT
    from inspig_etl_spark.queries.llm_text import docs_pii_redaction

    rows = docs_pii_redaction(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.pii_cnt == r.email_cnt + r.phone_cnt + r.ip_cnt
        assert (r.is_clean == 1) == (r.pii_cnt == 0)
        # injection rules: email unless doc_id%3==0, phone when %2==0, ip when %5==0
        assert r.email_cnt >= (0 if r.doc_id % 3 == 0 else 1)
        assert r.phone_cnt >= (1 if r.doc_id % 2 == 0 else 0)
        assert r.ip_cnt >= (1 if r.doc_id % 5 == 0 else 0)
        if r.pii_cnt > 0:
            assert r.redacted_len != r.aug_len


class TestStatefulTextKernels:
    """Randomized differentials: the distributed stateful kernels must match
    pure-Python models on arbitrary tiny corpora (narrow alphabet so chunk
    collisions and bin overflows are common)."""

    DOCS = st.lists(
        st.tuples(
            st.integers(0, 50),  # doc_id domain (dedup below)
            st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=10),
            st.sampled_from(["s1", "s2"]),
        ),
        max_size=8,
    )

    @staticmethod
    def _write_docs(tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        seen = {}
        for did, toks, src in rows:
            seen[did] = (" ".join(toks), src)  # unique doc_id, last wins
        docs = sorted((d, t, s) for d, (t, s) in seen.items())
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, *_ in docs], pa.int64()),
                    "text": [t for _, t, _ in docs],
                    "lang": ["en"] * len(docs),
                    "source": [s for *_, s in docs],
                    "n_chars": pa.array([len(t) for _, t, _ in docs], pa.int64()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        return docs

    @SETTINGS
    @given(rows=DOCS)
    def test_chunk_dedup_matches_python_model(self, spark, tmp_path_factory, rows):
        from inspig_etl_spark.queries.llm_dedup import docs_chunk_dedup

        tmp = tmp_path_factory.mktemp("chunkdd")
        docs = self._write_docs(tmp, rows)
        first_owner = {}
        model = {}
        for did, text, _ in docs:  # doc_id order == global first-occurrence order
            toks = text.split()
            chunks = [
                " ".join(toks[i * 3 : i * 3 + 3]) for i in range(len(toks) // 3)
            ]
            if not chunks:
                continue
            kept = 0
            for c in chunks:
                if c not in first_owner:
                    first_owner[c] = did
                    kept += 1
            model[did] = (len(chunks), kept, len(chunks) - kept)
        got = {
            r.doc_id: (r.n_chunks, r.n_kept_chunks, r.n_removed_chunks)
            for r in docs_chunk_dedup(spark, str(tmp)).collect()
        }
        assert got == model

    @SETTINGS
    @given(rows=DOCS)
    def test_sequence_packing_matches_python_model(self, spark, tmp_path_factory, rows):
        from inspig_etl_spark.queries.llm_text import PACK_CAPACITY, docs_sequence_packing

        tmp = tmp_path_factory.mktemp("packing")
        docs = self._write_docs(tmp, rows)
        model = {}
        state = {}  # source -> [bin_no, fill]
        for did, text, src in docs:  # doc_id order within each source
            n = len(text.split())
            if src not in state:
                state[src] = [0, n]
            elif state[src][1] + n <= PACK_CAPACITY:
                state[src][1] += n
            else:
                state[src][0] += 1
                state[src][1] = n
            model[did] = (src, n, state[src][0], state[src][1])
        got = {
            r.doc_id: (r.source, r.n_tokens, r.bin_no, r.bin_fill)
            for r in docs_sequence_packing(spark, str(tmp)).collect()
        }
        assert got == model


class TestCurriculumRanking:
    """The two-phase distributed ranking must equal a pure-Python
    single-sort model on arbitrary tiny corpora: the md5 sort key is
    modeled exactly (it is deterministic), the difficulty stage is taken
    from the kernel's own output (the classifier is covered by its own
    oracle), and the positions must be the exact rank of (sort_key,
    doc_id) within each stage — any bucket-offset error surfaces as a
    permutation defect."""

    DOCS = TestStatefulTextKernels.DOCS

    @SETTINGS
    @given(rows=DOCS)
    def test_two_phase_positions_match_single_sort_model(
        self, spark, tmp_path_factory, rows
    ):
        import hashlib

        from inspig_etl_spark.queries.llm_sampling import (
            CUR_KEY_MOD,
            docs_curriculum_order,
        )

        tmp = tmp_path_factory.mktemp("curriculum")
        TestStatefulTextKernels._write_docs(tmp, rows)
        got = docs_curriculum_order(spark, str(tmp)).collect()

        def model_key(doc_id: int) -> int:
            h = hashlib.md5(f"cur{doc_id}".encode()).hexdigest()[:15]
            return int(h, 16) % CUR_KEY_MOD

        by_stage: dict[int, list] = {}
        for r in got:
            assert r.sort_key == model_key(r.doc_id)
            by_stage.setdefault(r.stage, []).append(r)
        for grp in by_stage.values():
            expect = {
                r.doc_id: i + 1
                for i, r in enumerate(
                    sorted(grp, key=lambda r: (r.sort_key, r.doc_id))
                )
            }
            assert {r.doc_id: r.stage_pos for r in grp} == expect


class TestAudioFingerprint:
    """Differential for the audio landmark extraction: a pure-Python model
    recomputes every landmark set from (doc_id, text) exactly — payload
    truncation, hop windows, band sums, quantization, md5 — and (a) every
    pair the kernel returns must carry the model's exact Jaccard (banding
    may MISS pairs, verification must never invent or misvalue one), and
    (b) every returned pair's model-Jaccard clears the threshold."""

    DOCS = TestStatefulTextKernels.DOCS

    @SETTINGS
    @given(rows=DOCS)
    def test_returned_pairs_match_python_landmark_model(
        self, spark, tmp_path_factory, rows
    ):
        import hashlib

        from inspig_etl_spark.operators.dedup import JACCARD_THRESHOLD
        from inspig_etl_spark.queries.multimodal import (
            AF_HOP,
            AF_QUANT,
            AF_WIN,
            AUDIO_TWIN_OFFSET,
            multimodal_audio_fp_neardup,
        )

        tmp = tmp_path_factory.mktemp("audiofp")
        docs = TestStatefulTextKernels._write_docs(tmp, rows)

        def landmarks(payload: bytes) -> set[int]:
            out = set()
            n = len(payload)
            if n < AF_WIN:
                return out
            for i in range((n - AF_WIN) // AF_HOP + 1):
                levels = [
                    sum(payload[i * AF_HOP + b * 4 + k] for k in range(4))
                    // AF_QUANT
                    for b in range(4)
                ]
                s = "af" + "_".join(str(v) for v in levels)
                out.add(
                    int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    % 2147483647
                )
            return out

        model_sets: dict[int, set[int]] = {}
        for did, text, _src in docs:
            if did % 3 != 1:
                continue
            w, h, c = did % 16 + 4, did % 12 + 4, did % 3 + 1
            pay = (text * 4).encode()[: w * h * c]
            model_sets[did] = landmarks(pay)
            model_sets[did + AUDIO_TWIN_OFFSET] = landmarks(pay[AF_HOP:])

        got = multimodal_audio_fp_neardup(spark, str(tmp)).collect()
        for r in got:
            a, b = model_sets[r.id_a], model_sets[r.id_b]
            inter = len(a & b)
            union = len(a) + len(b) - inter
            assert union > 0
            expect = round(inter / union, 6)
            assert r.jaccard == expect
            assert r.jaccard >= JACCARD_THRESHOLD


class TestBM25Properties:
    """Differential for the fixed-point BM25 tower: a driver-side Python
    model recomputes the exact integer pipeline (positional bigrams, df
    cap, avgdl_e3, saturation, length norm, per-query ranking) over random
    tiny corpora. The token domain is narrow so bigram collisions, hot
    terms (df-gated out), repeated terms (tf > 1), and short/long docs are
    all explored mechanically; corpora are sized ~40 docs so the 5% df cap
    admits df <= 2 terms instead of gating everything."""

    DOCS = st.lists(
        st.tuples(
            st.integers(0, 60),  # doc_id domain (dedup below; 0 and 50 query)
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=8),
        ),
        min_size=30,
        max_size=50,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=DOCS)
    def test_bm25_matches_python_model(self, spark, tmp_path_factory, rows):
        from inspig_etl_spark.queries.hybrid_search import (
            BM25_DEN_CONST_E3,
            BM25_DEN_DL_E6,
            BM25_SAT_NUM_E9,
            IDF_E6,
            LEX_C,
            docs_bm25_topk,
        )
        from inspig_etl_spark.queries.llm_similarity import QUERY_MOD

        tmp = tmp_path_factory.mktemp("bm25")
        import pyarrow as pa
        import pyarrow.parquet as pq

        seen = {}
        for did, toks in rows:
            seen[did] = " ".join(toks)
        docs = sorted(seen.items())
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs],
                    "lang": ["en"] * len(docs),
                    "source": ["s"] * len(docs),
                    "n_chars": pa.array(
                        [len(t) for _, t in docs], pa.int64()
                    ),
                }
            ),
            str(tmp / "documents.parquet"),
        )

        # model terms as bigram TUPLES (the 4-word vocab has <= 16 distinct
        # bigrams — the 2^31 hash space cannot collide on them, so tuple
        # identity == hash identity)
        tb = {
            d: list(zip(t.split(), t.split()[1:])) for d, t in docs
        }
        tb = {d: bs for d, bs in tb.items() if bs}
        n_docs = len(tb)
        df = {}
        for bs in tb.values():
            for t in set(bs):
                df[t] = df.get(t, 0) + 1
        rare = {
            t: n_docs * IDF_E6 // c
            for t, c in df.items()
            if c * 100 <= n_docs * 5
        }
        expect = {}
        if n_docs:
            total = sum(len(bs) for bs in tb.values())
            avgdl_e3 = total * 1000 // n_docs
            for q, qbs in tb.items():
                if q % QUERY_MOD != 0:
                    continue
                scored = []
                for d, dbs in tb.items():
                    if d == q:
                        continue
                    s = 0
                    hit = False
                    for t in set(qbs):
                        if t not in rare or t not in set(dbs):
                            continue
                        hit = True
                        tf, dl = dbs.count(t), len(dbs)
                        den = (
                            1000 * tf
                            + BM25_DEN_CONST_E3
                            + (BM25_DEN_DL_E6 * dl) // avgdl_e3
                        )
                        s += rare[t] * ((tf * BM25_SAT_NUM_E9) // den) // IDF_E6
                    if hit:
                        scored.append((d, s))
                scored.sort(key=lambda x: (-x[1], x[0]))
                for rank, (d, s) in enumerate(scored[:LEX_C], 1):
                    expect[(q, d)] = (rank, s)

        got = {
            (r.query_id, r.doc_id): (r.rank_bm25, r.bm25_e6)
            for r in docs_bm25_topk(spark, str(tmp)).collect()
        }
        assert got == expect
