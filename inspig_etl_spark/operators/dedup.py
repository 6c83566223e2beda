"""Deduplication operators for LLM training-data pipelines.

Four dedup families over a ``documents(doc_id, text, ...)`` table, all pure
DataFrame expressions (no Python UDFs, no collect):

- **exact**: md5 content hash → min-id canonical per group (hash groupBy).
- **fingerprint**: md5 over normalized tokens (whitespace/punct-insensitive)
  plus a polynomial rolling hash — catches trivially-reformatted copies.
- **MinHash + LSH**: word-shingle signatures (k independent permutations of
  a shared md5 base hash), banded into buckets; candidate pairs only ever
  form INSIDE a bucket — never an all-pairs join — then exact-Jaccard
  verified. This is the 100 TB path: shuffle volume is O(bands x |docs|),
  and bucket joins are ordinary equi-joins Catalyst handles with AQE.
- **SimHash**: 32-bit sign-sum sketch with byte-banded candidate generation
  and Hamming-distance verification (``bit_count(xor)``).

Every hash is md5-derived, so results are bit-identical in any engine with
md5 — the query layer (queries/llm_dedup.py) exploits this to keep even the
LSH internals DuckDB-oracle-checkable.

Reference parity: the reference has no dedup surface (its idempotency is
key-based MERGE, SURVEY.md §2.1 S6-S10); these operators are the
brief-mandated LLM-pipeline extension built on the same engine kernel.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inspig_etl_spark.functions.text import HASH_P, hashed, md5_long, tokens

# Deterministic permutation constants for MinHash: sig_k = min over shingles
# of (A_k * h + B_k) mod P. 31-bit values keep every product under 2^62.
MINHASH_K = 16

# The shared MinHash/LSH tuning, and the DuckDB oracle twins of the kernels
# below. They live HERE (a non-registering module) so any query module can
# interpolate them into an oracle without importing queries/llm_dedup.py —
# a module-level import of a query module would re-order the registry's
# registration sequence (the rotation's tie-break).
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5
MINHASH_BANDS = 4
MINHASH_ROWS = 4

# Exact Jaccard between two shingle-set columns (a.sh, b.sh), both distinct.
SQL_JACCARD = (
    "ROUND(len(list_filter(a.sh, x -> list_contains(b.sh, x)))::DOUBLE"
    " / NULLIF(len(a.sh) + len(b.sh)"
    " - len(list_filter(a.sh, x -> list_contains(b.sh, x))), 0), 6)"
)


def sql_minhash_sig(k: int = MINHASH_K) -> str:
    """DuckDB expression list for the k signature minima over `sh` —
    the oracle twin of :func:`minhash_signature`."""
    parts = []
    for a, b in minhash_coeffs(k):
        parts.append(
            f"COALESCE(list_min(list_transform(sh, h -> (h * {a} + {b}) % {HASH_P})), {HASH_P})"
        )
    return "[" + ", ".join(parts) + "]"


def sql_lsh_band_key(rows: int = MINHASH_ROWS) -> str:
    """DuckDB band-key expression over (`sig`, `band_no`) — the oracle twin
    of :func:`lsh_band_keys`'s md5 60-bit fold."""
    return (
        "CAST(('0x' || substr(md5(array_to_string("
        f"sig[band_no * {rows} + 1 : band_no * {rows} + {rows}], '_')), 1, 15))"
        " AS BIGINT)"
    )


def minhash_coeffs(k: int = MINHASH_K) -> list[tuple[int, int]]:
    return [
        ((1_000_003 * (i + 1)) % HASH_P, (7_919 * (i + 1) + 12_345) % HASH_P)
        for i in range(k)
    ]


def with_content_hash(df: DataFrame, text_col: str, out: str = "content_hash") -> DataFrame:
    """Exact-dedup key: md5 of the raw text."""
    return df.withColumn(out, F.md5(F.col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str) -> DataFrame:
    """Normalization fingerprint + polynomial rolling hash over tokens.

    ``fingerprint``: md5 of the space-joined token stream — invariant to
    punctuation, case and whitespace. ``rolling_hash``: left fold
    ``acc*31 + h(tok) mod P`` — order-sensitive, cheap to compare/band.
    """
    toks = tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: hashed(t))
    rolling = F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % HASH_P,
    )
    return df.withColumn("fingerprint", F.md5(F.array_join(toks, " "))).withColumn(
        "rolling_hash", rolling
    )


def canonicalize(df: DataFrame, id_col: str, group_col: str) -> DataFrame:
    """min-id canonical per duplicate group + is_dup flag.

    One shuffle keyed on the (high-cardinality, uniformly distributed) hash —
    the balanced-by-construction partitioning exact dedup wants at scale.
    """
    w = Window.partitionBy(group_col)
    return df.withColumn("canonical_id", F.min(id_col).over(w)).withColumn(
        "is_dup", (F.col(id_col) != F.col("canonical_id")).cast("int")
    )


def minhash_signature(shingle_hashes: Column, k: int = MINHASH_K) -> Column:
    """k-wide MinHash signature over ALREADY-HASHED shingles (array<bigint>,
    e.g. functions.text.token_ngram_hashes).

    k cheap modular permutations of the shared base hash — never k hash
    passes over the text. Empty shingle sets get sentinel P (so empty docs
    never collide with real minima).
    """

    def perm(a: int, b: int):
        # Closure factory, NOT a default-arg lambda: PySpark counts lambda
        # parameters to pick the higher-order-function arity, so defaults
        # would be misread as the (value, index, ...) variant.
        return lambda h: (h * a + b) % HASH_P

    mins = [
        F.coalesce(F.array_min(F.transform(shingle_hashes, perm(a, b))), F.lit(HASH_P))
        for a, b in minhash_coeffs(k)
    ]
    return F.array(*mins)


def lsh_band_keys(sig: Column, bands: int, rows: int) -> Column:
    """Band the signature: array of ``bands`` BIGINT keys.

    Each band key is the md5-fold (:func:`md5_long`) of the joined sig
    slice rather than the joined string itself: the banding shuffle carries
    8 bytes per (doc, band) instead of a ~40-byte string — at 100 TB the
    candidate equi-join shuffles O(bands x corpus), so key width IS the
    shuffle width. md5 is engine-portable, so the DuckDB oracles mirror the
    fold exactly (a 60-bit fold collision merges two buckets identically on
    both sides, and any extra candidate still faces exact verification)."""
    return F.array(
        *[
            md5_long(
                F.concat_ws(
                    "_", *[sig[b * rows + r].cast("string") for r in range(rows)]
                )
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    docs: DataFrame, id_col: str, band_keys_col: str, bands: int
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing >= 1 LSH band bucket.

    Explode to (band_no, key) — shuffle is O(bands x |docs|) — then a
    bucket-local self-equi-join. No all-pairs comparison ever happens; a
    bucket only grows when signatures truly collide.
    """
    keyed = docs.select(
        F.col(id_col),
        F.posexplode(F.col(band_keys_col)).alias("band_no", "band_key"),
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col("band_no"), F.col("band_key")
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col("band_no"), F.col("band_key")
    )
    return (
        a.join(b, ["band_no", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    shingles_col: str,
    threshold: float,
    scale: int = 6,
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets for candidate pairs only.

    Two equi-joins bring the (bounded-size) shingle arrays to the pair rows;
    intersection/union are integer set ops, ratio rounded for stable output.
    """
    da = docs.select(F.col(id_col).alias("id_a"), F.col(shingles_col).alias("sh_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col(shingles_col).alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = F.round(inter.cast("double") / F.nullif(union, F.lit(0)).cast("double"), scale)
    return (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_CC_CONF_LOCK = threading.Lock()


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iters: int = 25,
    algorithm: str = "auto",
    switch_after: int = 8,
) -> DataFrame:
    """Transitive near-dup clusters: min-label propagation to fixpoint.

    ``pairs`` is an undirected edge list (``id_a``, ``id_b`` — e.g. the
    verified output of the MinHash/SimHash detectors); ``nodes`` supplies
    the full id universe so singletons become their own cluster. Returns
    ``(id_col, cluster_id)`` where ``cluster_id`` is the minimum id
    reachable through any chain of near-dup pairs — the canonical document
    every transitive duplicate collapses to.

    Execution is Pregel-style: each round joins the current labels to the
    symmetric edge list and folds neighbor contributions + each node's own
    label through ONE partial-aggregated ``groupBy(id).min(label)`` (the
    map-side combine also absorbs degree skew — a hub node's contributions
    collapse per map partition before the shuffle). Only edge-touched nodes
    enter the loop (a singleton's label cannot change; they rejoin via one
    left join at the end), so per-round state is bounded by the dup-graph,
    not the corpus. Rounds needed = max component diameter (near-dup
    clusters are shallow — review chains, not paths). Convergence is
    detected with a single ``sum(label)`` action per round (labels only
    ever decrease, so an unchanged sum IS the fixpoint — no extra diff
    join), and each round's result is persisted while the previous round
    is dropped, so lineage stays one round deep instead of growing
    multiplicatively.

    AQE is switched off for the loop body only (saved/restored around it):
    the per-round plan is fixed and operates on persisted state whose
    partitioning the loop controls, so AQE's runtime re-planning adds one
    extra query-stage job per shuffle per round — measured 3x the loop
    wall-time at sf0.1 — and buys nothing here (coalescing is moot on
    pre-sized state; skew is handled by the partial agg above).

    Propagation needs one round per unit of component DIAMETER, so a long
    chain (or adversarial path graph) would run to ``max_iters`` without
    converging. ``algorithm`` picks the escape hatch:

    - ``"auto"`` (default): propagate up to ``switch_after`` rounds; if the
      fixpoint hasn't been reached — the measured signal that components
      are still growing, i.e. diameter exceeds the round budget — contract
      the remaining graph with the alternating large-star / small-star
      algorithm [Kiveris et al., "Connected Components in MapReduce and
      Beyond", 2014], which converges in O(log^2 n) rounds regardless of
      diameter, then compose the two label maps. Dedup graphs (shallow
      review-chain components) converge in ~3 propagation rounds and never
      hit the switch, so the default plan is unchanged for them.
    - ``"propagation"``: plain min-label propagation for ``max_iters``.
    - ``"star"``: alternating star contraction from round one.
    """
    # persist(): the pair source is typically an expensive detector pipeline
    # (MinHash banding + verification); without materialization every
    # propagation round re-executes it through the join lineage (measured:
    # ~2x the whole clustering cost at sf0.1).
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .persist()
    )
    # Materialize the edge cache with its own count, under SESSION confs
    # (r17): this is the only job that runs the detector pipeline — it
    # wants AQE and corpus-sized shuffle partitions. Everything after it
    # reads the (tiny) cache. Previously the seed aggregation materialized
    # the cache as a side effect, which executed the detector lineage under
    # both union branches in one job and left the co-partitioning shuffle
    # to a separate job; the count also supplies the loop-partition sizing
    # BEFORE the first loop-keyed shuffle, so the seed can reuse it.
    n_edges = edges.count()

    spark = pairs.sparkSession
    if n_edges == 0:
        # No edges at all: every node is its own cluster; skip the loop
        # (and its conf juggling) entirely.
        edges.unpersist()
        return nodes.select(
            F.col(id_col), F.col(id_col).alias("cluster_id")
        )

    # Size the loop's shuffles to the DUP-GRAPH state, not the session
    # default: the session's shuffle.partitions is provisioned for
    # corpus-sized scans, while per-round loop state is orders of magnitude
    # smaller (the near-dup node set). With AQE off (below), nothing else
    # right-sizes these exchanges, and a tiny graph shuffled across hundreds
    # of partitions pays pure task-scheduling overhead each round — measured
    # ~0.9 s/round at sf0.1 on local[32] for a 469-node graph. ~500k edge
    # rows (the larger of the two per-round shuffled frames; ≈16 B each)
    # per partition keeps partitions well under executor memory at any
    # scale; clamped to the session default so a 100 TB dup graph never
    # gets FEWER partitions than the cluster is sized for.
    aqe_key = "spark.sql.adaptive.enabled"
    shuf_key = "spark.sql.shuffle.partitions"
    # The loop pins SESSION-level confs (AQE off, state-sized shuffle
    # partitions) for its own fixed round plan; a concurrent query compiled
    # on the same session during that span would inherit them. The lock
    # makes concurrent connected_components calls safe (no save/restore
    # race); callers that multiplex OTHER heavy queries onto one session
    # concurrently (e.g. a server) must serialize against this themselves —
    # the API shell's _STATE_LOCK does.
    _CC_CONF_LOCK.acquire()
    aqe_was = spark.conf.get(aqe_key, "true")
    shuf_was = int(spark.conf.get(shuf_key, "200"))
    loop_partitions = max(1, min(shuf_was, (n_edges + 499_999) // 500_000))
    spark.conf.set(aqe_key, "false")
    spark.conf.set(shuf_key, str(loop_partitions))
    try:
        # Co-partition the (cached, tiny) edge list on the join key once so
        # every round's join reuses the layout instead of re-exchanging the
        # edges; labels come pre-partitioned on id by each round's groupBy.
        # The seed labels — propagation round 1 pre-applied (r16): round 1
        # from identity labels is exactly min(id, min neighbor), ONE
        # aggregation over the symmetric edges, so a diameter-1 component
        # (the common near-dup pair/star) converges after one loop round —
        # are computed FROM the co-partitioned frame in the same job
        # (groupBy("src") reuses the repartition("src") layout: one job
        # materializes both, no extra exchange — r17).
        part_edges = edges.repartition(loop_partitions, "src").persist()
        labels = (
            part_edges.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select(
                F.col("src").alias("id"),
                F.least(F.col("src"), F.col("__mn")).alias("label"),
            )
            .persist()
        )
        prev_sum = labels.agg(F.sum("label")).first()[0]
        edges.unpersist()
        edges = part_edges
        converged = False
        # propagation: full budget, never contracts; auto: bounded budget,
        # contracts on non-convergence; star: no propagation, contracts always.
        rounds = {"propagation": max_iters, "auto": min(switch_after, max_iters)}.get(
            algorithm, 0
        )
        for _ in range(rounds):
            contrib = edges.join(labels, edges["src"] == labels["id"]).select(
                F.col("dst").alias("id"), "label"
            )
            # localCheckpoint, not persist: a persist alone leaves every
            # round's operator tree nested inside the next round's plan, so
            # Catalyst analysis grows per round even though execution reads
            # the cache — measured 1.1 s -> 5.2 s/round by round 5 on a
            # 3.3k-node graph (the cross-modal paired graph), where
            # truncated lineage holds rounds flat. Same rationale (and
            # executor-loss trade) as _alternating_star's checkpoint below.
            # eager=False (r16): the convergence sum right below is the
            # round's first action, so it MATERIALIZES the checkpoint as a
            # side effect — one job per round instead of two (the plan it
            # runs is still only one round deep: ``labels`` was
            # checkpointed last round).
            new_labels = (
                contrib.unionAll(labels)
                .groupBy("id")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=False)
            )
            new_sum = new_labels.agg(F.sum("label")).first()[0]
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
        if not converged and algorithm != "propagation":
            # Components are still growing after the propagation budget —
            # diameter exceeds the round count. Contract the REMAINING graph
            # (edges with both endpoints mapped to their current labels,
            # self-loops dropped — already-converged components vanish here)
            # with the alternating star algorithm, then compose label maps:
            # final(id) = star(propagated(id)).
            lab_src = labels.select(F.col("id").alias("src"), F.col("label").alias("lu"))
            lab_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
            contracted = (
                edges.join(lab_src, "src")
                .join(lab_dst, "dst")
                .select(
                    F.least("lu", "lv").alias("u"), F.greatest("lu", "lv").alias("v")
                )
                .where(F.col("u") != F.col("v"))
                .distinct()
                .persist()
            )
            star_edges, _ = _alternating_star(contracted, max_rounds=max_iters)
            star_lab = (
                star_edges.select(F.col("v").alias("sid"), F.col("u").alias("slabel"))
                .groupBy("sid")
                .agg(F.min("slabel").alias("slabel"))
                .persist()
            )
            composed = (
                labels.join(star_lab, labels["label"] == star_lab["sid"], "left")
                .select(
                    "id",
                    F.coalesce(F.col("slabel"), F.col("label")).alias("label"),
                )
                .persist()
            )
            composed.count()
            labels.unpersist()
            star_lab.unpersist()
            star_edges.unpersist()
            labels = composed
    finally:
        spark.conf.set(aqe_key, aqe_was)
        spark.conf.set(shuf_key, str(shuf_was))
        _CC_CONF_LOCK.release()

    # The final labels are materialized (the convergence action ran on
    # them); the edge cache has served its purpose. The labels cache itself
    # must stay: the returned frame reads THROUGH it (its lineage chains
    # every unpersisted round), so it is left for LRU eviction — callers
    # issuing many clusterings on one long-lived session should
    # clearCache()/unpersist after consuming the result (the bench harness
    # does exactly that between queries).
    edges.unpersist()
    return nodes.select(F.col(id_col)).join(
        labels.select(F.col("id").alias(id_col), "label"), id_col, "left"
    ).select(
        id_col, F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id")
    )


def _alternating_star(und: DataFrame, max_rounds: int = 25) -> tuple[DataFrame, int]:
    """Alternating large-star / small-star contraction [Kiveris et al. 2014].

    ``und`` is a canonical undirected edge list ``(u, v)`` with ``u < v``,
    distinct, persisted (it is unpersisted here after the first round).
    Returns ``(star_edges, rounds)`` where ``star_edges`` is the converged
    edge set — a union of depth-1 stars, each edge ``(root, child)`` with
    ``root`` the component minimum — persisted and materialized.

    Each round runs one large-star then one small-star step:

    - large-star(u): for every neighbor ``v > u``, emit ``(v, m)`` where
      ``m = min(neighbors(u) + [u])`` — hooks big nodes onto the local min;
    - small-star(u): over edges oriented high->low, emit ``(lo, m)`` for
      every low neighbor plus ``(u, m)`` with ``m = min(low neighbors)`` —
      flattens the low side onto the min.

    Both steps preserve connectivity, labels only ever decrease, and the
    combination converges to component-min stars in O(log^2 n) rounds on
    ANY topology — including the long-path / giant-component skew that
    defeats per-diameter propagation. Convergence is detected by edge-set
    stability: (count, sum(xxhash64(u, v))) unchanged across a round.

    Every step is groupBy/join/distinct on the (small, contracted) dup
    graph under the caller's pinned loop confs — per-round shuffle volume
    is O(|edges|), never all-pairs. Each round's result is cut over to a
    ``localCheckpoint(eager=True)``, which TRUNCATES the logical plan, not
    just the physical lineage: a persist() alone leaves every round's
    operator tree nested inside the next round's plan (the union+join
    structure multiplies the tree ~4x per round), so Catalyst analysis
    time goes exponential around round ~10 even though execution reads
    the cache. The checkpointed blocks live on executors (lost-executor
    recompute is not needed here — the loop re-derives from the caller's
    persisted inputs on failure by rerunning, which is the right trade
    for an iterative driver loop).
    """
    # Edge-set signature: count + exact decimal sum of per-edge hashes
    # (decimal, not long — 2^63-scale hashes summed under ANSI mode overflow).
    def _sig(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        ).first()
        return (row[0], int(row[1] or 0))

    rounds = 0
    prev = _sig(und)
    for _ in range(max_rounds):
        sym = und.select("u", "v").unionAll(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: m(u) = min over u's neighborhood incl. u (m < v always,
        # because m <= u and the emit is gated on v > u).
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        big = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over (u=lo, v=hi): m(v) = min of v's low neighbors.
        mins2 = big.groupBy("v").agg(F.min("u").alias("m"))
        nxt = (
            big.join(mins2, "v")
            .select(F.col("u").alias("a"), F.col("m").alias("b"))
            .unionAll(mins2.select(F.col("v").alias("a"), F.col("m").alias("b")))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .where(F.col("u") != F.col("v"))
            # eager=False: the _sig convergence action right below is the
            # round's first job and materializes the checkpoint as a side
            # effect — one job per round instead of two (r16; same fusion
            # as the propagation loop above).
            .localCheckpoint(eager=False)
        )
        rounds += 1
        cur = _sig(nxt)
        und.unpersist()
        und = nxt
        if cur == prev:
            break
        prev = cur
    return und, rounds


def simhash32(toks: Column) -> Column:
    """32-bit SimHash of a token array (duplicates weight naturally).

    Per bit: sum over tokens of +-1 by the token-hash bit, sign → bit. All
    integer arithmetic — exact and engine-independent. One md5 per token
    (single fold with a 32-wide array accumulator), not one per (token, bit).
    """
    zeros = F.array(*[F.lit(0).cast("bigint") for _ in range(32)])
    bitsums = F.aggregate(
        toks,
        zeros,
        lambda acc, t: F.zip_with(
            acc,
            # Unrolled: shift amounts must be Python ints for the DSL; the
            # md5 subtree is shared, and codegen subexpression elimination
            # computes it once per token.
            F.array(
                *[
                    (F.shiftright(md5_long(t), b).bitwiseAND(F.lit(1))).cast("bigint") * 2 - 1
                    for b in range(32)
                ]
            ),
            lambda a, c: a + c,
        ),
    )
    out = F.lit(0).cast("bigint")
    for b in range(32):
        out = out + F.when(bitsums[b] > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def simhash_band_keys(simhash: Column, bytes_: int = 4) -> Column:
    """Byte-banded keys: docs within small Hamming distance share >= 1 byte
    band with high probability (pigeonhole: distance < bytes_ guarantees it).
    """
    return F.array(
        *[
            F.shiftright(simhash, 8 * j).bitwiseAND(F.lit(255)).cast("string")
            for j in range(bytes_)
        ]
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
