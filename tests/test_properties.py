"""Property tests (SURVEY.md §5 item 3): the IMDb query plans vs a
direct Python model on randomized small fixtures — level = min(count, 4),
probe exclusion, case sensitivity, and set-intersection counting hold for
ARBITRARY casts, not just the handcrafted fixture."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from imdbmapreduce_spark.operators.cooccurrence import coactor_query, title_query

_ACTORS = ["Ann", "ann", "Bob", "Cat", "Dan", "Eve", "Fay"]

_movies_strategy = st.lists(
    st.sets(st.sampled_from(_ACTORS), min_size=0, max_size=5).map(sorted),
    min_size=1,
    max_size=8,
).map(
    lambda casts: [(i, f"title{i}", cast) for i, cast in enumerate(casts)]
)


def _py_title(movies, probe_title):
    cast = next((set(a) for _, t, a in movies if t == probe_title), None)
    if cast is None:
        return {}
    out = {}
    for _, t, a in movies:
        if t == probe_title:
            continue
        n = len(set(a) & cast)
        if n >= 1:
            out[t] = (n, min(n, 4))
    return out


def _py_coactor(movies, actor):
    counts: dict[str, int] = {}
    for _, _, a in movies:
        if actor in a:
            for co in set(a):
                if co != actor:
                    counts[co] = counts.get(co, 0) + 1
    return {co: (n, min(n, 4)) for co, n in counts.items()}


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(movies=_movies_strategy)
def test_title_query_matches_python_model(spark, movies):
    df = spark.createDataFrame(movies, "movie_id long, title string, actors array<string>")
    got = {
        r["title"]: (r["n_shared"], r["level"])
        for r in title_query(df, "title0").collect()
    }
    assert got == _py_title(movies, "title0")


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(movies=_movies_strategy)
def test_coactor_query_matches_python_model(spark, movies):
    df = spark.createDataFrame(movies, "movie_id long, title string, actors array<string>")
    got = {
        r["actor"]: (r["cnt"], r["level"]) for r in coactor_query(df, "Ann").collect()
    }
    assert got == _py_coactor(movies, "Ann")  # case-sensitive: 'ann' is a co-actor


def test_round4_queries_invariant_under_shuffle_partitioning(spark, sf_dir):
    """Determinism contract for the round-4 additions: identical results
    under different shuffle-partition counts. Catches accidental
    order/accumulation dependence (float sums, arbitrary tiebreaks) —
    the property every plan in this repo claims via integer/quantized
    math and total ordering. Shared-cache artifacts are released between
    runs so the rebuild really happens under each configuration."""
    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.cache import release_shared_caches

    names = [
        "corpus_snapshot_diff",
        "corpus_manifest",
        "events_distinct_sketch_rollup",
        "image_phash_dupes",
        "ann_pq_topk",
        "doc_quality_logreg",
        "grouping_sets_revenue",
        "doc_readability_udf",
        "events_hourly_gapfill",
    ]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[str, list] = {}
    try:
        for n in ("1", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            release_shared_caches()
            for name in names:
                rows = sorted(
                    (tuple(r) for r in registry.get(name).fn(spark, sf_dir).collect()),
                    key=repr,  # rows may contain NULL group keys
                )
                if name in results:
                    assert results[name] == rows, f"{name} varies at partitions={n}"
                else:
                    results[name] = rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        release_shared_caches()


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)),
        min_size=0,
        max_size=30,
    )
)
def test_connected_components_random_graphs_vs_union_find(spark, edges):
    """Pointer-jumping components equal a Python union-find on ARBITRARY
    random graphs — self-loops, duplicate edges, multiple components,
    isolated nodes — not just the corpus-derived edge list the other
    test covers."""
    from imdbmapreduce_spark.operators.dedup import connected_components

    nodes = list(range(20))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in nodes}

    nodes_df = spark.createDataFrame([(n,) for n in nodes], "node long")
    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    ).limit(len(edges))
    got = {
        r.node: r.cluster_id
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_hamming_pairs_complete_for_3_bits_on_random_fingerprints(spark, data):
    """The shared banded join's pigeonhole guarantee, tested directly on
    the operator: for ARBITRARY 64-bit fingerprints, every pair within
    Hamming distance 3 must be emitted with its exact distance, and no
    emitted pair may exceed 3. Fingerprint sets mix random bases with
    deliberate <=3-bit perturbations so true near pairs always exist."""
    from imdbmapreduce_spark.operators.dedup import hamming_pairs

    bases = data.draw(
        st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=4, unique=True)
    )
    fps = list(bases)
    for b in bases:
        flips = data.draw(st.sets(st.integers(0, 63), min_size=0, max_size=3))
        # flip in UNSIGNED space, then map back to signed int64 — xor on a
        # negative Python int flips bits in an infinite two's-complement
        # and can underflow below -2^63 (hypothesis found base=-1, bit 63)
        u = b & (2**64 - 1)
        for bit in flips:
            u ^= 1 << bit
        fps.append(u - 2**64 if u >= 2**63 else u)
    rows = [(i, fp) for i, fp in enumerate(fps)]

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    want = {
        (i, j): ham(a, b)
        for i, a in rows
        for j, b in rows
        if i < j and ham(a, b) <= 3
    }
    members = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r.doc_a, r.doc_b): r.hamming for r in hamming_pairs(members).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lens=st.lists(st.integers(1, 1500), min_size=1, max_size=12),
    budget=st.sampled_from([128, 512]),
    shards=st.integers(1, 3),
)
def test_pack_sequences_geometry_on_random_corpora(spark, lens, budget, shards):
    """Packing invariants for ARBITRARY doc lengths / budgets / shard
    counts: per-shard offsets tile with no gaps from zero, every doc's
    bin span matches the offset arithmetic, token mass is conserved, and
    no doc is lost."""
    from imdbmapreduce_spark.operators.pipeline import pack_sequences

    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate(lens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = pack_sequences(docs, budget=budget, shards=shards).toPandas()
    assert sorted(pdf["doc_id"]) == list(range(len(lens)))
    assert int(pdf["n_tokens"].sum()) == sum(lens)
    for _, grp in pdf.groupby("shard"):
        g = grp.sort_values("off")
        assert g["off"].iloc[0] == 0
        assert (g["off"] + g["n_tokens"]).iloc[:-1].tolist() == g["off"].iloc[1:].tolist()
    for r in pdf.itertuples():
        first_bin = r.off // budget
        last_bin = (r.off + r.n_tokens - 1) // budget
        assert r.n_bins == last_bin - first_bin + 1


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_scd2_sink_random_cdc_feed_equals_batch_rebuild(spark, tmp_path_factory, data):
    """The streaming SCD-2 apply must equal a direct batch rebuild for
    ARBITRARY in-order CDC feeds cut into arbitrary batch boundaries —
    including same-timestamp runs, single-event keys, and no-change
    updates — and re-applying the final batch must change nothing."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from imdbmapreduce_spark.streaming.upsert import Scd2Sink, read_state

    n_ev = data.draw(st.integers(1, 18))
    events = []
    for seq in range(n_ev):
        events.append(
            (
                data.draw(st.integers(0, 2), label=f"key{seq}"),
                data.draw(st.sampled_from(["A", "B", "C"]), label=f"state{seq}"),
                data.draw(st.integers(0, 5), label=f"t{seq}") * 1000,
                seq,
            )
        )
    # in-order per key: sort by (ts, seq); seq is globally unique
    events.sort(key=lambda e: (e[2], e[3]))
    cut = data.draw(st.integers(0, len(events)), label="cut")
    batches = [b for b in (events[:cut], events[cut:]) if b]

    state_dir = str(tmp_path_factory.mktemp("scd2prop"))
    sink = Scd2Sink(state_dir, key="user_id")
    schema = "user_id long, state string, ts_us long, seq long"
    for i, b in enumerate(batches):
        sink(spark.createDataFrame(b, schema), i)
    sink(spark.createDataFrame(batches[-1], schema), len(batches))  # replay

    got = {
        (r.user_id, r.state, r.valid_from_us, r.valid_to_us, r.is_current, r.version)
        for r in read_state(spark, state_dir).collect()
    }

    # batch rebuild: the registered plan's exact math over all events
    ev = spark.createDataFrame(events, schema)
    w = Window.partitionBy("user_id").orderBy("ts_us", "seq")
    changes = (
        ev.withColumn("prev", F.lag("state").over(w))
        .filter(F.col("prev").isNull() | (F.col("state") != F.col("prev")))
    )
    want = {
        (r.user_id, r.state, r.ts_us, r.valid_to_us, r.is_current, r.version)
        for r in changes.withColumn("valid_to_us", F.lead("ts_us").over(w))
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .withColumn("version", F.row_number().over(w).cast("long"))
        .collect()
    }
    assert got == want


_LM_TOKS = ["the", "a", "xx", "的", "b7", "!", "zzz"]


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(_LM_TOKS), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    )
)
def test_lm_vertical_on_random_corpora(spark, tmp_path_factory, corpus):
    """BPE pair stats and unigram log-prob vs pure-Python replays on
    ARBITRARY corpora — unicode tokens, empty docs, singleton docs —
    not just the generated fixture (the test_lm replays only see
    sf0.001)."""
    import math
    from collections import Counter

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.cache import release_shared_caches

    tmp = tmp_path_factory.mktemp("lmrand")
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/documents.parquet")
    try:
        # --- BPE first-merge pairs ---
        vocab = Counter(t for _, toks in [(i, c) for i, c in enumerate(corpus)] for t in toks)
        pairs: Counter = Counter()
        for tok, n in vocab.items():
            for x, y in zip(tok, tok[1:]):
                pairs[(x, y)] += n
        want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        got = registry.get("bpe_first_merge_stats").fn(spark, str(tmp)).collect()
        assert {(r.c1, r.c2): r.pair_count for r in got} == dict(want)

        # --- unigram log-prob ---
        per_doc = {i: Counter(toks) for i, toks in enumerate(corpus) if toks}
        total = float(sum(sum(c.values()) for c in per_doc.values()))
        gotu = {
            r.doc_id: r
            for r in registry.get("doc_unigram_logprob").fn(spark, str(tmp)).collect()
        }
        assert set(gotu) == set(per_doc)
        if per_doc:
            allc: Counter = Counter()
            for c in per_doc.values():
                allc.update(c)

            def q(v):
                s = v * 1_000_000
                return int(math.floor(s + 0.5)) if s >= 0 else -int(math.floor(-s + 0.5))

            lp_q = {t: q(math.log(n / total)) for t, n in allc.items()}
            for i, c in per_doc.items():
                assert gotu[i].n_tokens == sum(c.values())
                assert gotu[i].logprob_q == sum(k * lp_q[t] for t, k in c.items())
    finally:
        release_shared_caches()


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # user_id
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(min_value=0, max_value=4_000_000_000_000),  # ts_us
        ),
        min_size=1,
        max_size=40,
    )
)
def test_windowed_funnel_matches_python_simulator(spark, tmp_path_factory, events):
    """The 24h-window funnel's semantics — each stage strictly after the
    FIRST qualifying completion of the previous stage and within the
    window of it — replayed in pure Python over random event feeds
    (including boundary timestamps at exactly +window)."""
    import datetime

    from imdbmapreduce_spark import registry

    window_us = 24 * 3600 * 1_000_000
    base = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (i, u, t, base + datetime.timedelta(microseconds=ts))
        for i, (u, t, ts) in enumerate(events)
    ]
    tmp = tmp_path_factory.mktemp("funnel")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    # python simulator
    by_user: dict[int, list] = {}
    for _, (u, t, ts) in zip(rows, events):
        by_user.setdefault(u, []).append((t, ts))

    def first_stage(evs, etype, after=None):
        ok = [
            ts
            for t, ts in evs
            if t == etype
            and (after is None or (after < ts <= after + window_us))
        ]
        return min(ok) if ok else None

    n_view = n_click = n_purchase = 0
    for evs in by_user.values():
        t1 = first_stage(evs, "view")
        if t1 is None:
            continue
        n_view += 1
        t2 = first_stage(evs, "click", after=t1)
        if t2 is None:
            continue
        n_click += 1
        if first_stage(evs, "purchase", after=t2) is not None:
            n_purchase += 1

    got = {
        r.stage: r for r in registry.get("events_funnel_conversion").fn(spark, str(tmp)).collect()
    }
    assert got["view"].n_users == n_view
    assert got["click"].n_users == n_click
    assert got["purchase"].n_users == n_purchase
    if n_view:
        assert got["purchase"].conv_permille == n_purchase * 1000 // n_view
    else:
        assert got["view"].conv_permille is None


# --- banded range joins vs naive reference (operators/rangejoin.py) -------

_rj_point = st.tuples(
    st.integers(0, 2),              # key
    st.integers(-400, 400),         # ts
)
_rj_interval = st.tuples(
    st.integers(0, 2),              # key
    st.integers(-400, 400),         # start
    st.integers(-120, 350),         # length (negative => degenerate)
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(_rj_point, min_size=0, max_size=40),
    intervals=st.lists(_rj_interval, min_size=0, max_size=25),
    bucket=st.sampled_from([1, 7, 100, 1000]),
)
def test_point_in_interval_join_property(spark, points, intervals, bucket):
    """For ANY keys/epochs (negative included), bucket width, and
    degenerate intervals: banded join == naive filter, multiplicity 1."""
    from imdbmapreduce_spark.operators.rangejoin import point_in_interval_join

    p = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(points)],
        "k long, ts long, pid long",
    )
    iv = spark.createDataFrame(
        [(k, s, s + ln, j) for j, (k, s, ln) in enumerate(intervals)],
        "k long, s long, e long, iid long",
    )
    got = sorted(
        (r.k, r.pid, r.iid)
        for r in point_in_interval_join(
            p, iv, keys=["k"], point_ts="ts", start="s", end="e", bucket=bucket
        ).collect()
    )
    pts = [(k, ts, i) for i, (k, ts) in enumerate(points)]
    ivs = [(k, s, s + ln, j) for j, (k, s, ln) in enumerate(intervals)]
    want = sorted(
        (pk, pid, iid)
        for pk, ts, pid in pts
        for ik, s, e, iid in ivs
        if pk == ik and s <= ts < e
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(_rj_interval, min_size=0, max_size=25),
    right=st.lists(_rj_interval, min_size=0, max_size=25),
    bucket=st.sampled_from([1, 7, 100, 1000]),
)
def test_interval_overlap_join_property(spark, left, right, bucket):
    from imdbmapreduce_spark.operators.rangejoin import interval_overlap_join

    L = [(k, s, s + ln, j) for j, (k, s, ln) in enumerate(left)]
    R = [(k, s, s + ln, j) for j, (k, s, ln) in enumerate(right)]
    ldf = spark.createDataFrame(L, "k long, ls long, le long, lid long")
    rdf = spark.createDataFrame(R, "k long, rs long, re long, rid long")
    got = sorted(
        (r.k, r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, keys=["k"], lstart="ls", lend="le",
            rstart="rs", rend="re", bucket=bucket,
        ).collect()
    )
    want = sorted(
        (lk, lid, rid)
        for lk, ls, le, lid in L
        for rk, rs, re, rid in R
        if lk == rk and le > ls and re > rs and ls < re and rs < le
    )
    assert got == want
    assert len(got) == len(set(got))
