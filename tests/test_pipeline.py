"""Invariant tests for the training-data pipeline operators
(imdbmapreduce_spark/operators/pipeline.py). Oracle parity for the same
queries is covered by test_oracle_parity.py; these lock the semantic
claims the oracles can't express (determinism, disjointness, bin
geometry)."""

from __future__ import annotations

import pyspark.sql.functions as F

from imdbmapreduce_spark.operators import pipeline as P


def test_doc_hash_no_overflow_at_corpus_scale_ids(spark):
    """The membership hash must evaluate for doc_ids past 2^31/2^32 —
    the round-3 advisory showed doc_id * 2654435761 overflowing int64
    (ANSI ArithmeticException) near doc_id ≈ 3.5e9, far below 100 TB
    corpus document counts. The 31-bit fold keeps the product < 2^63
    for ANY int64 doc_id and is the identity below 2^31."""
    from imdbmapreduce_spark.operators.pipeline import _doc_hash

    big = [(2**31 - 1,), (2**31,), (2**40,), (2**62,), (9223372036854775807,)]
    df = spark.createDataFrame(big, "doc_id long")
    got = [r.h for r in df.select(_doc_hash().alias("h")).collect()]
    assert all(0 <= h < 2**32 for h in got), got
    # identity-fold check: small ids hash exactly as the unfolded form
    small = spark.createDataFrame([(12345,)], "doc_id long")
    (h,) = [r.h for r in small.select(_doc_hash().alias("h")).collect()]
    assert h == (12345 * 2654435761) % 2**32


def test_decontamination_disjoint_from_eval(spark, sf_dir):
    """Flagged docs are train-side only, and ratios are well-formed."""
    pdf = P.decontaminate_eval_overlap(spark, sf_dir).toPandas()
    assert (pdf["doc_id"] % P._EVAL_MOD != 0).all()
    assert (pdf["n_hit_shingles"] <= pdf["n_shingles"]).all()
    assert ((pdf["hit_ratio"] > 0) & (pdf["hit_ratio"] <= 1)).all()


def test_repetition_flag_matches_ratio(spark, sf_dir):
    pdf = P.doc_repetition(spark, sf_dir).toPandas()
    assert ((pdf["dup_ratio"] >= 0) & (pdf["dup_ratio"] < 1)).all()
    # integer flag rule ⇔ ratio rule
    assert (pdf["is_repetitive"] == (pdf["dup_ratio"] > 0.2)).all()


def test_mix_resample_is_deterministic_and_nested(spark, sf_dir):
    """Same rows every run; sampled set is a subset of the full corpus
    with the configured per-language rate roughly honored."""
    a = P.corpus_mix_resample(spark, sf_dir).toPandas().sort_values("doc_id")
    b = P.corpus_mix_resample(spark, sf_dir).toPandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    from imdbmapreduce_spark.catalog import table

    full = table(spark, sf_dir, "documents").groupBy("lang").count().toPandas()
    kept = a.groupby("lang").size()
    for _, row in full.iterrows():
        lang, n = row["lang"], row["count"]
        pct = P._MIX_PCT.get(lang, P._MIX_DEFAULT_PCT)
        k = kept.get(lang, 0)
        assert k <= n
        if pct == 100:
            assert k == n  # rate 100% keeps everything
        elif n >= 50:  # binomial tolerance only meaningful with some mass
            assert abs(k / n - pct / 100) < 0.15, (lang, k, n, pct)


def test_token_histogram_partitions_corpus(spark, sf_dir):
    """Every tokenized doc lands in exactly one bucket; token mass adds up."""
    from imdbmapreduce_spark.catalog import table
    from imdbmapreduce_spark.functions import tokens

    hist = P.token_length_histogram(spark, sf_dir).toPandas()
    docs = (
        table(spark, sf_dir, "documents")
        .select(F.size(tokens("text")).alias("n"))
        .filter(F.col("n") > 0)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("total"))
        .first()
    )
    assert hist["n_docs"].sum() == docs["n_docs"]
    assert hist["total_tokens"].sum() == docs["total"]
    # bucket b holds lengths in [2^(b-1), 2^b)
    assert (hist["bucket_min_len"] == 2.0 ** (hist["bucket"] - 1)).all()


def test_sequence_packing_geometry(spark, sf_dir):
    """Offsets tile each shard exactly (no gaps/overlaps), bins are
    consistent with offsets, and a re-run is bit-identical."""
    pdf = P.sequence_packing(spark, sf_dir).toPandas()
    again = P.sequence_packing(spark, sf_dir).toPandas()
    key = ["shard", "off", "doc_id"]
    assert pdf.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )
    B = P._PACK_BUDGET
    for shard, grp in pdf.groupby("shard"):
        g = grp.sort_values("off")
        # contiguous concat stream: each doc starts where the previous ended
        assert g["off"].iloc[0] == 0
        assert (g["off"] + g["n_tokens"]).iloc[:-1].tolist() == g["off"].iloc[1:].tolist()
    assert (pdf["bin_start"] == pdf["off"] // B).all()
    assert (pdf["bin_end"] == (pdf["off"] + pdf["n_tokens"] - 1) // B).all()
    assert (pdf["n_bins"] == pdf["bin_end"] - pdf["bin_start"] + 1).all()
    assert (pdf["n_bins"] >= 1).all()


def _executed_plan(df):
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_map_only_claims_have_zero_exchanges(spark, sf_dir):
    """doc_repetition and corpus_mix_resample claim to fuse into the scan's
    codegen stage — no shuffle may appear in their executed plans."""
    for fn in (P.doc_repetition, P.corpus_mix_resample):
        plan = _executed_plan(fn(spark, sf_dir))
        assert "Exchange" not in plan, fn.__name__


def test_sequence_packing_single_shuffle_on_shard(spark, sf_dir):
    """The packing claim: ONE exchange, keyed on the shard residue, then
    per-shard windows — no global sort."""
    plan = _executed_plan(P.sequence_packing(spark, sf_dir))
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, plan[:2000]
    assert "Exchange rangepartitioning" not in plan  # = no global sort
    assert "hashpartitioning(shard" in plan


def test_sequence_packing_straddle_path(spark):
    """Docs longer than the bin budget must straddle: synthetic corpus
    with known token counts drives the multi-bin arithmetic the fixture
    corpus (all docs < budget) never exercises."""
    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate([700, 40, 1200, 512, 1])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = P.pack_sequences(docs, budget=512, shards=2).toPandas()
    by_id = pdf.set_index("doc_id")
    assert by_id.loc[0, "n_bins"] == (by_id.loc[0, "off"] + 700 - 1) // 512 - by_id.loc[0, "off"] // 512 + 1
    assert by_id.loc[0, "n_bins"] >= 2  # 700 tokens can never fit one 512 bin
    assert by_id.loc[2, "n_bins"] >= 3  # 1200 tokens span >= 3 bins
    # offsets still tile each shard with no gaps
    for _, grp in pdf.groupby("shard"):
        g = grp.sort_values("off")
        assert g["off"].iloc[0] == 0
        assert (g["off"] + g["n_tokens"]).iloc[:-1].tolist() == g["off"].iloc[1:].tolist()
    # exactly-one-token doc occupies exactly one bin
    assert by_id.loc[4, "n_bins"] == 1


def test_snapshot_diff_partitions_account_for_both_versions(spark, sf_dir):
    """The four statuses must exactly tile v1 ∪ v2: |v1| = unchanged +
    changed + removed and |v2| = unchanged + changed + added — the
    bookkeeping identity an auditor checks a release diff against."""
    from imdbmapreduce_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    n_v1 = docs.filter(F.col("doc_id") % 10 != 7).count()
    n_v2 = docs.filter(F.col("doc_id") % 10 != 3).count()
    got = {
        r["status"]: r["n_docs"]
        for r in P.corpus_snapshot_diff(spark, sf_dir).collect()
    }
    assert n_v1 == got.get("unchanged", 0) + got.get("changed", 0) + got.get("removed", 0)
    assert n_v2 == got.get("unchanged", 0) + got.get("changed", 0) + got.get("added", 0)
    # every revised-and-surviving doc (≡5 mod 10, not dropped) is 'changed'
    n_revised = docs.filter((F.col("doc_id") % 10 == 5)).count()
    assert got.get("changed", 0) == n_revised


def test_snapshot_diff_shuffles_digests_not_text(spark, sf_dir):
    """Scale claim: the full-outer join exchanges (doc_id, md5, chars)
    rows — the document body never enters a shuffle."""
    plan = _executed_plan(P.corpus_snapshot_diff(spark, sf_dir))
    for seg in plan.split("Exchange")[1:]:
        assert "text#" not in seg.split("\n")[0], seg[:200]


def test_eval_holdout_quota_and_nesting(spark, sf_dir):
    """Fixed quota per stratum; hash-order prefixes nest (growing the
    quota keeps a superset) — the stability contract of the holdout."""
    import hashlib

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table

    rows = registry.get("eval_holdout_sample").fn(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    pop = {}
    for d in docs:
        pop.setdefault(d.lang, []).append(
            (hashlib.md5(d.text.encode()).hexdigest(), d.doc_id)
        )
    for lang, got in by_lang.items():
        want = [doc for _, doc in sorted(pop[lang])[:20]]
        assert sorted(r.doc_id for r in got) == sorted(want), lang
        assert len(got) == min(20, len(pop[lang]))
        # nesting: the rnk<=10 prefix is the 10 smallest hashes
        inner = {r.doc_id for r in got if r.rnk <= 10}
        assert inner == {doc for _, doc in sorted(pop[lang])[:10]}


def test_shard_manifest_invariants(spark, sf_dir):
    """The shard manifest must be a permutation: every doc exactly once,
    positions contiguous per shard, shards balanced, order independent
    of physical layout, and seed-sensitive."""
    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table

    rows = registry.get("corpus_shard_manifest").fn(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs  # a true permutation

    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(16))
    sizes = [len(v) for v in by_shard.values()]
    # hash striping balances to a few x sqrt(n/16); generous bound
    assert max(sizes) - min(sizes) < 6 * (n_docs / 16) ** 0.5 + 8
    for shard_rows in by_shard.values():
        srt = sorted(shard_rows, key=lambda r: (r.shuffle_key, r.doc_id))
        assert [r.pos_in_shard for r in srt] == list(range(1, len(srt) + 1))

    # layout independence: same result when the scan arrives pre-shuffled
    again = sorted(
        registry.get("corpus_shard_manifest").fn(spark, sf_dir)
        .repartition(7)
        .collect(),
        key=lambda r: r.doc_id,
    )
    assert again == sorted(rows, key=lambda r: r.doc_id)

    # a different seed is a genuinely different permutation
    import imdbmapreduce_spark.operators.pipeline as P

    old = P._SHARD_SEED
    try:
        P.__dict__["_SHARD_SEED"] = "epoch1"
        other = registry.get("corpus_shard_manifest").fn(spark, sf_dir).collect()
    finally:
        P.__dict__["_SHARD_SEED"] = old
    same = sum(
        1
        for a, b in zip(
            sorted(rows, key=lambda r: r.doc_id),
            sorted(other, key=lambda r: r.doc_id),
        )
        if (a.shard, a.pos_in_shard) == (b.shard, b.pos_in_shard)
    )
    assert same < n_docs / 4  # essentially re-dealt


def test_source_divergence_ranks_planted_drift(spark, tmp_path):
    """A source writing from a shifted vocabulary must score higher KL
    than sources sampling the corpus-typical distribution; KL stays
    >= -quantization error for all."""
    from pyspark.sql import Row

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.cache import release_shared_caches

    common = "the data table spark join query row value scan fast"
    rows = []
    did = 0
    for src in ("normal_a", "normal_b"):
        for _ in range(20):
            rows.append(Row(doc_id=did, text=common, lang="en", source=src,
                            n_chars=len(common)))
            did += 1
    drifted = "zzz qqq xxx www vvv uuu ttt sss rrr ppp"
    for _ in range(20):
        rows.append(Row(doc_id=did, text=drifted, lang="en", source="drifted",
                        n_chars=len(drifted)))
        did += 1
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{sf}/documents.parquet")
    release_shared_caches()  # isolate the shared token artifact per corpus
    try:
        out = {
            r.source: r
            for r in registry.get("corpus_source_divergence").fn(spark, sf).collect()
        }
        assert set(out) == {"normal_a", "normal_b", "drifted"}
        for r in out.values():
            assert r.kl_nats >= -1e-6  # KL >= 0 up to quantization
        assert out["drifted"].kl_nats > out["normal_a"].kl_nats + 0.1
        assert abs(out["normal_a"].kl_nats - out["normal_b"].kl_nats) < 1e-9
    finally:
        release_shared_caches()


def test_weighted_sample_matches_python_replay(spark, sf_dir):
    """Efraimidis–Spirakis replay: md5-derived u, quantized ln(u)/w key,
    top-100 — and the sample over-represents heavy docs vs uniform."""
    import hashlib
    import math

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()

    def q(v: float) -> int:
        s = v * 1e12
        return int(math.floor(s + 0.5)) if s >= 0 else -int(math.floor(-s + 0.5))

    scored = []
    for r in docs:
        if r.n_chars <= 0:
            continue
        h = int(hashlib.md5(f"ws0:{r.doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967297.0
        scored.append((r.doc_id, r.source, r.n_chars, q(math.log(u) / r.n_chars)))
    want = sorted(scored, key=lambda x: (-x[3], x[0]))[:100]

    got = sorted(
        registry.get("corpus_weighted_sample").fn(spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert [(r.doc_id, r.source, r.weight, r.es_key_q) for r in got] == want
    assert [r.rnk for r in got] == list(range(1, len(want) + 1))

    # weight-proportional inclusion: sampled docs are heavier on average
    mean_all = sum(x[2] for x in scored) / len(scored)
    mean_sample = sum(r.weight for r in got) / len(got)
    assert mean_sample > mean_all


def test_dsir_importance_weights_matches_python_replay(spark, sf_dir):
    """DSIR hashed-n-gram importance weights replayed in pure Python:
    md5-bucketed unigram+bigram counts, add-one smoothed target/raw
    models, 1e-6-quantized per-bucket log-ratio, exact integer per-doc
    sums."""
    import hashlib
    import math
    from collections import Counter

    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.catalog import table

    B, SCALE = 512, 1_000_000
    rows = table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def toks(t):
        return [x for x in t.strip().split() if x]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    per_doc: dict[int, Counter] = {}
    target: set[int] = set()
    for r in rows:
        ts = toks(r.text)
        feats = Counter(bucket(g) for g in ts)
        feats.update(bucket(f"{a} {b}") for a, b in zip(ts, ts[1:]))
        if feats:
            per_doc[r.doc_id] = feats
        if len(ts) >= 20 and len(set(ts)) * 4 >= len(ts):
            target.add(r.doc_id)

    raw: Counter = Counter()
    tgt: Counter = Counter()
    for d, feats in per_doc.items():
        raw.update(feats)
        if d in target:
            tgt.update(feats)
    tr, tt = float(sum(raw.values())), float(sum(tgt.values()))

    def q(v: float) -> int:  # Spark round(): half away from zero
        s = v * SCALE
        return int(math.floor(s + 0.5)) if s >= 0 else -int(math.floor(-s + 0.5))

    llr_q = {
        b: q(math.log((tgt.get(b, 0) + 1) / (tt + B)) - math.log((cr + 1) / (tr + B)))
        for b, cr in raw.items()
    }

    got = {
        r.doc_id: r
        for r in registry.get("dsir_importance_weights").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(per_doc)
    for d, feats in per_doc.items():
        n_feats = sum(feats.values())
        lw_q = sum(k * llr_q[b] for b, k in feats.items())
        r = got[d]
        assert (r.n_feats, r.logweight_q) == (n_feats, lw_q), d
        assert r.avg_logweight == lw_q / n_feats / SCALE
    # target docs should on average out-score non-target docs
    t_avg = [got[d].avg_logweight for d in per_doc if d in target]
    o_avg = [got[d].avg_logweight for d in per_doc if d not in target]
    if t_avg and o_avg:
        assert sum(t_avg) / len(t_avg) > sum(o_avg) / len(o_avg)


def test_dsir_topk_selection_consistent_with_weights(spark, sf_dir):
    """Selection = strictly-above-the-75th-order-statistic on the
    integerized weight; selected and unselected sets are value-separated
    and the selected fraction is ~25% (ties excluded together)."""
    import math

    from imdbmapreduce_spark import registry

    w = {
        r.doc_id: math.floor(r.logweight_q / r.n_feats)
        for r in registry.get("dsir_importance_weights").fn(spark, sf_dir).collect()
    }
    ordered = sorted(w.values())
    cut = ordered[math.ceil(0.75 * len(ordered)) - 1]

    rows = registry.get("dsir_topk_selection").fn(spark, sf_dir).collect()
    assert {r.doc_id: r.avgw_q for r in rows} == w
    sel = {r.doc_id for r in rows if r.selected}
    assert sel == {d for d, q in w.items() if q > cut}
    assert 0 < len(sel) <= len(w) - math.ceil(0.75 * len(w)) + 1
    assert min(w[d] for d in sel) > max(w[d] for d in w if d not in sel)


def test_filter_ablation_matrix_consistent_with_source_filters(spark, sf_dir):
    """Matrix cells replayed from the four registered verdicts joined in
    Python: diagonal = per-filter drop counts, symmetry bounds, and the
    inclusion-exclusion sanity any >= max(diag), none = base - any."""
    from imdbmapreduce_spark import registry

    gop = {
        r.doc_id: not r.gopher_pass
        for r in registry.get("gopher_quality_flags").fn(spark, sf_dir).collect()
    }
    rep = {
        r.doc_id: bool(r.is_repetitive)
        for r in registry.get("doc_repetition").fn(spark, sf_dir).collect()
    }
    qual = {
        r.doc_id: not r.is_quality
        for r in registry.get("doc_quality").fn(spark, sf_dir).collect()
    }
    cur = {
        r.doc_id: not r.is_canonical
        for r in registry.get("corpus_curation").fn(spark, sf_dir).collect()
    }
    flags = {
        d: {
            "gopher": gop[d],
            "repetition": rep.get(d, False),
            "quality": qual[d],
            "dup": cur[d],
        }
        for d in cur
    }

    got = {
        (r.filter_a, r.filter_b): r.n_docs
        for r in registry.get("filter_ablation_matrix").fn(spark, sf_dir).collect()
    }
    names = ["gopher", "repetition", "quality", "dup"]
    for i, a in enumerate(names):
        for b in names[i:]:
            want = sum(1 for f in flags.values() if f[a] and f[b])
            assert got[(a, b)] == want, (a, b)
    n_any = sum(1 for f in flags.values() if any(f.values()))
    assert got[("any", "any")] == n_any
    assert got[("none", "none")] == len(flags) - n_any
    assert got[("any", "any")] >= max(got[(a, a)] for a in names)


def test_source_temperature_mix_properties(spark, sf_dir):
    """Weights are a probability distribution; epochs is the budget's
    per-source token demand over supply; tempering upweights the
    below-average sources relative to their natural share."""
    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.operators.pipeline import _TEMP_BUDGET

    rows = registry.get("source_temperature_mix").fn(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-9
    total_tokens = sum(r.n_tokens for r in rows)
    for r in rows:
        assert r.epochs == r.weight * _TEMP_BUDGET / r.n_tokens
        natural = r.n_tokens / total_tokens
        # sqrt-tempering moves every share toward uniform: below-average
        # sources gain weight, above-average sources lose it.
        if natural < 1.0 / len(rows) - 1e-12:
            assert r.weight > natural
        elif natural > 1.0 / len(rows) + 1e-12:
            assert r.weight < natural


def test_waterfill_allocation_properties(spark, sf_dir):
    """Water-fill invariants: Σalloc == min(budget, Σcap) exactly; no
    source exceeds its cap; saturated == (alloc == cap) when the budget
    binds; unsaturated allocations differ by at most one token (the
    uniform level plus remainder distribution); and the allocation is
    max-min fair (every unsaturated alloc >= every saturated cap)."""
    from imdbmapreduce_spark import registry
    from imdbmapreduce_spark.operators.pipeline import _WF_BUDGET

    rows = registry.get("source_budget_waterfill").fn(spark, sf_dir).collect()
    total_cap = sum(r.cap for r in rows)
    assert sum(r.alloc for r in rows) == min(_WF_BUDGET, total_cap)
    for r in rows:
        assert 0 <= r.alloc <= r.cap
        assert r.epochs_ppm == r.alloc * 1_000_000 // r.supply
    unsat = [r.alloc for r in rows if not r.saturated]
    sat = [r for r in rows if r.saturated]
    assert all(r.alloc == r.cap for r in sat)
    if unsat:
        assert max(unsat) - min(unsat) <= 1
        assert all(c.cap <= min(unsat) for c in sat)


def test_dedup_token_waterfall_replays_from_registered_stages(spark, sf_dir):
    """The waterfall rows must be exactly reconstructible from the
    registered stage queries it claims to account for (keep sets
    intersect, scrub subtracts corpus-wide span tokens), and monotone:
    docs and tokens never increase down the cascade, drops reconcile
    exactly, ppm is the truncating integer share of raw."""
    from imdbmapreduce_spark import registry

    tok = {
        r.doc_id: len(r.text.split())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    keep1 = {
        r.keep_id
        for r in registry.get("dedup_exact").fn(spark, sf_dir).collect()
    }
    keep2 = keep1 & {
        r.keep_id
        for r in registry.get("neardup_cluster_keepers").fn(spark, sf_dir).collect()
    }
    cut = {}
    for r in registry.get("exact_substr_spans").fn(spark, sf_dir).collect():
        cut[r.doc_id] = cut.get(r.doc_id, 0) + r.span_tokens

    raw_docs, raw_toks = len(tok), sum(tok.values())
    expect = [
        (0, "raw", raw_docs, raw_toks),
        (1, "exact_dedup", len(keep1), sum(tok[d] for d in keep1)),
        (2, "neardup_keepers", len(keep2), sum(tok[d] for d in keep2)),
        (
            3,
            "exactsubstr_scrub",
            len(keep2),
            sum(tok[d] - cut.get(d, 0) for d in keep2),
        ),
    ]
    rows = sorted(
        registry.get("dedup_token_waterfall").fn(spark, sf_dir).collect(),
        key=lambda r: r.stage_idx,
    )
    prev = None
    for r, (idx, name, nd, nt) in zip(rows, expect):
        assert (r.stage_idx, r.stage, r.n_docs, r.n_tokens) == (idx, name, nd, nt)
        assert r.tokens_kept_ppm == nt * 1_000_000 // raw_toks
        if prev is None:
            assert (r.docs_dropped, r.tokens_dropped) == (0, 0)
        else:
            assert r.docs_dropped == prev.n_docs - r.n_docs >= 0
            assert r.tokens_dropped == prev.n_tokens - r.n_tokens >= 0
        prev = r
