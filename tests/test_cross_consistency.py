"""Cross-query coherence: independently-implemented queries must agree
on the facts they share. Each check ties two (or more) registered plans
together, so a semantics drift in one surfaces as a disagreement even if
both stay individually green against their own oracles.
"""

from __future__ import annotations

from imdbmapreduce_spark import registry
from imdbmapreduce_spark.catalog import table


def _rows(name, spark, sf_dir):
    return registry.get(name).fn(spark, sf_dir).collect()


def test_split_counts_cover_the_corpus(spark, sf_dir):
    n_docs = table(spark, sf_dir, "documents").count()
    split_total = sum(r.n_docs for r in _rows("dataset_split", spark, sf_dir))
    assert split_total == n_docs


def test_curation_canonicals_equal_exact_dedup_keepers(spark, sf_dir):
    """corpus_curation's is_canonical flag and dedup_exact's keep_id are
    two implementations of the same min-id-per-content-key policy."""
    canon = {
        r.doc_id for r in _rows("corpus_curation", spark, sf_dir) if r.is_canonical
    }
    keepers = {r.keep_id for r in _rows("dedup_exact", spark, sf_dir)}
    # dedup_exact keys on the same canonical content hash but includes
    # empty-token docs the curation plan filters; canonicals must be a
    # subset, and every curation-visible keeper must agree
    assert canon <= keepers
    curated_ids = {r.doc_id for r in _rows("corpus_curation", spark, sf_dir)}
    assert keepers & curated_ids == canon


def test_cluster_keepers_account_for_every_document(spark, sf_dir):
    n_docs = table(spark, sf_dir, "documents").count()
    total_members = sum(
        r.n_members for r in _rows("neardup_cluster_keepers", spark, sf_dir)
    )
    assert total_members == n_docs


def test_event_counts_agree_across_four_plans(spark, sf_dir):
    n_events = table(spark, sf_dir, "events").count()
    hourly = sum(r.n_events for r in _rows("events_hourly_stats", spark, sf_dir))
    disorder = _rows("events_disorder_profile", spark, sf_dir)[0].n_events
    skew = {r.key_col: r for r in _rows("events_key_skew_profile", spark, sf_dir)}
    rollup = sum(r.n_events for r in _rows("events_rollup_incremental", spark, sf_dir))
    assert hourly == disorder == rollup == n_events
    assert skew["user_id"].n_rows == skew["event_type"].n_rows == n_events


def test_heavy_hitter_top1_matches_skew_profile_hot_key(spark, sf_dir):
    """The exact heavy-hitters table's #1 count IS the skew profiler's
    hottest-key count for user_id — two plans, one fact."""
    top = _rows("events_heavy_hitters_exact", spark, sf_dir)
    top1 = next(r for r in top if r.rnk == 1)
    skew = {r.key_col: r for r in _rows("events_key_skew_profile", spark, sf_dir)}
    assert top1.exact_cnt == skew["user_id"].max_key_cnt


def test_funnel_head_matches_distinct_viewers(spark, sf_dir):
    """Both funnels' first stage is |distinct users with a view| — and
    the windowed funnel can never out-convert the unwindowed one."""
    from pyspark.sql import functions as F

    n_viewers = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    win = {r.stage: r.n_users for r in _rows("events_funnel_conversion", spark, sf_dir)}
    unb = {r.step: r.n_users for r in _rows("events_funnel", spark, sf_dir)}
    assert win["view"] == unb["view"] == n_viewers
    assert win["click"] <= unb["click"]
    assert win["purchase"] <= unb["purchase"]


def test_unigram_token_totals_match_token_stats(spark, sf_dir):
    """doc_unigram_logprob's per-doc token counts must equal
    doc_token_stats' whitespace counts doc-for-doc."""
    lp = {r.doc_id: r.n_tokens for r in _rows("doc_unigram_logprob", spark, sf_dir)}
    ts = {r.doc_id: r.n_tokens for r in _rows("doc_token_stats", spark, sf_dir)}
    assert lp == ts


def test_cms_and_mg_audit_the_same_exact_counts(spark, sf_dir):
    """Both sketch audits reference the shared exact-count artifact: on
    the users both report, the exact columns must be identical, with MG
    bounded above and CMS bounded below by it."""
    mg = {r.user_id: r for r in _rows("events_heavy_hitters_sketch", spark, sf_dir)}
    cms = {r.user_id: r for r in _rows("events_cms_audit", spark, sf_dir)}
    both = set(mg) & set(cms)
    assert both, "audits share no users — test premise broken"
    for u in both:
        assert mg[u].exact_cnt == cms[u].exact_cnt
        # MG underestimates; CMS overestimates — the CMS side's raw est
        # is no longer an emitted column (r7 hash-check conversion), so
        # its half of the sandwich is the in-query verdict flag
        assert mg[u].est <= mg[u].exact_cnt
        assert cms[u].never_undercounts
