"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{name: sec, ...}, "sf": ...}.

Each query is forced with a noop-format write (full execution, no driver
transfer). ``hmm_fit`` runs 3 EM iterations; its own actions are its cost.

Container wall-clock is 2-3x noisy, so every query (except the long-running
``hmm_fit``) is executed ``$SPARK_GRAFT_BENCH_RUNS`` times (default 2) and the
per-query number reported is the MINIMUM across runs — the repeated-run
minimum is the stable statistic for round-over-round regression comparison.

Noise defense (VERDICT-r9 #2: the official r9 record was ~1.8x inflated by a
contended host window — min-of-2 over a 148-face board has no protection
against a noisy hour): after the board completes, any query measuring >2x its
BEST-KNOWN record is re-run once more and the minimum kept; the ``reruns``
field records {name: [first_min, rerun, anchor]} so a regression that
SURVIVES the re-run is distinguishable from one the re-run cleared.

The anchor is the rolling per-face minimum across rounds (the ``best`` map
in the committed BENCH_parsed.json, lazily seeded from ``queries`` on first
read), NOT the last round's record: anchoring to the prior round alone let
the r9-contaminated ``hmm_fit`` family (20.6 s recorded vs ~3.8 s isolated)
bless an 18.7 s r10 measurement as "under 2x prior" — a contaminated record
must never become the yardstick that hides the next contamination.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from baum_welch_spark.session import get_spark

# queries whose callable already executes internally (collect-based loop)
SELF_EXECUTING = {"hmm_fit"}
# iterative trainers: a repeat doubles a multi-job training loop for little
# signal — time them once (same policy as hmm_fit)
SINGLE_RUN = SELF_EXECUTING | {
    "bpe_merges",
    "quality_classifier",
    "hmm_fit_grouped",
    "grouped_decode",
    "hmm_select",
    "knn_pq",
    "knn_ivfpq",
    "knn_ivf_kmeans",
    "pagerank_docs",
    # r7: index build + serve, replayed stepwise EM, masked EM, and the
    # 8-generation sequential CDC apply — all multi-job driver loops
    "knn_ivfpq_query",
    "hmm_online",
    "hmm_fit_bakis",
    "cdc_apply_batch",
    "hmm_fit_restarts",
    # r8: EM loops and the build+append+search serving lifecycle
    "hmm_fit_semisup",
    "ghmm_fit",
    "ivfpq_append",
    # r9: multi-generation sequential CDC loops (per-year merge jobs +
    # manifest IO; cdc_compact adds a full-rewrite job mid-log)
    "ivm_segment_stats",
    "cdc_time_travel",
    "cdc_changes",
    "cdc_compact",
    # r10: real Structured Streaming queries (checkpoint/state + per-file
    # micro-batches) — one run is the honest cost
    "ivm_stream_segment_stats",
    "spend_alerts_stream",
    # r11: same class — windowed counts + gap sessions through readStream
    "windowed_counts_stream",
    "sessions_stream",
    "view_purchase_stream_join",
    "score_stream",
    # r11: five-stage corpus build (pair-gen + components twice + gate)
    "prepare_training_corpus",
    # late r11: distributed grouped EM — a multi-job driver loop like
    # hmm_fit_grouped — and the streaming HLL (readStream micro-batches)
    "hmm_fit_grouped_dist",
    "hll_distinct_stream",
    # late r11 continuation: the streaming EWMA twin (readStream micro-batches)
    "ewma_spend_stream",
}

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "event_pivot",
    "events_rollup",
    "asof_purchase_view",
    "top_event_per_user",
    "sessionize",
    "seq_decode_names",
    "value_quantiles",
    "viewers_no_purchase",
    "seq_build",
    "stripe_agg",
    "normalize",
    "convergence_distance",
    "dedup_exact",
    "fingerprint_clusters",
    "neardup_jaccard",
    "minhash_lsh",
    "simhash",
    "token_stats",
    "bpe_token_stats",
    "doc_quality",
    "lang_id",
    "doc_fingerprint",
    "vocab_topk",
    "bigram_lm_score",
    "decontaminate",
    "tfidf_top_terms",
    "time_bucket_gapfill",
    "clean_corpus",
    "cap_per_source",
    "weighted_sample",
    "emb_norms",
    "knn_brute",
    "knn_ivf",
    "q4_late_orders",
    "daily_revenue_ma7",
    "user_type_stats",
    "approx_distinct_users",
    "purchase_view_context",
    "salted_value_stats",
    "customers_without_orders",
    "repeat_buyer_days",
    "props_k_stats",
    "user_spend_rank",
    "events_cube",
    "value_approx_quantiles",
    "knn_ivf_kmeans",
    "dedup_clusters",
    "stratified_sample",
    "viterbi_decode",
    "seq_scores",
    "cosine_neardup",
    "cosine_neardup_lsh",
    "repetition_stats",
    "pii_redact",
    "line_dedup",
    "pack_sequences",
    "chunk_documents",
    "mixture_sample",
    "semantic_dedup",
    "bm25_topk",
    "decontaminate_bloom",
    "zorder_events",
    "emb_covariance",
    "emb_pca",
    "pca_power_parity",
    "logreg_gd_parity",
    "quality_classifier",
    "bpe_merges",
    "vocab_topk_cms",
    "user_spend_deciles",
    "corpus_report",
    "ohlc_bars",
    "trigram_lm_score",
    "cohort_retention",
    "rolling_user_spend",
    "hmm_fit_grouped",
    "hmm_fit",
]


def sidecar_for(sf_dir: str, repo: str) -> str:
    """Sidecar path for a run: the committed BENCH_parsed.json anchor is
    reserved for the default sf0.1 board — a different-scale run (10x
    replica, sf1, ...) must neither clobber nor consult it."""
    if os.path.realpath(sf_dir) == os.path.realpath("/root/testdata/sf0.1"):
        return os.path.join(repo, "BENCH_parsed.json")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "alt"
    return os.path.join(repo, f"BENCH_parsed_{tag}.json")


def names_digest(timings: dict[str, float]) -> str:
    """Integrity digest of the COMPLETE timed-name set (VERDICT-r14 #2):
    travels on the printed line next to the slowest-62 map so a consumer
    can tell "fell out of the slowest-map" (digest unchanged) from
    "silently dropped" (digest changes). Order-insensitive, timing-
    insensitive by construction."""
    return hashlib.sha256(",".join(sorted(timings)).encode()).hexdigest()[:16]


def load_face_hashes(repo: str) -> dict[str, str]:
    """Current face source-hash manifest (tools/face_manifest.py output) —
    the identity of each face's computation + oracle."""
    try:
        with open(os.path.join(repo, "tests", "fixtures", "face_hashes.json")) as f:
            d = json.load(f)
        return {k: v for k, v in d.items() if isinstance(v, str)}
    except (OSError, ValueError):
        return {}


def load_anchor(sidecar: str, cur_hashes: dict[str, str]) -> dict[str, float]:
    """Best-known per-face record: the rolling ``best`` map merged under the
    last record's ``queries`` (which seeds pre-upgrade sidecars). The anchor
    for the noise-outlier re-run pass — see the module docstring for why the
    last round's record alone is not a safe anchor.

    Anchor reset on face REDEFINITION (VERDICT-r13 #2 "what's wrong"): an
    anchor is the rolling minimum OF A COMPUTATION — when a face's source
    hash changes (the manifest detects it), the old minimum describes a
    different face and would mislabel the new one's honest cost as a
    regression (or mask a real one: bpe_merges kept its old-twin 3.81 s
    anchor after r13 swapped in the real distributed trainer at ~5.2 s
    quiet). A face whose recorded hash differs from the current manifest
    hash is dropped from the anchor map and re-seeds from this run's
    record. A sidecar with no recorded hashes (pre-upgrade) keeps all
    anchors — no information is not a redefinition."""
    prior: dict[str, float] = {}
    try:
        with open(sidecar) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return prior
    prior = {
        k: v for k, v in (rec.get("queries", {}) or {}).items()
        if isinstance(v, (int, float))
    }
    for k, v in (rec.get("best", {}) or {}).items():
        if isinstance(v, (int, float)) and (k not in prior or v < prior[k]):
            prior[k] = v
    old_hashes = rec.get("face_hashes", {}) or {}
    redefined = [
        k for k in list(prior)
        if k in old_hashes and k in cur_hashes and old_hashes[k] != cur_hashes[k]
    ]
    for k in redefined:
        del prior[k]
    if redefined:
        print(
            f"bench: anchors reset for redefined faces: {sorted(redefined)}",
            file=sys.stderr,
        )
    return prior


def roll_best(
    timings: dict[str, float], prior: dict[str, float], known: set[str]
) -> dict[str, float]:
    """Next round's anchors: min(this round, best known) per face, carrying
    forward anchors for known faces not timed this run (partial board after
    an error) so one bad round can't orphan them. A contaminated record can
    only ever RAISE an anchor; the min repairs it on the next clean run."""
    best = {
        k: round(min(v, prior[k]), 3) if k in prior else v
        for k, v in timings.items()
    }
    for k, v in prior.items():
        if k not in best and k in known:
            best[k] = v
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None  # cosmetic metadata; never abort the bench over a dir name
    spark = get_spark(app_name="baum-welch-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # Any queries() entry not yet placed in HEADLINE still gets benchmarked:
    # auto-append (before the long-running self-executing tail) rather than
    # crash — a missing name must never cost the round its bench numbers.
    missing = sorted(set(qs) - set(HEADLINE))
    if missing:
        print(f"bench: auto-appending unlisted queries: {missing}", file=sys.stderr)
        tail = [n for n in HEADLINE if n in SINGLE_RUN]
        head = [n for n in HEADLINE if n not in SINGLE_RUN]
        HEADLINE[:] = head + missing + tail

    # warm the JVM + parquet footers so per-query numbers measure the plans
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm the Arrow Python workers too — otherwise the first pandas-UDF
    # query in the list absorbs worker spin-up into its timing
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    repo = os.path.dirname(os.path.abspath(__file__))
    # anchor read BEFORE this run overwrites the sidecar
    sidecar = sidecar_for(sf_dir, repo)
    if os.path.basename(sidecar) != "BENCH_parsed.json":
        print(f"bench: non-default sf dir; sidecar -> {sidecar}", file=sys.stderr)
    cur_hashes = load_face_hashes(repo)
    prior = load_anchor(sidecar, cur_hashes)
    timings: dict[str, float] = {}
    run_counts: dict[str, int] = {}
    reruns: dict[str, list[float]] = {}
    error = None

    def time_once(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        if name not in SELF_EXECUTING:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return time.time() - t0

    def board_hygiene(i: int) -> None:
        """Between-face cleanup, OUTSIDE any timing (VERDICT-r13 #1: faces
        ran 2-4x hot only on full-board runs — accumulation, not plans).
        Eagerly drop finished faces' scratch dirs, and every 20 faces force
        a driver JVM GC so the ContextCleaner actually releases accumulated
        shuffle files/broadcasts mid-board instead of waiting for the
        periodic-GC tick."""
        from baum_welch_spark.session import drain_scratch

        drain_scratch()
        if i % 20 == 19:
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass  # py4j hiccup must never cost the board

    try:
        for i, name in enumerate(HEADLINE):
            if name not in qs:  # tolerate a renamed/removed query too
                continue
            n_runs = 1 if name in SINGLE_RUN else runs
            best = min(time_once(name) for _ in range(n_runs))
            timings[name] = round(best, 3)
            run_counts[name] = n_runs
            board_hygiene(i)
        # noise-outlier pass: a face >2x its prior-round record (and above a
        # 1 s floor — sub-second jitter is not worth a Spark job) gets ONE
        # more run after the board, when the host window that inflated it has
        # likely moved on; keep the minimum. Survivors of the re-run are real
        # regressions; cleared ones were contention.
        for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
            p = prior.get(name)
            if isinstance(p, (int, float)) and p > 0 and t > 1.0 and t > 2.0 * p:
                again = time_once(name)
                reruns[name] = [t, round(again, 3), p]
                timings[name] = min(t, round(again, 3))
                run_counts[name] = run_counts.get(name, 1) + 1
    except Exception as e:  # emit the partial timings rather than nothing
        error = f"{type(e).__name__}: {e}"
    finally:
        total = round(sum(timings.values()), 3)
        best = roll_best(timings, prior, set(qs))
        out = {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "runs_per_query": runs,
            # per-query actual run counts: iterative single-run trainers
            # (runs == 1) must not be compared round-over-round against
            # min-of-N numbers as if they were warmed minima
            "runs": run_counts,
            # [first_min, rerun, best_known_anchor] per noise-outlier
            # re-run: a face still slow after the re-run is a real regression
            "reruns": reruns,
            # rolling per-face minimum across rounds — next round's
            # noise-outlier anchor (a contaminated single-round record can
            # only ever RAISE an anchor; the min repairs it)
            "best": best,
            # face identity at record time: a future run whose manifest
            # hash differs resets that face's anchor (redefined face)
            "face_hashes": cur_hashes,
            "timing": "min_of_runs (iterative trainers: single run)",
        }
        # Integrity signal for the PRINTED line (VERDICT-r14 #2): the line
        # keeps only the ~62 slowest faces, so a consumer diffing two rounds'
        # printed maps sees slowest-map churn as "dropped"/"new" queries. A
        # digest of the COMPLETE sorted timed-name set travels with the line
        # (additions-only): a genuinely missing face changes the digest, a
        # face that merely got faster does not.
        out["names_sha256"] = names_digest(timings)
        if error is not None:
            out["error"] = error
        # Sidecar with the full parsed result: the driver's BENCH_r{N}.json
        # stores only the LAST 2000 chars of stdout and json-parses the
        # final line — the full 120-query line is ~3.5 KB, so it has been
        # truncated (and "parsed" null) every round since the surface grew
        # past ~50 queries (r3+). The full record lives here:
        try:
            with open(sidecar, "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
        except OSError as e:
            print(f"bench: sidecar write failed: {e}", file=sys.stderr)
        # ...and the printed line is made to FIT the driver's 2000-char
        # tail: keep the contract keys, but if the full queries map would
        # blow the budget, keep only the slowest entries that fit and say
        # so. A parsed line with the total + the slowest queries beats a
        # complete-but-unparseable one.
        line = json.dumps(out)
        if len(line) > 1900:
            slim = dict(out)
            slim["timing"] = "min_of_runs"
            slim.pop("runs", None)
            slim.pop("reruns", None)
            slim.pop("best", None)
            # the 183-face hash manifest is ~17 KB — keeping it here blew
            # the 1900-char budget before the FIRST query entry fit, so the
            # printed line carried "queries": {} (and, being ~18 KB, would
            # not even survive the driver's 2000-char stdout tail). It
            # lives in the sidecar; the printed line needs the timings.
            slim.pop("face_hashes", None)
            slim["n_reruns"] = len(reruns)  # full detail in BENCH_parsed.json
            by_cost = sorted(timings, key=timings.get, reverse=True)
            slim["n_queries"] = len(timings)
            slim["queries_truncated_to_slowest"] = True
            slim["queries_full"] = os.path.basename(sidecar)
            kept: dict[str, float] = {}
            slim["queries"] = kept
            for q in by_cost:
                kept[q] = timings[q]
                if len(json.dumps(slim)) > 1850:
                    del kept[q]
                    break
            line = json.dumps(slim)
        print(line)
        spark.stop()
    if error is not None:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
