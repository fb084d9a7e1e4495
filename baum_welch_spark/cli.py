"""CLI entry point — parity with the reference driver's options
(BaumWelchDriver.java:48-79: input/output/modelIn/numHidden/numObserved/
convergenceDelta/maxIterations), plus decode/score subcommands.

Usage:
  python -m baum_welch_spark.cli train -i /root/testdata/sf0.001 -o /tmp/out \
      --num-hidden 4 --num-observed 5 --max-iterations 10 --convergence-delta 1e-4
  python -m baum_welch_spark.cli decode -i /root/testdata/sf0.001 --model /tmp/out/model-final
  python -m baum_welch_spark.cli score  -i /root/testdata/sf0.001 --model /tmp/out/model-final
"""

from __future__ import annotations

import argparse
import json
import sys

from baum_welch_spark.hmm.model import HMM
from baum_welch_spark.session import get_spark


def _session(app_name: str):
    """(spark, should_stop): reuse a live session if the caller has one
    (notebook / test harness) and leave its lifecycle alone; otherwise
    create one and own it."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    return get_spark(app_name=app_name), True


def _build_sequences(spark, sf_dir: str):
    from baum_welch_spark.operators.sequences import build_sequences
    from baum_welch_spark.sources.io import load_table

    return build_sequences(load_table(spark, sf_dir, "events"))


def cmd_train(args) -> int:
    from baum_welch_spark.hmm.fit import fit, fit_restarts

    spark, _own = _session("baum-welch-train")
    if getattr(args, "emissions", "discrete") == "gaussian":
        return _train_gaussian(spark, args, _own)
    seqs = _build_sequences(spark, args.input)
    finals = None
    mask = None
    if getattr(args, "topology", "full") == "bakis":
        mask = HMM.bakis_mask(args.num_hidden, bandwidth=args.bandwidth)

    def _init():
        if args.model_in:
            return HMM.read(spark, args.model_in)
        if mask is not None:
            return HMM.random_masked(
                args.num_hidden, args.num_observed, mask, seed=args.seed
            )
        return HMM.random(args.num_hidden, args.num_observed, seed=args.seed)

    if args.method == "viterbi":
        from baum_welch_spark.hmm.viterbi_train import fit_viterbi

        if args.restarts > 1:
            print("--restarts is ignored with --method viterbi", file=sys.stderr)
        result = fit_viterbi(
            spark, seqs, _init(),
            max_iter=args.max_iterations,
            tol=args.convergence_delta,
            topology_mask=mask,
        )
    elif mask is not None:
        if args.restarts > 1:
            print("--restarts is ignored with --topology bakis", file=sys.stderr)
        result = fit(
            spark, seqs, _init(),
            max_iter=args.max_iterations,
            tol=args.convergence_delta,
            model_out=args.output,
            topology_mask=mask,
        )
    elif args.restarts > 1 and not args.model_in:
        result, finals = fit_restarts(
            spark, seqs,
            n_hidden=args.num_hidden, n_observed=args.num_observed,
            n_restarts=args.restarts,
            max_iter=args.max_iterations,
            tol=args.convergence_delta,
            base_seed=args.seed,
        )
    else:
        if args.model_in:
            init = HMM.read(spark, args.model_in)
        else:
            # random seed model when none supplied (reference S6,
            # BaumWelchUtils.BuildRandomModel / BaumWelchDriver.java:74-76)
            init = HMM.random(args.num_hidden, args.num_observed, seed=args.seed)
        result = fit(
            spark, seqs, init,
            max_iter=args.max_iterations,
            tol=args.convergence_delta,
            model_out=args.output,
        )
    result.model.write(spark, f"{args.output}/model-final")
    out = {
        "iterations": result.iterations,
        "converged": result.converged,
        "loglik_trace": result.loglik_trace,
        "model_dir": f"{args.output}/model-final",
    }
    if finals is not None:
        out["restart_final_logliks"] = finals
    print(json.dumps(out))
    if _own:
        spark.stop()
    return 0


def _train_gaussian(spark, args, _own) -> int:
    """Gaussian-emission EM over events.value (hmm/gaussian.py); the
    emission range is taken from the data (one min/max aggregate, the
    model-sized side-read convention)."""
    from pyspark.sql import functions as F

    from baum_welch_spark.hmm.gaussian import (
        GaussianHMM,
        build_value_sequences,
        fit_gaussian,
    )
    from baum_welch_spark.sources.io import load_table

    if args.restarts > 1 or getattr(args, "topology", "full") != "full":
        print("--restarts/--topology are discrete-only; ignored with "
              "--emissions gaussian", file=sys.stderr)
    events = load_table(spark, args.input, "events")
    seqs = build_value_sequences(events)
    if args.model_in:
        init = GaussianHMM.read(spark, args.model_in)
    else:
        lo, hi = events.agg(F.min("value"), F.max("value")).first()
        init = GaussianHMM.random(
            args.num_hidden, seed=args.seed, lo=float(lo), hi=float(hi)
        )
    result = fit_gaussian(
        spark, seqs, init,
        max_iter=args.max_iterations, tol=args.convergence_delta,
    )
    result.model.write(spark, f"{args.output}/model-final")
    print(json.dumps({
        "iterations": result.iterations,
        "converged": result.converged,
        "loglik_trace": result.loglik_trace,
        "model_dir": f"{args.output}/model-final",
        "emissions": "gaussian",
    }))
    if _own:
        spark.stop()
    return 0


def cmd_decode(args) -> int:
    from baum_welch_spark.hmm.decode import (
        posterior_decode,
        viterbi_decode,
        viterbi_topk,
    )

    spark, _own = _session("baum-welch-decode")
    if getattr(args, "emissions", "discrete") == "gaussian":
        from baum_welch_spark.hmm.gaussian import (
            GaussianHMM,
            build_value_sequences,
            viterbi_gauss,
        )
        from baum_welch_spark.sources.io import load_table

        if getattr(args, "top_k", 1) > 1 or getattr(args, "posterior", False):
            print("--top-k/--posterior are discrete-only; using Viterbi",
                  file=sys.stderr)
        gm = GaussianHMM.read(spark, args.model)
        gseqs = build_value_sequences(load_table(spark, args.input, "events"))
        out = viterbi_gauss(spark, gseqs, gm)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        else:
            out.show(20, truncate=80)
        if _own:
            spark.stop()
        return 0
    model = HMM.read(spark, args.model)
    seqs = _build_sequences(spark, args.input)
    if getattr(args, "top_k", 1) > 1:
        out = viterbi_topk(spark, seqs, model, k=args.top_k)
    elif getattr(args, "posterior", False):
        out = posterior_decode(spark, seqs, model)
    else:
        out = viterbi_decode(spark, seqs, model)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20, truncate=80)
    if _own:
        spark.stop()
    return 0


def cmd_sample(args) -> int:
    from baum_welch_spark.hmm.sample import posterior_sample

    spark, _own = _session("baum-welch-sample")
    model = HMM.read(spark, args.model)
    seqs = _build_sequences(spark, args.input)
    out = posterior_sample(
        spark, seqs, model, n_samples=args.n_samples, seed=args.seed
    )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20, truncate=80)
    if _own:
        spark.stop()
    return 0


def cmd_generate(args) -> int:
    from baum_welch_spark.hmm.generate import generate_sequences

    spark, _own = _session("baum-welch-generate")
    if args.model:
        model = HMM.read(spark, args.model)
    else:
        model = HMM.random(args.num_hidden, args.num_observed, seed=args.seed)
    out = generate_sequences(
        spark, model, args.n_sequences, args.t_len, seed=args.seed
    )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20, truncate=80)
    if _own:
        spark.stop()
    return 0


def cmd_score(args) -> int:
    from baum_welch_spark.hmm.decode import score_sequences

    spark, _own = _session("baum-welch-score")
    if getattr(args, "emissions", "discrete") == "gaussian":
        from baum_welch_spark.hmm.gaussian import (
            GaussianHMM,
            build_value_sequences,
            score_gauss,
        )
        from baum_welch_spark.sources.io import load_table

        gm = GaussianHMM.read(spark, args.model)
        gseqs = build_value_sequences(load_table(spark, args.input, "events"))
        out = score_gauss(spark, gseqs, gm)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
        else:
            out.show(20)
        if _own:
            spark.stop()
        return 0
    model = HMM.read(spark, args.model)
    if getattr(args, "entropy", False):
        from baum_welch_spark.hmm.sample import posterior_entropy

        out = posterior_entropy(spark, _build_sequences(spark, args.input), model)
    else:
        out = score_sequences(spark, _build_sequences(spark, args.input), model)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20)
    if _own:
        spark.stop()
    return 0


def cmd_dedup(args) -> int:
    from baum_welch_spark.operators.dedup import dedup_clusters_jaccard, exact_dedup
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-dedup")
    docs = load_table(spark, args.input, "documents")
    out = (
        exact_dedup(docs)
        if args.method == "exact"
        else dedup_clusters_jaccard(docs, threshold=args.threshold)
    )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20)
    if _own:
        spark.stop()
    return 0


def cmd_graph(args) -> int:
    """Doc-similarity graph analytics (operators/graph.py /
    communities.py): build near-dup edges over the documents table and
    compute --metric pagerank (rank desc), triangles (per-doc triangle
    counts), communities (deterministic label propagation — duplicate
    families), or cc (local clustering coefficient)."""
    from baum_welch_spark.operators.communities import label_prop_docs
    from baum_welch_spark.operators.dedup import neardup_jaccard
    from baum_welch_spark.operators.graph import (
        clustering_coefficient,
        pagerank_docs,
        triangle_docs,
    )
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-graph")
    docs = load_table(spark, args.input, "documents")
    if args.metric == "pagerank":
        out = pagerank_docs(docs, threshold=args.threshold)
    elif args.metric == "triangles":
        out = triangle_docs(docs, threshold=args.threshold)
    elif args.metric == "communities":
        out = label_prop_docs(docs, threshold=args.threshold)
    else:  # cc
        pairs = neardup_jaccard(docs, threshold=args.threshold)
        edges = pairs.select("doc_a", "doc_b").toDF("src", "dst")
        out = clustering_coefficient(edges).withColumnRenamed("node", "doc_id")
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.limit, truncate=False)
    if _own:
        spark.stop()
    return 0


def cmd_rules(args) -> int:
    """Market-basket association rules over order-baskets of part brands
    (operators/basket.py): top rules by confidence with support and lift,
    thresholded at --min-count co-occurring baskets."""
    from baum_welch_spark.operators.basket import basket_rules
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-rules")
    lineitem = load_table(spark, args.input, "lineitem")
    part = load_table(spark, args.input, "part")
    out = basket_rules(lineitem, part, min_pair_count=args.min_count, top_k=args.k)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.k, truncate=False)
    if _own:
        spark.stop()
    return 0


def cmd_outliers(args) -> int:
    """Robust MAD outlier scan over the events table (operators/anomaly.py):
    rows more than --k robust sigmas (1.4826 * MAD) from their group's
    median, grouped by --group-col."""
    from baum_welch_spark.operators.anomaly import mad_outliers
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-outliers")
    events = load_table(spark, args.input, "events")
    out = mad_outliers(events, group_col=args.group_col, value_col=args.value_col, k=args.k)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.limit, truncate=False)
    if _own:
        spark.stop()
    return 0


def cmd_sketch(args) -> int:
    """Portable-sketch reports (operators/sketches.py / sampling.py):
    'distinct' prints per-event-type HLL user-cardinality estimates beside
    exact counts; 'quantiles' prints hash-sample quantile estimates beside
    the full-data truth; 'overlap' prints pairwise customer-audience
    overlap across order priorities (HLL inclusion-exclusion) beside the
    exact overlap. All are the engine-portable variants (MD5-derived), so
    the same numbers are reproducible in any engine."""
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-sketch")
    if args.what == "distinct":
        from baum_welch_spark.operators.sketches import hll_distinct_users

        out = hll_distinct_users(load_table(spark, args.input, "events"))
    elif args.what == "overlap":
        from baum_welch_spark.operators.sketches import hll_overlap_custs

        out = hll_overlap_custs(load_table(spark, args.input, "orders"))
    else:
        from baum_welch_spark.operators.sampling import sampled_quantiles

        out = sampled_quantiles(load_table(spark, args.input, "events"), rate=args.rate)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.limit, truncate=False)
    if _own:
        spark.stop()
    return 0


def cmd_split(args) -> int:
    """Leakage-safe train/valid/test assignment (operators/dedup.py
    leakage_safe_split): every near-dup cluster lands whole in one split."""
    from baum_welch_spark.operators.dedup import leakage_safe_split
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-split")
    docs = load_table(spark, args.input, "documents")
    out = leakage_safe_split(
        docs,
        train=args.train,
        valid=args.valid,
        threshold=args.threshold,
        salt=args.salt,
    )
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.limit, truncate=False)
    if _own:
        spark.stop()
    return 0


def cmd_skew(args) -> int:
    """Key-skew diagnostic (operators/skew.py skew_report): profile candidate
    shuffle keys before committing a join/agg strategy."""
    from baum_welch_spark.operators.skew import skew_report
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-skew")
    table = load_table(spark, args.input, args.table)
    out = skew_report(table, args.keys, p=args.percentile)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(truncate=False)
    if _own:
        spark.stop()
    return 0


def cmd_dq(args) -> int:
    """Data-quality gate (operators/dq.py dq_report): the __spark_entry__
    demo rule set (null/unique/range/set on orders + fk to customer) as a
    CLI report; exit 1 if --fail-on-violations and any rule is violated."""
    from __spark_entry__ import _DQ_RULES
    from baum_welch_spark.operators.dq import dq_report
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-dq")
    orders = load_table(spark, args.input, "orders")
    customer = load_table(spark, args.input, "customer")
    rules = [dict(r, ref=customer) if r["rule"] == "fk" else r for r in _DQ_RULES]
    rows = dq_report(orders, rules).collect()
    for r in rows:
        # violation_rate is NULL on an empty table (0/0) — print 0% not a
        # TypeError; n_violations is 0 there so the gate still behaves
        print(f"{r.rule:10s} {r.col:15s} {r.n_violations:>10d} / {r.n_rows} "
              f"({(r.violation_rate or 0.0):.4%})")
    if _own:
        spark.stop()
    if args.fail_on_violations and any(r.n_violations > 0 for r in rows):
        return 1
    return 0


def cmd_select(args) -> int:
    """BIC/AIC order-selection sweep over candidate hidden-state counts."""
    from baum_welch_spark.hmm.select import select_n_hidden
    from baum_welch_spark.operators.sequences import symbol_dictionary
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-select")
    events = load_table(spark, args.input, "events")
    n_observed = symbol_dictionary(events, "event_type").count()
    seqs = _build_sequences(spark, args.input)
    candidates = tuple(int(c) for c in args.candidates.split(","))
    scores, _fits = select_n_hidden(
        spark, seqs, n_observed, candidates=candidates,
        max_iter=args.max_iterations, tol=args.convergence_delta,
        seed=args.seed,
    )
    rows = scores.orderBy("n_hidden").collect()
    print(json.dumps({
        "candidates": [
            {"n_hidden": r.n_hidden, "n_params": r.n_params,
             "loglik": r.loglik, "bic": r.bic, "aic": r.aic,
             "is_best": r.is_best}
            for r in rows
        ],
        "best_n_hidden": next(r.n_hidden for r in rows if r.is_best),
    }))
    if _own:
        spark.stop()
    return 0


def cmd_kmeans(args) -> int:
    from baum_welch_spark.operators.clustering import assign_clusters, kmeans_fit
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-kmeans")
    emb = load_table(spark, args.input, "embeddings")
    centroids, inertia = kmeans_fit(emb, k=args.k, max_iter=args.max_iterations, seed=args.seed)
    assigned = assign_clusters(emb, centroids)
    if args.output:
        assigned.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"k": args.k, "iterations": len(inertia), "inertia_trace": inertia}))
    if _own:
        spark.stop()
    return 0


def cmd_knn(args) -> int:
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-knn")
    emb = load_table(spark, args.input, "embeddings")
    if args.method == "brute":
        from baum_welch_spark.operators.similarity import knn_brute as _knn
    elif args.method == "ivf":
        from baum_welch_spark.operators.clustering import knn_ivf_kmeans as _knn
    elif args.method == "ivfpq":
        from baum_welch_spark.operators.pq import knn_ivfpq as _knn
    else:
        from baum_welch_spark.operators.pq import knn_pq as _knn
    out = _knn(emb, n_queries=args.n_queries, k=args.k)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.n_queries * args.k)
    if _own:
        spark.stop()
    return 0


def cmd_filter(args) -> int:
    from baum_welch_spark.operators.corpus import clean_corpus, ppl_filter
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-filter")
    docs = load_table(spark, args.input, "documents")
    if args.gate == "ppl":
        out = ppl_filter(docs, keep_fraction=args.keep_fraction)
    else:
        out = clean_corpus(docs)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20)
    if _own:
        spark.stop()
    return 0


def cmd_prepare(args) -> int:
    """The full training-corpus build (operators/corpus.py
    prepare_training_corpus): near-dup removal + quality/LM gates +
    decontamination + leakage-safe cluster-whole split + dq invariant
    gate, written partitioned by split (the layout a trainer reads one
    split of without touching the others)."""
    from pyspark.sql import functions as F

    from baum_welch_spark.operators.corpus import prepare_training_corpus
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-prepare")
    docs = load_table(spark, args.input, "documents")
    out = prepare_training_corpus(
        docs, train=args.train, valid=args.valid, salt=args.salt
    )
    if args.output:
        out.write.mode("overwrite").partitionBy("split").parquet(args.output)
        counts = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        print(f"wrote {args.output} partitioned by split: {counts}")
    else:
        out.show(20)
    if _own:
        spark.stop()
    return 0


def cmd_corpus(args) -> int:
    from baum_welch_spark.operators.corpus import (
        bigram_lm_score,
        decontaminate,
        tfidf_top_terms,
        vocab_topk,
    )
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-corpus")
    docs = load_table(spark, args.input, "documents")
    out = {
        "vocab": lambda: vocab_topk(docs, k=args.top_k),
        "lm-score": lambda: bigram_lm_score(docs),
        "decontaminate": lambda: decontaminate(docs),
        "tfidf": lambda: tfidf_top_terms(docs, top_n=args.top_k),
    }[args.report]()
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20)
    if _own:
        spark.stop()
    return 0


def cmd_search(args) -> int:
    from baum_welch_spark.operators.retrieval import bm25_topk
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-search")
    docs = load_table(spark, args.input, "documents")
    if getattr(args, "hybrid_vec", None) is not None:
        # hybrid: RRF-fuse the lexical list with the cosine list of the
        # named pre-embedded query row (no embedding model ships here)
        from baum_welch_spark.operators.fusion import rrf_fuse, semantic_topk

        depth = max(args.k, 20)
        lexical = bm25_topk(docs, queries=[(0, args.query)], k=depth)
        embs = load_table(spark, args.input, "embeddings")
        semantic = semantic_topk(embs, args.hybrid_vec, depth=depth)
        out = rrf_fuse([lexical, semantic], k=args.k)
    else:
        out = bm25_topk(docs, queries=[(0, args.query)], k=args.k)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.k)
    if _own:
        spark.stop()
    return 0


def cmd_bpe(args) -> int:
    from baum_welch_spark.operators.bpe import bpe_encode, bpe_merges, bpe_train
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-bpe")
    docs = load_table(spark, args.input, "documents")
    if args.encode:
        out = bpe_encode(docs, bpe_train(docs, n_merges=args.merges))
    else:
        out = bpe_merges(docs, n_merges=args.merges)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.merges)
    if _own:
        spark.stop()
    return 0


def cmd_classify(args) -> int:
    from baum_welch_spark.operators.classifier import quality_classifier_scores
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-classify")
    docs = load_table(spark, args.input, "documents")
    out = quality_classifier_scores(docs, threshold=args.threshold)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20)
    if _own:
        spark.stop()
    return 0


def cmd_pca(args) -> int:
    from baum_welch_spark.operators.linalg import emb_pca
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-pca")
    emb = load_table(spark, args.input, "embeddings")
    out = emb_pca(emb, k=args.k)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(20)
    if _own:
        spark.stop()
    return 0


def cmd_zorder(args) -> int:
    from baum_welch_spark.operators.layout import write_zordered
    from baum_welch_spark.sources.io import load_table

    spark, _own = _session("baum-welch-zorder")
    events = load_table(spark, args.input, "events")
    write_zordered(
        events, args.output, args.x, args.y, ["event_id"], n_files=args.n_files
    )
    print(f"z-ordered layout written to {args.output}")
    if _own:
        spark.stop()
    return 0


def cmd_sql(args) -> int:
    """Ad-hoc ANSI SQL over the scale-factor tables: register every
    ``<table>.parquet`` in the input dir as a temp view (io.register_views)
    and hand the statement to Catalyst — a user of the reference engine's
    query surface gets the entire Spark SQL dialect through one door."""
    from baum_welch_spark.sources.io import register_views

    spark, _own = _session("baum-welch-sql")
    register_views(spark, args.input)
    out = spark.sql(args.query)
    if args.explain:
        out.explain("formatted")
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.show(args.limit, truncate=False)
    if _own:
        spark.stop()
    return 0


def cmd_cdc(args) -> int:
    """Bucketed CDC snapshot maintenance from the command line — the
    lakehouse layer (streaming/upsert.py) as a user-facing tool:

      cdc apply    merge a change-log parquet (key, value..., op, ts) into
                   a snapshot (creates it on first use; widening value
                   column lists evolve the schema)
      cdc read     show or export the current (or a historical --version)
                   snapshot state
      cdc versions list retained time-travel versions
      cdc diff     change-data-feed between two retained versions
      cdc compact  rewrite the whole snapshot under a new bucket modulus
    """
    from baum_welch_spark.streaming.upsert import (
        compact_snapshot,
        list_versions,
        merge_batch,
        read_snapshot,
        read_snapshot_at,
        snapshot_diff,
    )

    required = {
        "apply": ["changes"],
        "diff": ["from_version", "to_version"],
        "compact": ["n_buckets"],
    }
    for opt in required.get(args.action, []):
        if getattr(args, opt) is None:
            print(
                f"cdc {args.action}: --{opt.replace('_', '-')} is required",
                file=sys.stderr,
            )
            return 2
    # "a,b" -> composite key (order significant); a bare name stays a
    # plain single-column key
    key = args.key.split(",") if "," in args.key else args.key
    spark, _own = _session("baum-welch-cdc")
    try:
        if args.action == "apply":
            changes = spark.read.parquet(args.changes)
            merge_batch(
                spark, changes, args.snapshot, key,
                args.value_cols.split(","), ts_col=args.ts_col,
                n_buckets=args.n_buckets,
                retain=1 if args.retain is None else args.retain,
            )
            print(json.dumps({
                "snapshot": args.snapshot,
                "versions": list_versions(args.snapshot),
            }))
        elif args.action == "read":
            try:
                df = (
                    read_snapshot(spark, args.snapshot)
                    if args.version is None
                    else read_snapshot_at(spark, args.snapshot, args.version)
                )
            except KeyError as e:
                # GC'd / never-committed version: a usage error, not a crash
                print(f"cdc read: {e.args[0]}", file=sys.stderr)
                return 2
            if df is None:
                print("(empty snapshot)")
            elif args.output:
                df.write.mode("overwrite").parquet(args.output)
                print(f"snapshot written to {args.output}")
            else:
                df.show(args.limit, truncate=False)
        elif args.action == "versions":
            print(json.dumps(list_versions(args.snapshot)))
        elif args.action == "diff":
            try:
                d = snapshot_diff(
                    spark, args.snapshot, args.from_version, args.to_version,
                    key=key, value_cols=args.value_cols.split(","),
                )
            except KeyError as e:
                print(f"cdc diff: {e.args[0]}", file=sys.stderr)
                return 2
            if args.output:
                d.write.mode("overwrite").parquet(args.output)
                print(f"changes written to {args.output}")
            else:
                d.show(args.limit, truncate=False)
        else:  # compact
            compact_snapshot(
                spark, args.snapshot, key, args.n_buckets,
                retain=args.retain,
            )
            print(json.dumps({"snapshot": args.snapshot, "n_buckets": args.n_buckets}))
    finally:
        if _own:
            spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="baum_welch_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="distributed Baum-Welch EM training")
    t.add_argument("-i", "--input", required=True, help="sf dir with events.parquet")
    t.add_argument("-o", "--output", required=True, help="output dir for per-iteration models")
    t.add_argument("--model-in", help="initial model parquet dir (default: random)")
    t.add_argument("--num-hidden", type=int, default=4)
    t.add_argument("--num-observed", type=int, default=5)
    t.add_argument("--convergence-delta", type=float, default=0.0)
    t.add_argument("--max-iterations", type=int, default=10)
    t.add_argument("--seed", type=int, default=42)
    t.add_argument(
        "--restarts", type=int, default=1,
        help="random restarts; keeps the best final log-likelihood (ignored with "
        "--model-in; per-iteration model checkpoints are NOT written in restart "
        "mode — only the winning final model is saved)",
    )
    t.add_argument(
        "--method", choices=["em", "viterbi"], default="em",
        help="em = soft Baum-Welch; viterbi = hard EM (segmental k-means: "
        "best-path counts, cheaper per iteration, coarser optimum)",
    )
    t.add_argument(
        "--topology", choices=["full", "bakis"], default="full",
        help="bakis = left-to-right transition structure (Rabiner SIV.b): "
        "state i reaches only i..i+bandwidth, pi = e_0; masked entries stay "
        "exactly zero through training",
    )
    t.add_argument(
        "--bandwidth", type=int, default=2,
        help="forward reach of each state under --topology bakis",
    )
    t.add_argument(
        "--emissions", choices=["discrete", "gaussian"], default="discrete",
        help="gaussian = continuous-observation EM over events.value "
        "(Rabiner SVI; per-state Normal emissions)",
    )
    t.set_defaults(fn=cmd_train)

    sel = sub.add_parser("select", help="BIC/AIC sweep over candidate hidden-state counts")
    sel.add_argument("-i", "--input", required=True, help="sf dir with events.parquet")
    sel.add_argument("--candidates", default="2,3,4", help="comma-separated N values")
    sel.add_argument("--max-iterations", type=int, default=5)
    sel.add_argument("--convergence-delta", type=float, default=0.0)
    sel.add_argument("--seed", type=int, default=42)
    sel.set_defaults(fn=cmd_select)

    d = sub.add_parser("decode", help="Viterbi (or posterior) decode sequences under a model")
    d.add_argument("-i", "--input", required=True)
    d.add_argument("--model", required=True)
    d.add_argument("--posterior", action="store_true",
                   help="per-step argmax-gamma decode instead of Viterbi")
    d.add_argument("--top-k", type=int, default=1,
                   help="k > 1: k-best list-Viterbi hypotheses per sequence")
    d.add_argument("-o", "--output")
    d.add_argument("--emissions", choices=["discrete", "gaussian"], default="discrete")
    d.set_defaults(fn=cmd_decode)

    sp = sub.add_parser(
        "sample", help="FFBS: exact posterior path draws P(path | obs, model)"
    )
    sp.add_argument("-i", "--input", required=True)
    sp.add_argument("--model", required=True)
    sp.add_argument("-n", "--n-samples", type=int, default=1)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("-o", "--output")
    sp.set_defaults(fn=cmd_sample)

    g = sub.add_parser("generate", help="sample sequences from a trained model")
    g.add_argument("--model", help="model parquet dir (default: random model)")
    g.add_argument("-n", "--n-sequences", type=int, default=100)
    g.add_argument("-t", "--t-len", type=int, default=20)
    g.add_argument("--num-hidden", type=int, default=4)
    g.add_argument("--num-observed", type=int, default=5)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("-o", "--output")
    g.set_defaults(fn=cmd_generate)

    s = sub.add_parser("score", help="per-sequence log-likelihood under a model")
    s.add_argument("-i", "--input", required=True)
    s.add_argument("--model", required=True)
    s.add_argument("--entropy", action="store_true",
                   help="emit exact posterior path entropy H(S|O) instead of loglik")
    s.add_argument("-o", "--output")
    s.add_argument("--emissions", choices=["discrete", "gaussian"], default="discrete")
    s.set_defaults(fn=cmd_score)

    dd = sub.add_parser("dedup", help="document dedup: exact groups or jaccard clusters")
    dd.add_argument("-i", "--input", required=True)
    dd.add_argument("--method", choices=["exact", "jaccard"], default="exact")
    dd.add_argument("--threshold", type=float, default=0.4)
    dd.add_argument("-o", "--output")
    dd.set_defaults(fn=cmd_dedup)

    gr = sub.add_parser(
        "graph",
        help="doc-similarity graph analytics: pagerank, triangles, "
        "communities (label propagation), clustering coefficient",
    )
    gr.add_argument("-i", "--input", required=True)
    gr.add_argument(
        "--metric",
        choices=["pagerank", "triangles", "communities", "cc"],
        default="pagerank",
    )
    gr.add_argument("--threshold", type=float, default=0.4, help="near-dup jaccard edge threshold")
    gr.add_argument("-o", "--output")
    gr.add_argument("--limit", type=int, default=20, help="rows to show without -o")
    gr.set_defaults(fn=cmd_graph)

    sp2 = sub.add_parser(
        "split", help="leakage-safe train/valid/test split over near-dup clusters"
    )
    sp2.add_argument("-i", "--input", required=True)
    sp2.add_argument("--train", type=float, default=0.8)
    sp2.add_argument("--valid", type=float, default=0.1)
    sp2.add_argument("--threshold", type=float, default=0.4, help="near-dup jaccard edge threshold")
    sp2.add_argument("--salt", default="split", help="per-experiment assignment salt")
    sp2.add_argument("-o", "--output")
    sp2.add_argument("--limit", type=int, default=20, help="rows to show without -o")
    sp2.set_defaults(fn=cmd_split)

    sk = sub.add_parser("skew", help="key-skew diagnostic over a table's candidate shuffle keys")
    sk.add_argument("-i", "--input", required=True)
    sk.add_argument("--table", default="events")
    sk.add_argument("--keys", nargs="+", default=["user_id", "event_type"])
    sk.add_argument("--percentile", type=float, default=0.99)
    sk.add_argument("-o", "--output")
    sk.set_defaults(fn=cmd_skew)

    dqp = sub.add_parser("dq", help="data-quality constraint report over the orders table")
    dqp.add_argument("-i", "--input", required=True)
    dqp.add_argument("--fail-on-violations", action="store_true")
    dqp.set_defaults(fn=cmd_dq)

    skt = sub.add_parser(
        "sketch",
        help="portable sketches: HLL distinct counts, sampled quantiles, "
        "or pairwise audience overlap (HLL inclusion-exclusion)",
    )
    skt.add_argument("what", choices=["distinct", "quantiles", "overlap"])
    skt.add_argument("-i", "--input", required=True)
    skt.add_argument("--rate", type=float, default=0.2, help="quantile sample rate")
    skt.add_argument("-o", "--output")
    skt.add_argument("--limit", type=int, default=20, help="rows to show without -o")
    skt.set_defaults(fn=cmd_sketch)

    ru = sub.add_parser(
        "rules",
        help="market-basket association rules (support/confidence/lift) "
        "over order-baskets of part brands",
    )
    ru.add_argument("-i", "--input", required=True)
    ru.add_argument("--min-count", type=int, default=10, help="min co-occurring baskets")
    ru.add_argument("-k", type=int, default=20)
    ru.add_argument("-o", "--output")
    ru.set_defaults(fn=cmd_rules)

    ol = sub.add_parser("outliers", help="robust median/MAD outlier scan over event values")
    ol.add_argument("-i", "--input", required=True)
    ol.add_argument("--group-col", default="event_type")
    ol.add_argument("--value-col", default="value")
    ol.add_argument("-k", type=float, default=3.5, help="robust-sigma cutoff")
    ol.add_argument("-o", "--output")
    ol.add_argument("--limit", type=int, default=20, help="rows to show without -o")
    ol.set_defaults(fn=cmd_outliers)

    km = sub.add_parser("kmeans", help="distributed k-means over embeddings")
    km.add_argument("-i", "--input", required=True)
    km.add_argument("-k", type=int, default=16)
    km.add_argument("--max-iterations", type=int, default=10)
    km.add_argument("--seed", type=int, default=7)
    km.add_argument("-o", "--output")
    km.set_defaults(fn=cmd_kmeans)

    kn = sub.add_parser("knn", help="cosine top-k similarity search (exact or ANN)")
    kn.add_argument("-i", "--input", required=True)
    kn.add_argument("--n-queries", type=int, default=5)
    kn.add_argument("-k", type=int, default=5)
    kn.add_argument(
        "--method", choices=["brute", "ivf", "pq", "ivfpq"], default="brute",
        help="brute = exact; ivf = trained-kmeans cells; pq = product-quantization ADC + exact re-rank",
    )
    kn.add_argument("-o", "--output")
    kn.set_defaults(fn=cmd_knn)

    fl = sub.add_parser("filter", help="corpus quality gates: perplexity percentile or full clean pipeline")
    fl.add_argument("-i", "--input", required=True)
    fl.add_argument("--gate", choices=["ppl", "clean"], default="ppl")
    fl.add_argument("--keep-fraction", type=float, default=0.8)
    fl.add_argument("-o", "--output")
    fl.set_defaults(fn=cmd_filter)

    pr = sub.add_parser(
        "prepare",
        help="full training-corpus build: dedup + quality/LM gates + "
        "decontamination + leakage-safe split + dq gate, written by split",
    )
    pr.add_argument("-i", "--input", required=True)
    pr.add_argument("--train", type=float, default=0.8)
    pr.add_argument("--valid", type=float, default=0.1)
    pr.add_argument("--salt", default="split")
    pr.add_argument("-o", "--output")
    pr.set_defaults(fn=cmd_prepare)

    co = sub.add_parser(
        "corpus", help="corpus reports: vocab | lm-score | decontaminate | tfidf"
    )
    co.add_argument("-i", "--input", required=True)
    co.add_argument(
        "--report",
        choices=["vocab", "lm-score", "decontaminate", "tfidf"],
        default="vocab",
    )
    co.add_argument("--top-k", type=int, default=100)
    co.add_argument("-o", "--output")
    co.set_defaults(fn=cmd_corpus)

    se = sub.add_parser(
        "search",
        help="top-k search over documents: BM25 lexical, or hybrid "
        "(BM25 + embedding cosine, RRF-fused) via --hybrid-vec",
    )
    se.add_argument("-i", "--input", required=True)
    se.add_argument("-q", "--query", required=True)
    se.add_argument("-k", type=int, default=10)
    se.add_argument(
        "--hybrid-vec",
        type=int,
        default=None,
        metavar="VEC_ID",
        help="fuse with the cosine top-k of this pre-embedded query row",
    )
    se.add_argument("-o", "--output")
    se.set_defaults(fn=cmd_search)

    bp = sub.add_parser("bpe", help="train BPE merges (optionally encode the corpus)")
    bp.add_argument("-i", "--input", required=True)
    bp.add_argument("--merges", type=int, default=30)
    bp.add_argument("--encode", action="store_true")
    bp.add_argument("-o", "--output")
    bp.set_defaults(fn=cmd_bpe)

    cl = sub.add_parser("classify", help="train + score the quality classifier")
    cl.add_argument("-i", "--input", required=True)
    cl.add_argument("--threshold", type=float, default=0.5)
    cl.add_argument("-o", "--output")
    cl.set_defaults(fn=cmd_classify)

    pc = sub.add_parser("pca", help="project embeddings onto top-k principal components")
    pc.add_argument("-i", "--input", required=True)
    pc.add_argument("-k", type=int, default=2)
    pc.add_argument("-o", "--output")
    pc.set_defaults(fn=cmd_pca)

    sq = sub.add_parser("sql", help="run ANSI SQL over the sf-dir tables (registered as views)")
    sq.add_argument("-i", "--input", required=True, help="sf dir with <table>.parquet files")
    sq.add_argument("query", help="SQL statement (tables: region nation customer supplier part orders lineitem events documents embeddings)")
    sq.add_argument("-o", "--output", default=None, help="write result parquet here instead of showing")
    sq.add_argument("--limit", type=int, default=20, help="rows to show without -o")
    sq.add_argument("--explain", action="store_true", help="print the physical plan first")
    sq.set_defaults(fn=cmd_sql)

    c = sub.add_parser(
        "cdc",
        help="bucketed CDC snapshot: apply change-logs, read/time-travel, diff versions, compact",
    )
    c.add_argument(
        "action", choices=["apply", "read", "versions", "diff", "compact"]
    )
    c.add_argument("--snapshot", required=True, help="snapshot directory")
    c.add_argument("--changes", help="apply: change-log parquet with (key, value..., op, ts)")
    c.add_argument(
        "--key", default="k",
        help="key column name; comma-separate for a composite key "
             "(order significant — it is the table contract)",
    )
    c.add_argument(
        "--value-cols", default="v",
        help="comma-separated value columns this apply/diff touches (a "
             "superset of the stored list widens the schema)",
    )
    c.add_argument("--ts-col", default="ts")
    c.add_argument(
        "--n-buckets", type=int, default=None,
        help="bucket modulus: required semantics — creation sets it, later "
             "applies omit it (manifest wins); compact requires it",
    )
    c.add_argument(
        "--retain", type=int, default=None,
        help="time-travel versions to keep readable (apply default: 1; "
             "compact default: preserve the current retention horizon — "
             "compaction must not silently GC history)",
    )
    c.add_argument("--version", type=int, default=None, help="read: historical version")
    c.add_argument("--from-version", type=int, help="diff: from version")
    c.add_argument("--to-version", type=int, help="diff: to version")
    c.add_argument("-o", "--output", default=None, help="write result parquet here instead of showing")
    c.add_argument("--limit", type=int, default=20, help="rows to show without -o")
    c.set_defaults(fn=cmd_cdc)

    zo = sub.add_parser("zorder", help="write a Z-order clustered copy of events")
    zo.add_argument("-i", "--input", required=True)
    zo.add_argument("-o", "--output", required=True)
    zo.add_argument("--x", default="user_id")
    zo.add_argument("--y", default="value")
    zo.add_argument("--n-files", type=int, default=64)
    zo.set_defaults(fn=cmd_zorder)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
