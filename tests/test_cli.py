"""CLI end-to-end tests (reference driver D1 parity): run main() in-process
against sf0.001 and check artifacts land and chain (train -> model dir ->
decode/score under that model)."""

import json

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.cli import main

from conftest import SF0001


def test_cli_train_decode_score_chain(spark, tmp_path, capsys):
    out = str(tmp_path / "hmm_out")
    rc = main([
        "train", "-i", SF0001, "-o", out,
        "--num-hidden", "3", "--num-observed", "5",
        "--max-iterations", "3", "--seed", "7",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["iterations"] == 3
    assert len(summary["loglik_trace"]) == 3
    # EM guarantee visible at the CLI: non-decreasing loglik
    t = summary["loglik_trace"]
    assert all(b >= a - 1e-9 for a, b in zip(t, t[1:]))

    dec = str(tmp_path / "decoded")
    assert main(["decode", "-i", SF0001, "--model", summary["model_dir"], "-o", dec]) == 0
    decoded = spark.read.parquet(dec)
    assert decoded.count() > 0
    assert set(decoded.columns) == {"seq_id", "loglik", "path"}

    sc = str(tmp_path / "scored")
    assert main(["score", "-i", SF0001, "--model", summary["model_dir"], "-o", sc]) == 0
    scored = spark.read.parquet(sc)
    assert scored.count() == decoded.count()


def test_cli_train_viterbi_method(spark, tmp_path, capsys):
    out = str(tmp_path / "hmm_viterbi_out")
    rc = main([
        "train", "-i", SF0001, "-o", out,
        "--num-hidden", "3", "--num-observed", "5",
        "--max-iterations", "3", "--seed", "7", "--method", "viterbi",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["iterations"] == 3
    model = spark.read.parquet(summary["model_dir"])
    assert model.count() > 0
    # segmental k-means criterion: joint best-path loglik non-decreasing
    t = summary["loglik_trace"]
    assert t[-1] >= t[0]


def test_cli_dedup_kmeans_knn(spark, tmp_path, capsys):
    dd = str(tmp_path / "dedup_out")
    assert main(["dedup", "-i", SF0001, "--method", "jaccard", "-o", dd]) == 0
    assert spark.read.parquet(dd).count() > 0

    km = str(tmp_path / "km_out")
    assert main(["kmeans", "-i", SF0001, "-k", "4", "--max-iterations", "2", "-o", km]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["k"] == 4 and len(out["inertia_trace"]) == 2
    assigned = spark.read.parquet(km)
    assert assigned.select("cluster").distinct().count() <= 4

    kn = str(tmp_path / "knn_out")
    assert main(["knn", "-i", SF0001, "--n-queries", "3", "-k", "4", "-o", kn]) == 0
    knn = spark.read.parquet(kn)
    assert knn.count() == 12  # 3 queries x top-4


def test_cli_generate_and_posterior_decode(spark, tmp_path):
    # generate from a random model, then chain: train -> generate from the
    # trained model -> posterior-decode the corpus under it
    gen = str(tmp_path / "generated")
    assert main(["generate", "-n", "25", "-t", "10", "--seed", "3", "-o", gen]) == 0
    g = spark.read.parquet(gen)
    assert g.count() == 25
    assert set(g.columns) == {"seq_id", "states", "obs"}
    assert all(len(r.obs) == 10 for r in g.collect())

    out = str(tmp_path / "hmm_out")
    assert main([
        "train", "-i", SF0001, "-o", out,
        "--num-hidden", "3", "--num-observed", "5", "--max-iterations", "1",
    ]) == 0
    gen2 = str(tmp_path / "generated_trained")
    assert main(["generate", "--model", f"{out}/model-final", "-n", "5", "-t", "6", "-o", gen2]) == 0
    assert spark.read.parquet(gen2).count() == 5

    dec = str(tmp_path / "posterior")
    assert main(["decode", "-i", SF0001, "--model", f"{out}/model-final",
                 "--posterior", "-o", dec]) == 0
    d = spark.read.parquet(dec)
    assert set(d.columns) == {"seq_id", "path_str"}
    assert d.count() > 0


def test_cli_rejects_unknown_subcommand():
    with pytest.raises(SystemExit):
        main(["compact"])


def test_cli_corpus_reports(spark, tmp_path):
    out = str(tmp_path / "vocab")
    assert main(["corpus", "-i", SF0001, "--report", "vocab", "--top-k", "10", "-o", out]) == 0
    vocab = spark.read.parquet(out)
    assert vocab.count() <= 10
    assert set(vocab.columns) == {"token", "tf", "df"}

    out2 = str(tmp_path / "lm")
    assert main(["corpus", "-i", SF0001, "--report", "lm-score", "-o", out2]) == 0
    lm = spark.read.parquet(out2)
    assert set(lm.columns) == {"doc_id", "n_bigrams", "cross_entropy", "perplexity"}
    assert lm.count() > 0


def test_cli_search_bpe_zorder(spark, tmp_path):
    out = str(tmp_path / "hits")
    assert main(["search", "-i", SF0001, "-q", "spark join", "-k", "5", "-o", out]) == 0
    hits = spark.read.parquet(out)
    assert hits.count() == 5
    assert set(hits.columns) == {"q_id", "doc_id", "score", "rk"}

    out2 = str(tmp_path / "merges")
    assert main(["bpe", "-i", SF0001, "--merges", "5", "-o", out2]) == 0
    merges = spark.read.parquet(out2)
    assert merges.count() == 5
    assert set(merges.columns) == {"rank", "left", "right", "merged", "pair_freq"}

    out3 = str(tmp_path / "zo")
    assert main(["zorder", "-i", SF0001, "-o", out3, "--n-files", "4"]) == 0
    zo = spark.read.parquet(out3)
    assert zo.count() == spark.read.parquet(f"{SF0001}/events.parquet").count()


def test_cli_hybrid_search(spark, tmp_path):
    out = str(tmp_path / "hybrid_hits")
    assert (
        main(
            ["search", "-i", SF0001, "-q", "spark join", "-k", "5",
             "--hybrid-vec", "0", "-o", out]
        )
        == 0
    )
    hits = spark.read.parquet(out)
    assert hits.count() == 5
    assert set(hits.columns) == {"q_id", "doc_id", "rrf", "rk"}
    rows = {r.rk: r for r in hits.collect()}
    assert sorted(rows) == [1, 2, 3, 4, 5]
    # fused scores are bounded by two rank-1 contributions
    assert all(0 < rows[rk].rrf <= round(2 / 61, 6) for rk in rows)
    # the query row itself (vec_id 0) is not a candidate on the semantic side
    from baum_welch_spark.operators.fusion import semantic_topk
    from baum_welch_spark.sources.io import load_table

    sem = semantic_topk(load_table(spark, SF0001, "embeddings"), 0, depth=20)
    assert all(r.doc_id != 0 for r in sem.collect())


def test_cli_knn_pq_and_filter(spark, tmp_path):
    kn = str(tmp_path / "knn_pq_out")
    assert main(["knn", "-i", SF0001, "--method", "pq", "--n-queries", "2", "-k", "3", "-o", kn]) == 0
    knn = spark.read.parquet(kn)
    assert knn.count() == 6  # 2 queries x top-3

    fo = str(tmp_path / "filter_out")
    assert main(["filter", "-i", SF0001, "--gate", "ppl", "--keep-fraction", "0.5", "-o", fo]) == 0
    kept = spark.read.parquet(fo)
    n_docs = spark.read.parquet(f"{SF0001}/documents.parquet").count()
    assert 0 < kept.count() <= n_docs * 0.55


def test_cli_sql_and_knn_ivfpq(spark, tmp_path):
    out = str(tmp_path / "sql_out")
    assert (
        main(
            [
                "sql",
                "-i",
                SF0001,
                "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
                "-o",
                out,
            ]
        )
        == 0
    )
    res = spark.read.parquet(out)
    assert res.count() == 3 and set(res.columns) == {"l_returnflag", "n"}

    kn = str(tmp_path / "knn_ivfpq_out")
    assert main(["knn", "-i", SF0001, "--method", "ivfpq", "--n-queries", "2", "-k", "3", "-o", kn]) == 0
    assert spark.read.parquet(kn).count() == 6


def test_cli_train_bakis_and_sample(spark, tmp_path, capsys):
    """train --topology bakis yields a masked model; sample draws FFBS
    paths under it that respect the structural zeros."""
    import numpy as np

    from baum_welch_spark.hmm import HMM

    out = str(tmp_path / "hmm_bakis_out")
    rc = main([
        "train", "-i", SF0001, "-o", out,
        "--num-hidden", "3", "--num-observed", "5",
        "--max-iterations", "2", "--seed", "7",
        "--topology", "bakis", "--bandwidth", "1",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    model = HMM.read(spark, summary["model_dir"])
    mask = HMM.bakis_mask(3, bandwidth=1)
    assert np.all(model.A[~mask] == 0.0)
    np.testing.assert_allclose(model.pi, [1.0, 0.0, 0.0], atol=1e-12)

    smp = str(tmp_path / "sampled")
    assert main([
        "sample", "-i", SF0001, "--model", summary["model_dir"],
        "-n", "2", "-o", smp,
    ]) == 0
    rows = spark.read.parquet(smp).collect()
    assert rows and {r.sample_id for r in rows} == {0, 1}
    for r in rows:
        path = [int(s) for s in r.path_str.split(",")]
        assert path[0] == 0
        assert all(mask[a, b] for a, b in zip(path, path[1:]))


def test_cli_topk_decode_and_entropy_score(spark, tmp_path, capsys):
    out = str(tmp_path / "hmm_out_k")
    rc = main([
        "train", "-i", SF0001, "-o", out,
        "--num-hidden", "3", "--num-observed", "5",
        "--max-iterations", "1", "--seed", "7",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    kdir = str(tmp_path / "kbest")
    assert main(["decode", "-i", SF0001, "--model", summary["model_dir"],
                 "--top-k", "3", "-o", kdir]) == 0
    kb = spark.read.parquet(kdir)
    assert set(kb.columns) == {"seq_id", "rank", "loglik", "path"}
    one = [r for r in kb.collect() if r.seq_id == kb.collect()[0].seq_id]
    ranks = sorted(r.rank for r in one)
    assert ranks == list(range(len(ranks)))
    # best-first: loglik non-increasing with rank
    by_rank = sorted(one, key=lambda r: r.rank)
    assert all(a.loglik >= b.loglik - 1e-12 for a, b in zip(by_rank, by_rank[1:]))

    edir = str(tmp_path / "entropy")
    assert main(["score", "-i", SF0001, "--model", summary["model_dir"],
                 "--entropy", "-o", edir]) == 0
    ent = spark.read.parquet(edir)
    assert set(ent.columns) == {"seq_id", "t_len", "loglik", "entropy", "entropy_rate"}
    assert all(r.entropy >= -1e-12 for r in ent.collect())


def test_cli_gaussian_train_decode_score_chain(spark, tmp_path, capsys):
    """--emissions gaussian: the continuous family through the same D1
    surface — train on events.value, decode + score under the written
    model, model codec roundtrip."""
    out = str(tmp_path / "ghmm_out")
    rc = main([
        "train", "-i", SF0001, "-o", out, "--emissions", "gaussian",
        "--num-hidden", "3", "--max-iterations", "3", "--seed", "7",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["emissions"] == "gaussian"
    t = summary["loglik_trace"]
    assert len(t) == 3 and all(b >= a - 1e-6 for a, b in zip(t, t[1:]))

    from baum_welch_spark.hmm.gaussian import GaussianHMM

    m = GaussianHMM.read(spark, summary["model_dir"])
    m2 = GaussianHMM.read(spark, summary["model_dir"])
    assert m.distance(m2) == 0.0  # codec roundtrip is exact

    dec = str(tmp_path / "gdecoded")
    assert main(["decode", "-i", SF0001, "--model", summary["model_dir"],
                 "--emissions", "gaussian", "-o", dec]) == 0
    decoded = spark.read.parquet(dec)
    assert set(decoded.columns) == {"seq_id", "loglik", "path_str"}
    sc = str(tmp_path / "gscored")
    assert main(["score", "-i", SF0001, "--model", summary["model_dir"],
                 "--emissions", "gaussian", "-o", sc]) == 0
    assert spark.read.parquet(sc).count() == decoded.count()


def test_cli_cdc_lifecycle(spark, tmp_path, capsys):
    """cdc apply (create -> widen) / versions / read --version / diff /
    compact chained through the CLI, artifacts verified on disk."""
    snap = str(tmp_path / "snap")
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    spark.createDataFrame(
        [(1, 10.0, "upsert", 1), (2, 20.0, "upsert", 1)],
        "k long, v double, op string, ts long",
    ).write.parquet(c1)
    spark.createDataFrame(
        [(2, 21.0, "hot", "upsert", 2), (3, 30.0, "cold", "upsert", 2)],
        "k long, v double, tag string, op string, ts long",
    ).write.parquet(c2)

    assert main([
        "cdc", "apply", "--snapshot", snap, "--changes", c1,
        "--key", "k", "--value-cols", "v", "--n-buckets", "4", "--retain", "3",
    ]) == 0
    # widening apply omits --n-buckets (manifest value wins)
    assert main([
        "cdc", "apply", "--snapshot", snap, "--changes", c2,
        "--key", "k", "--value-cols", "v,tag", "--retain", "3",
    ]) == 0
    capsys.readouterr()
    assert main(["cdc", "versions", "--snapshot", snap]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == [1, 2]

    hist = str(tmp_path / "hist")
    assert main([
        "cdc", "read", "--snapshot", snap, "--version", "1", "-o", hist,
    ]) == 0
    h = spark.read.parquet(hist)
    assert h.columns == ["k", "v"]  # pre-widening schema
    assert {r.k: r.v for r in h.collect()} == {1: 10.0, 2: 20.0}

    dif = str(tmp_path / "dif")
    assert main([
        "cdc", "diff", "--snapshot", snap, "--from-version", "1",
        "--to-version", "2", "--key", "k", "--value-cols", "v,tag",
        "-o", dif,
    ]) == 0
    d = {r.k: (r.op, r.old_v, r.new_v, r.new_tag) for r in spark.read.parquet(dif).collect()}
    assert d == {2: ("update", 20.0, 21.0, "hot"), 3: ("insert", None, 30.0, "cold")}

    assert main([
        "cdc", "compact", "--snapshot", snap, "--key", "k", "--n-buckets", "8",
    ]) == 0
    out = str(tmp_path / "cur")
    assert main(["cdc", "read", "--snapshot", snap, "-o", out]) == 0
    cur = {r.k: (r.v, r.tag) for r in spark.read.parquet(out).collect()}
    assert cur == {1: (10.0, None), 2: (21.0, "hot"), 3: (30.0, "cold")}
    # a bare `cdc compact` (no --retain) preserves the time-travel horizon
    # (ADVICE-r9: the shared --retain default of 1 silently GC'd all
    # retained versions on the maintenance command)
    hist2 = str(tmp_path / "hist2")
    assert main([
        "cdc", "read", "--snapshot", snap, "--version", "1", "-o", hist2,
    ]) == 0
    assert {r.k: r.v for r in spark.read.parquet(hist2).collect()} == {1: 10.0, 2: 20.0}
    # missing required option -> usage error, not a traceback
    assert main(["cdc", "compact", "--snapshot", snap, "--key", "k"]) == 2


def test_cli_cdc_composite_key(spark, tmp_path):
    """--key a,b drives the composite-key path end-to-end: same sku under
    different stores stays independent, and the recorded key guards later
    calls under a different tuple."""
    snap = str(tmp_path / "snap")
    c1 = str(tmp_path / "c1")
    spark.createDataFrame(
        [(0, "x", 1.0, "upsert", 1), (1, "x", 2.0, "upsert", 1)],
        "store long, sku string, qty double, op string, ts long",
    ).write.parquet(c1)
    assert main([
        "cdc", "apply", "--snapshot", snap, "--changes", c1,
        "--key", "store,sku", "--value-cols", "qty", "--n-buckets", "4",
    ]) == 0
    out = str(tmp_path / "cur")
    assert main(["cdc", "read", "--snapshot", snap, "-o", out]) == 0
    got = {(r.store, r.sku): r.qty for r in spark.read.parquet(out).collect()}
    assert got == {(0, "x"): 1.0, (1, "x"): 2.0}
    with pytest.raises(ValueError, match="keyed on"):
        main([
            "cdc", "apply", "--snapshot", snap, "--changes", c1,
            "--key", "store", "--value-cols", "qty",
        ])


def test_cli_outliers(spark, tmp_path):
    out = str(tmp_path / "outliers")
    assert main([
        "outliers", "-i", SF0001, "-k", "3.5", "-o", out,
    ]) == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"event_id", "grp", "value", "med", "mad", "score"}
    # every flagged row really clears the cutoff it was flagged under
    # (strict > pre-rounding, so a stored score may ROUND to exactly 3.5 —
    # assert < , not <=, or a boundary row flakes the test)
    assert got.filter("score < 3.5").count() == 0


def test_cli_graph_metrics(spark, tmp_path):
    for metric, cols in (
        ("pagerank", {"doc_id", "rank"}),
        ("triangles", {"doc_id", "n_triangles"}),
        ("communities", {"doc_id", "community"}),
        ("cc", {"doc_id", "deg", "n_triangles", "cc"}),
    ):
        out = str(tmp_path / metric)
        assert main(["graph", "-i", SF0001, "--metric", metric, "-o", out]) == 0
        got = spark.read.parquet(out)
        assert set(got.columns) == cols and got.count() > 0


def test_cli_split_and_skew(spark, tmp_path):
    out = str(tmp_path / "splits")
    assert main(["split", "-i", SF0001, "-o", out]) == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "component", "split"}
    mix = {r.split for r in got.select("split").distinct().collect()}
    assert mix == {"train", "valid", "test"}
    # a cluster never straddles splits: component -> exactly one split
    assert (
        got.groupBy("component").agg(F.countDistinct("split").alias("n"))
        .filter("n > 1").count() == 0
    )

    out2 = str(tmp_path / "skew")
    assert main(["skew", "-i", SF0001, "--table", "events",
                 "--keys", "event_type", "-o", out2]) == 0
    rep = spark.read.parquet(out2).collect()
    assert len(rep) == 1 and rep[0].key_col == "event_type"
    assert rep[0].n_rows > 0 and rep[0].skew_ratio >= 1.0


def test_cli_dq_gate(spark, capsys):
    assert main(["dq", "-i", SF0001]) == 0
    out = capsys.readouterr().out
    assert "in_set" in out and "fk" in out
    # the demo rules are deliberately tight: the gate must trip
    assert main(["dq", "-i", SF0001, "--fail-on-violations"]) == 1


def test_cli_prepare_training_corpus(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    assert main(["prepare", "-i", SF0001, "-o", out]) == 0
    assert "partitioned by split" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "lang", "source", "component", "split"}
    n = got.count()
    assert 0 < n < 500  # gates dropped the eval slice + dup/low-quality docs
    # eval slice excluded, split partition layout readable one split at a time
    assert got.filter("doc_id % 50 = 0").count() == 0
    train_only = spark.read.parquet(f"{out}/split=train")
    assert 0 < train_only.count() <= n


def test_cli_sketch_reports(spark, tmp_path):
    out = str(tmp_path / "hll")
    assert main(["sketch", "distinct", "-i", SF0001, "-o", out]) == 0
    hll = spark.read.parquet(out)
    assert set(hll.columns) == {"event_type", "n_exact", "hll_est"}
    rows = hll.collect()
    assert rows and all(r.hll_est > 0 for r in rows)

    out2 = str(tmp_path / "quant")
    assert main(["sketch", "quantiles", "-i", SF0001, "-o", out2]) == 0
    q = spark.read.parquet(out2)
    assert set(q.columns) == {"event_type", "p50", "p95", "p50_est", "p95_est"}
    assert q.count() > 0

    out3 = str(tmp_path / "overlap")
    assert main(["sketch", "overlap", "-i", SF0001, "-o", out3]) == 0
    ov = spark.read.parquet(out3)
    assert set(ov.columns) == {
        "type_a", "type_b", "n_exact_overlap", "est_a", "est_b",
        "est_union", "overlap_est",
    }
    assert ov.count() == 10  # 5 priorities -> C(5,2) pairs
