"""Golden end-to-end regression (SURVEY §5.5): the distributed fit on
sf0.001 must reproduce the committed sequential-oracle model exactly
(fixed seed, fixed iteration count)."""

import json
import os

import numpy as np

from baum_welch_spark.hmm import HMM
from baum_welch_spark.hmm.fit import fit
from baum_welch_spark.operators.sequences import build_sequences
from baum_welch_spark.sources.io import load_table

from conftest import SF0001

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_fit_sf0.001.json")


def test_distributed_fit_matches_golden(spark):
    with open(GOLDEN) as f:
        g = json.load(f)
    seqs = build_sequences(load_table(spark, SF0001, "events"))
    init = HMM.random(g["n_hidden"], g["n_observed"], seed=g["init_seed"])
    result = fit(spark, seqs, init, max_iter=g["iterations"])
    np.testing.assert_allclose(result.model.pi, np.array(g["pi"]), atol=1e-8)
    np.testing.assert_allclose(result.model.A, np.array(g["A"]), atol=1e-8)
    np.testing.assert_allclose(result.model.B, np.array(g["B"]), atol=1e-8)
    np.testing.assert_allclose(result.loglik_trace, g["loglik_trace"], rtol=1e-10)
