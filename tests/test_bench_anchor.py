"""The bench noise-outlier anchor must be the rolling cross-round minimum.

Round 9's official record was ~1.8x inflated by a contended host window;
round 10's first record then anchored its >2x-outlier re-run pass to that
contaminated prior, which blessed an 18.7 s ``hmm_fit`` (true ~3.8 s) as
"under 2x prior". These tests pin the repaired policy in ``bench.py``:
anchors come from the rolling ``best`` map (min across rounds), a
contaminated record can only raise an anchor transiently, and a
different-scale run gets its own sidecar so it can neither clobber nor
consult the committed sf0.1 anchor.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_anchor_prefers_best_over_last_record(bench, tmp_path):
    # r9-shaped sidecar: last record contaminated (20.6), best map clean (2.1)
    p = tmp_path / "BENCH_parsed.json"
    p.write_text(json.dumps({
        "queries": {"hmm_fit": 20.6, "q1": 0.9},
        "best": {"hmm_fit": 2.1},
    }))
    prior = bench.load_anchor(str(p), {})
    assert prior["hmm_fit"] == 2.1  # the clean min, not the inflated record
    assert prior["q1"] == 0.9  # queries still seed faces absent from best


def test_anchor_seeds_from_queries_on_pre_upgrade_sidecar(bench, tmp_path):
    p = tmp_path / "BENCH_parsed.json"
    p.write_text(json.dumps({"queries": {"q1": 1.5}}))
    assert bench.load_anchor(str(p), {"q1": "h"}) == {"q1": 1.5}


def test_anchor_tolerates_missing_or_corrupt_sidecar(bench, tmp_path):
    assert bench.load_anchor(str(tmp_path / "absent.json"), {}) == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert bench.load_anchor(str(bad), {}) == {}
    typed = tmp_path / "typed.json"
    typed.write_text(json.dumps({"queries": {"q1": "fast"}, "best": {"q2": None}}))
    assert bench.load_anchor(str(typed), {}) == {}


def test_roll_best_repairs_contaminated_anchor(bench):
    # contaminated prior (18.7) + clean current (3.8) -> anchor heals to 3.8
    best = bench.roll_best({"hmm_fit": 3.8}, {"hmm_fit": 18.7}, {"hmm_fit"})
    assert best == {"hmm_fit": 3.8}
    # clean prior survives a contaminated current round
    best = bench.roll_best({"hmm_fit": 18.7}, {"hmm_fit": 3.8}, {"hmm_fit"})
    assert best == {"hmm_fit": 3.8}


def test_roll_best_carries_forward_known_untimed_faces_only(bench):
    prior = {"kept": 1.0, "renamed_away": 2.0}
    best = bench.roll_best({"new": 0.5}, prior, {"kept", "new"})
    assert best == {"new": 0.5, "kept": 1.0}  # renamed_away dropped


def test_sidecar_routing_isolates_non_default_scale(bench, tmp_path):
    repo = str(tmp_path)
    assert bench.sidecar_for("/root/testdata/sf0.1", repo).endswith("/BENCH_parsed.json")
    ten_x = bench.sidecar_for("/tmp/sf0.1_x10_mut", repo)
    assert ten_x.endswith("/BENCH_parsed_sf0.1_x10_mut.json")
    assert ten_x != bench.sidecar_for("/root/testdata/sf0.1", repo)


def test_anchor_resets_on_face_hash_change(bench, tmp_path):
    """VERDICT-r13: a redefined face (manifest hash changed) must not keep
    the old computation's rolling minimum as its anchor; absence of
    recorded hashes (pre-upgrade sidecar) must keep every anchor."""
    p = tmp_path / "BENCH_parsed.json"
    p.write_text(json.dumps({
        "queries": {"redefined": 3.8, "stable": 1.0, "unhashed": 2.0},
        "best": {"redefined": 3.5},
        "face_hashes": {"redefined": "old", "stable": "same"},
    }))
    prior = bench.load_anchor(
        str(p), {"redefined": "NEW", "stable": "same", "unhashed": "h"}
    )
    assert "redefined" not in prior  # re-seeds from this run's record
    assert prior["stable"] == 1.0  # unchanged hash keeps its anchor
    assert prior["unhashed"] == 2.0  # no recorded hash = no information


def test_names_digest_is_set_and_timing_insensitive(bench):
    # VERDICT-r14 #2: the printed line's integrity digest must change when a
    # face disappears and must NOT change when timings (and hence slowest-map
    # membership) move.
    a = bench.names_digest({"q1": 1.0, "q2": 9.9})
    b = bench.names_digest({"q2": 0.1, "q1": 55.0})  # order/timing shuffled
    c = bench.names_digest({"q1": 1.0})  # q2 silently dropped
    assert a == b
    assert a != c
    assert len(a) == 16 and all(ch in "0123456789abcdef" for ch in a)
