"""Mechanical enforcement of the face-rotation rule (VERDICT-r6 #1).

The driver verifies only the first 50 ``queries()`` entries. The rule —
"any changed or new face must be inside the window the round it ships" —
slipped in r5 AND r6 despite being a written comment, so it is now a test:

- every face's source hash (wrapper + transitive package closure + oracle
  SQL, see tools/face_manifest.py) must equal the committed manifest,
  which records the hash each face had when it last sat inside the window;
- ``tools/face_manifest.py --write`` refreshes ONLY in-window entries, so
  the single green path for a changed below-window face is rotating it in.

Validated against history: the hash distinguishes ``knn_quantized`` across
commit e3e8b01 (the r6 rotation miss) — computed in both worktrees during
r7 bootstrap; pre c2e0029d... vs post 7de9e8dc... at below-window position.

Also asserts the ``queries()`` dict literal has no duplicate keys (a dead
duplicate shipped in r6 — first occurrence silently wins the position the
window rule depends on).
"""

from __future__ import annotations

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_queries_dict_has_no_duplicate_keys():
    tree = ast.parse((REPO / "__spark_entry__.py").read_text())
    checked = 0
    for fn in tree.body:
        if isinstance(fn, ast.FunctionDef) and fn.name in ("queries", "oracle_sql"):
            for node in ast.walk(fn):
                if isinstance(node, ast.Dict):
                    keys = [
                        k.value for k in node.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)
                    ]
                    dupes = sorted({k for k in keys if keys.count(k) > 1})
                    assert not dupes, (
                        f"duplicate keys in {fn.name}() dict literal: {dupes} — "
                        "the first occurrence silently wins the window position"
                    )
                    checked += 1
    assert checked >= 2, "queries()/oracle_sql() dict literals not found"


def test_face_hash_manifest_is_current():
    from tools.face_manifest import WINDOW, drift_report

    _, in_window_drift, below_window_drift = drift_report()
    assert not below_window_drift, (
        f"faces changed (or added) BELOW the driver's {WINDOW}-entry window — "
        "their last driver evidence predates their current source. Rotate them "
        f"into the first {WINDOW} queries() entries, re-run the oracle board, "
        f"then `python tools/face_manifest.py --write`: {below_window_drift}"
    )
    assert not in_window_drift, (
        "in-window faces changed since the manifest was written — run "
        "`python tools/face_manifest.py --write` after verifying them with "
        f"tools/check_oracle.py: {in_window_drift}"
    )
