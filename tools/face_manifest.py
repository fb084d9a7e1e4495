"""Face source-hash manifest: mechanical enforcement of the rotation rule.

The driver's correctness harness samples only the FIRST 50 entries of
``queries()`` (the "window"). The repo rule (VERDICT-r5, violated once in r6
by ``knn_quantized``) is: any face whose implementation changed, and any NEW
face, must sit inside the window the round it ships, so it gets driver
evidence. This module makes the rule a test instead of a comment:

- ``compute_face_hashes()`` maps every face to a sha256 over
  (a) its ``_q_*`` wrapper source,
  (b) the transitive closure of package-internal functions/classes the
      wrapper imports and they reference (AST Name resolution through each
      object's module globals + function-local ``from baum_welch_spark...``
      imports), and
  (c) the face's ``oracle_sql()`` string (the oracle IS half the check).
- ``tests/fixtures/face_hashes.json`` records, per face, the hash it had
  when it last sat inside the window (= the hash that has driver-strength
  evidence; ``tools/check_oracle.py`` is the local equivalent gate).
- ``tests/test_face_manifest.py`` fails whenever any face's current hash
  differs from the manifest — and ``--write`` will only refresh entries for
  faces currently INSIDE the window, so a below-window drift cannot be
  laundered: the only way back to green is rotating the face in (or
  reverting the change).

Known scope bound: the closure follows references by Name through module
globals, so a helper imported *inside* a target function's body from another
package module is followed, but dynamic dispatch / string-keyed registries
are not. That bound has covered every real rotation miss to date (r5:
emb_covariance oracle change; r6: quantize.py signed-zero change — both are
direct-source drifts this hash catches).

Usage:
    python tools/face_manifest.py            # drift report (exit 1 on drift)
    python tools/face_manifest.py --write    # refresh in-window + new-in-window
    python tools/face_manifest.py --write-all  # bootstrap only (see --help)
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MANIFEST_PATH = REPO / "tests" / "fixtures" / "face_hashes.json"
WINDOW = 50
PKG = "baum_welch_spark"


def _load_entry():
    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry_mod

    return entry_mod


def _pkg_object(obj) -> bool:
    mod = getattr(obj, "__module__", "") or ""
    return (inspect.isfunction(obj) or inspect.isclass(obj)) and (
        mod == PKG or mod.startswith(PKG + ".")
    )


def _collect_sources(obj, acc: dict, seen: set) -> None:
    """Accumulate {(module, qualname): source} for obj and every
    package-internal function/class reachable from it by Name reference or
    function-local ``from baum_welch_spark... import`` statements."""
    key = (getattr(obj, "__module__", "?"), getattr(obj, "__qualname__", repr(obj)))
    if key in seen:
        return
    seen.add(key)
    try:
        src = textwrap.dedent(inspect.getsource(obj))
    except (OSError, TypeError):
        return
    acc[key] = src
    mod = inspect.getmodule(obj)
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return
    targets = []
    if mod is not None:
        mod_name = getattr(mod, "__name__", "?")
        for name in sorted({n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}):
            other = getattr(mod, name, None)
            if other is None:
                continue
            if _pkg_object(other):
                targets.append(other)
            elif isinstance(other, (int, float, str, bool, bytes, tuple, frozenset)):
                # module-level tuning constants (thresholds, band counts...)
                # are part of a face's semantics — hash their repr
                acc[(mod_name, f"<const {name}>")] = repr(other)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.ImportFrom)
            and node.module
            and (node.module == PKG or node.module.startswith(PKG + "."))
        ):
            imported = importlib.import_module(node.module)
            for alias in node.names:
                other = getattr(imported, alias.name, None)
                if other is not None and _pkg_object(other):
                    targets.append(other)
    for t in targets:
        _collect_sources(t, acc, seen)


def compute_face_hashes() -> dict[str, str]:
    entry_mod = _load_entry()
    faces = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    out: dict[str, str] = {}
    for face, wrapper in faces.items():
        acc: dict = {}
        _collect_sources(wrapper, acc, set())
        h = hashlib.sha256()
        for (m, q), src in sorted(acc.items()):
            h.update(f"{m}.{q}\n".encode())
            h.update(src.encode())
        h.update(b"--oracle--\n")
        h.update((oracles.get(face) or "").encode())
        out[face] = h.hexdigest()
    return out


def load_manifest() -> dict[str, str]:
    if not MANIFEST_PATH.exists():
        return {}
    return json.loads(MANIFEST_PATH.read_text())


def drift_report() -> tuple[dict[str, str], list[str], list[str]]:
    """Returns (current_hashes, in_window_drift, below_window_drift).

    "drift" = hash differs from manifest, or face missing from manifest.
    """
    current = compute_face_hashes()
    manifest = load_manifest()
    order = list(current.keys())
    in_win, below = [], []
    for i, face in enumerate(order):
        if manifest.get(face) != current[face]:
            (in_win if i < WINDOW else below).append(face)
    return current, in_win, below


def main(argv: list[str]) -> int:
    write = "--write" in argv
    write_all = "--write-all" in argv
    current, in_win, below = drift_report()
    manifest = load_manifest()
    if write_all:
        # Bootstrap escape hatch ONLY: records current hashes for every face
        # without demanding window evidence. Legitimate once (initial
        # adoption); using it to silence a below-window drift defeats the
        # rule and leaves an audit trail in git.
        MANIFEST_PATH.parent.mkdir(parents=True, exist_ok=True)
        MANIFEST_PATH.write_text(json.dumps(dict(sorted(current.items())), indent=1) + "\n")
        print(f"bootstrap: wrote {len(current)} face hashes to {MANIFEST_PATH}")
        return 0
    if below:
        print("BELOW-WINDOW DRIFT (rotate these into the first "
              f"{WINDOW} queries() entries, then --write):")
        for f in below:
            print(f"  {f}")
    if in_win:
        print(f"in-window drift ({'refreshing' if write else 'run --write to refresh'}):")
        for f in in_win:
            print(f"  {f}")
    if write and in_win:
        for f in in_win:
            manifest[f] = current[f]
        # drop manifest entries for faces that no longer exist
        manifest = {k: v for k, v in manifest.items() if k in current}
        MANIFEST_PATH.write_text(json.dumps(dict(sorted(manifest.items())), indent=1) + "\n")
        print(f"updated {len(in_win)} entries in {MANIFEST_PATH}")
    if not in_win and not below:
        print(f"manifest current: {len(current)} faces, no drift")
    return 1 if below or (in_win and not write) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
