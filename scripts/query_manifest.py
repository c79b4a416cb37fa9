"""Verification-currency manifest (round-4 verdict ask #1).

The driver's CORRECTNESS gate checks the FIRST 50 keys of
``queries()`` each round; a query whose implementation changes AFTER its
last green row is silently stale unless it is rotated back into the
window.  Rounds 3 and 4 each caught one such query by hand
(asof_join/ann_lsh, then kmv_distinct).  This makes the policy
mechanical:

* ``compute_hashes()`` — per query key, a sha256 over the query
  function's source, its oracle SQL, every ``article_extractor_spark``
  module in the function's TRANSITIVE import closure (module
  granularity: an over-approximation, which can only over-flag — safe),
  and any ``__spark_entry__``-level helpers it references (recursively).
* ``tests/query_manifest.json`` — the hash each key had at its last
  driver-green verification.
* ``tests/test_verification_currency.py`` — FAILS if any key whose
  current hash differs from the manifest sits OUTSIDE the first-50
  window (including keys missing from the manifest, i.e. new queries).

End-of-round flow: reorder ``queries()`` so every flagged key is in the
first 50, then ``python scripts/query_manifest.py --update`` refreshes
manifest entries for exactly the window keys (they are about to be
re-verified by the driver).  Keys outside the window keep their old
green hash.
"""
from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANIFEST_PATH = os.path.join(REPO, "tests", "query_manifest.json")
WINDOW = 50

_ABS_IMPORT_RE = re.compile(
    r"^\s*(?:from\s+(article_extractor_spark[.\w]*)\s+import\s+([\w, .*()]+)"
    r"|import\s+(article_extractor_spark[.\w]*))", re.M)
_REL_IMPORT_RE = re.compile(
    r"^\s*from\s+(\.+)([\w.]*)\s+import\s+([\w, .*()\\]+)", re.M)


def _module_file(modname: str) -> str | None:
    path = os.path.join(REPO, *modname.split(".")) + ".py"
    if os.path.exists(path):
        return path
    pkg = os.path.join(REPO, *modname.split("."), "__init__.py")
    return pkg if os.path.exists(pkg) else None


def _add_module(modname: str, seen: set[str]) -> None:
    if modname in seen:
        return
    path = _module_file(modname)
    if path is None:
        return
    seen.add(modname)
    pkg = (modname if path.endswith("__init__.py")
           else modname.rsplit(".", 1)[0])
    with open(path, encoding="utf-8") as f:
        _module_closure(f.read(), seen, pkg)


def _module_closure(src: str, seen: set[str],
                    base_pkg: str | None = None) -> None:
    """Add every article_extractor_spark module (transitively) imported
    by ``src`` to ``seen``.  Handles absolute imports and — when
    ``base_pkg`` names the scanned file's package — relative imports
    (``from . import x``, ``from .dom import Node``)."""
    src = src.replace("\\\n", " ")  # join backslash continuations
    for m in _ABS_IMPORT_RE.finditer(src):
        if m.group(3):
            _add_module(m.group(3), seen)
        else:
            base, names = m.group(1), m.group(2)
            _add_module(base, seen)
            for n in names.replace("(", " ").replace(")", " ").split(","):
                n = n.strip().split(" as ")[0].strip()
                if n:
                    _add_module(f"{base}.{n}", seen)
    if base_pkg is None:
        return
    for m in _REL_IMPORT_RE.finditer(src):
        dots, tail, names = m.group(1), m.group(2), m.group(3)
        parts = base_pkg.split(".")
        if len(dots) > 1:
            parts = parts[:len(parts) - (len(dots) - 1)]
        base = ".".join(parts) + (f".{tail}" if tail else "")
        _add_module(base, seen)
        for n in names.replace("(", " ").replace(")", " ").split(","):
            n = n.strip().split(" as ")[0].strip()
            if n:
                _add_module(f"{base}.{n}", seen)


def _entry_helpers(entry, src: str, helper_names: list[str],
                   collected: dict[str, str]) -> None:
    """Recursively collect sources/reprs of __spark_entry__-level names
    referenced by ``src``."""
    for name in helper_names:
        if name in collected:
            continue
        if not re.search(rf"\b{re.escape(name)}\b", src):
            continue
        obj = getattr(entry, name)
        if inspect.isfunction(obj):
            hsrc = inspect.getsource(obj)
            collected[name] = hsrc
            _entry_helpers(entry, hsrc, helper_names, collected)
        elif isinstance(obj, (dict, list)):
            # mutable module-level containers are RUNTIME STATE, not
            # source: _CONFIG_BC (the per-session broadcast cache) gets
            # populated once any Spark test runs in-process, and hashing
            # its repr made the currency gate's verdict depend on test
            # execution order.  Hash the name/type only; code changes
            # still surface through the function sources and module
            # bytes.
            collected[name] = f"<mutable {type(obj).__name__} {name}>"
        else:
            collected[name] = repr(obj)


def compute_hashes() -> dict[str, str]:
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    # module-level helper candidates: functions and plain constants
    # defined in __spark_entry__ (excluding the q_* themselves and the
    # registry functions, which would make every reorder a change)
    helper_names = [
        n for n, obj in vars(entry).items()
        if not n.startswith("q_")
        and n not in ("queries", "oracle_sql", "entry")
        and ((inspect.isfunction(obj) and obj.__module__ == "__spark_entry__")
             or isinstance(obj, (str, int, float, list, tuple, dict)))
        and not n.startswith("__")
    ]
    out = {}
    for key, fn in qs.items():
        h = hashlib.sha256()
        src = inspect.getsource(fn)
        h.update(src.encode())
        h.update(oracles.get(key, "").encode())
        helpers: dict[str, str] = {}
        _entry_helpers(entry, src, helper_names, helpers)
        mods: set[str] = set()
        _module_closure(src, mods)
        for name in sorted(helpers):
            h.update(f"\nHELPER {name}\n".encode())
            h.update(helpers[name].encode())
            _module_closure(helpers[name], mods)
        for modname in sorted(mods):
            path = _module_file(modname)
            h.update(f"\nMODULE {modname}\n".encode())
            with open(path, "rb") as f:
                h.update(f.read())
        out[key] = h.hexdigest()
    return out


def main() -> int:
    import __spark_entry__ as entry

    current = compute_hashes()
    keys = list(entry.queries())
    window = set(keys[:WINDOW])
    if os.path.exists(MANIFEST_PATH):
        with open(MANIFEST_PATH, encoding="utf-8") as f:
            manifest = json.load(f)
    else:
        manifest = {}
    changed = [k for k in keys if manifest.get(k) != current[k]]
    stale = [k for k in changed if k not in window]
    print(f"{len(keys)} queries, {len(changed)} changed since last green "
          f"manifest, {len(stale)} OUTSIDE the first-{WINDOW} window")
    for k in changed:
        mark = "STALE" if k in stale else "in-window"
        print(f"  [{mark}] {k}")
    if "--update" in sys.argv:
        for k in keys[:WINDOW]:
            manifest[k] = current[k]
        # drop manifest entries for queries that no longer exist
        manifest = {k: v for k, v in manifest.items() if k in current}
        with open(MANIFEST_PATH, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"manifest updated for the {WINDOW} window keys -> "
              f"{MANIFEST_PATH}")
    return 1 if stale and "--update" not in sys.argv else 0


if __name__ == "__main__":
    raise SystemExit(main())
