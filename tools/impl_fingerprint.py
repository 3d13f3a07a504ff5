#!/usr/bin/env python
"""Per-query implementation fingerprints for the re-certification contract.

Each registry entry's fingerprint is sha256 over (a) the source text of its
plan callable (``inspect.getsource``) and (b) its oracle SQL string. The
snapshot ``FINGERPRINTS.json`` is regenerated at each round's window SEAL —
at that moment every front entry is about to receive a fresh driver row at
exactly this fingerprint, and every non-front entry is asserted unchanged
since its own last row, so "current == snapshot" is the invariant
``tests/test_rotation_contract.py`` enforces for entries outside the window.

Round-9 upgrade (r8 verdict item 5 — helper-blindness closed): each entry's
hash now also covers, at FILE level, the source of every repo module its
callable's defining module TRANSITIVELY imports (resolved by AST over the
package tree). An edit inside e.g. ``operators/textops.py`` therefore flips
the fingerprint of every registered query whose module imports it, directly
or through another repo module, and
``test_changed_implementations_are_in_the_window`` fails until each flipped
entry is scheduled. File granularity is deliberate (a one-line edit flips
all co-resident queries — over-scheduling is the safe direction); the
full-registry sf0.01 sweep remains the behavioral gate.

Usage:
  python tools/impl_fingerprint.py            # print drift vs FINGERPRINTS.json
  python tools/impl_fingerprint.py --write    # regenerate the snapshot (seal)
"""

import ast
import hashlib
import inspect
import json
import os
import sys
from functools import lru_cache

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SNAPSHOT = os.path.join(ROOT, "FINGERPRINTS.json")
PKG = "etl_dashboard_project_1_spark"


@lru_cache(maxsize=None)
def _repo_modules() -> dict:
    """Map dotted module name -> absolute file path for every .py in the
    package (plus the entry module itself)."""
    mods = {"__spark_entry__": os.path.join(ROOT, "__spark_entry__.py")}
    pkg_root = os.path.join(ROOT, PKG)
    for dirpath, _dirs, files in os.walk(pkg_root):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, ROOT)[:-3].replace(os.sep, ".")
            if rel.endswith(".__init__"):
                rel = rel[: -len(".__init__")]
            mods[rel] = path
    return mods


@lru_cache(maxsize=None)
def _direct_imports(mod: str) -> frozenset:
    """Repo-local modules directly imported by `mod` (AST, file level).
    `from pkg.sub import name` resolves to pkg.sub.name if that is a
    module, else to pkg.sub."""
    mods = _repo_modules()
    path = mods.get(mod)
    if path is None:
        return frozenset()
    try:
        tree = ast.parse(open(path).read())
    except SyntaxError:
        return frozenset()
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name in mods:
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative import: resolve against this module
                base = mod.split(".")
                # level=1 from a module inside a package strips the module
                # name; each extra level strips one more package segment.
                # For a package __init__.py the module name IS the package
                # (".__init__" was stripped in _repo_modules), so level=1
                # must resolve against the package itself, not its parent —
                # append a sentinel segment so the slice strips that
                # instead (r9 ADVICE: re-exports in package __init__ files
                # must stay covered by the tripwire).
                if os.path.basename(path) == "__init__.py":
                    base = base + ["__init__"]
                base = base[: len(base) - node.level]
                prefix = ".".join(base + ([node.module] if node.module else []))
            else:
                prefix = node.module or ""
            if prefix in mods:
                out.add(prefix)
            for a in node.names:
                cand = f"{prefix}.{a.name}" if prefix else a.name
                if cand in mods:
                    out.add(cand)
    out.discard(mod)
    return frozenset(out)


@lru_cache(maxsize=None)
def _transitive_imports(mod: str) -> frozenset:
    seen, stack = set(), [mod]
    while stack:
        m = stack.pop()
        for dep in _direct_imports(m):
            if dep not in seen:
                seen.add(dep)
                stack.append(dep)
    seen.discard(mod)
    return frozenset(seen)


@lru_cache(maxsize=None)
def _file_sha(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def current_fingerprints() -> dict:
    import __spark_entry__ as entrymod

    mods = _repo_modules()
    q, o = entrymod.queries(), entrymod.oracle_sql()
    out = {}
    for name, fn in q.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):  # builtins / lambdas: hash the repr
            src = repr(fn)
        h = hashlib.sha256()
        h.update(src.encode())
        h.update(b"\x00")
        h.update(o.get(name, "").encode())
        # transitive repo deps of the callable's defining module, file level
        mod = getattr(fn, "__module__", None) or ""
        deps = sorted({mod} | set(_transitive_imports(mod)) if mod in mods
                      else _transitive_imports(mod))
        for dep in deps:
            h.update(b"\x00")
            h.update(dep.encode())
            h.update(b"\x00")
            h.update(_file_sha(mods[dep]).encode())
        out[name] = h.hexdigest()[:16]
    return out


def load_snapshot() -> dict:
    if not os.path.exists(SNAPSHOT):
        return {}
    with open(SNAPSHOT) as f:
        return json.load(f)


def main() -> int:
    cur = current_fingerprints()
    if "--write" in sys.argv:
        with open(SNAPSHOT, "w") as f:
            json.dump(cur, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(cur)} fingerprints to {SNAPSHOT}")
        return 0
    snap = load_snapshot()
    changed = [n for n in cur if n in snap and snap[n] != cur[n]]
    new = [n for n in cur if n not in snap]
    gone = [n for n in snap if n not in cur]
    print(f"changed: {changed}\nnew: {new}\nremoved: {gone}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
