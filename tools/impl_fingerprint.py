#!/usr/bin/env python
"""Per-query implementation fingerprints for the re-certification contract.

Each registry entry's fingerprint is sha256 over (a) the source text of its
plan callable (``inspect.getsource``) and (b) its oracle SQL string. The
snapshot ``FINGERPRINTS.json`` is regenerated at each round's window SEAL —
at that moment every front entry is about to receive a fresh driver row at
exactly this fingerprint, and every non-front entry is asserted unchanged
since its own last row, so "current == snapshot" is the invariant
``tests/test_rotation_contract.py`` enforces for entries outside the window.

LIMITATION (documented, accepted): the hash covers the registered callable's
own source, not helpers it calls — a change inside e.g. ``operators/textops``
flips only fingerprints of wrappers whose own text changed too. It is a
tripwire for the common case (plan edits), not a proof; the full-registry
sf0.01 sweep remains the behavioral gate.

Usage:
  python tools/impl_fingerprint.py            # print drift vs FINGERPRINTS.json
  python tools/impl_fingerprint.py --write    # regenerate the snapshot (seal)
"""

import hashlib
import inspect
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SNAPSHOT = os.path.join(ROOT, "FINGERPRINTS.json")


def current_fingerprints() -> dict:
    import __spark_entry__ as entrymod

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
