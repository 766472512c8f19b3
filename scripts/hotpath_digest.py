"""Digest of the bench-relevant hot-path sources (the bench-before-land
guard, round-5 verdict task 5).

The headline blocks in README.md / PERF.md are stamped with this digest
by scripts/update_headline.py at measurement time;
tests/test_headline_guard.py recomputes it and fails when the working
tree's hot-path sources differ from the tree the headline was measured
on. That makes the standing rule — every hot-path commit re-runs
`python bench.py` and re-stamps before it lands — unbypassable by
end-of-round snapshot sweeps (the round-3 and round-4 failure shape):
the suite is red until the stamp matches.
"""

from __future__ import annotations

import hashlib
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent

# the sources whose edits can move the headline number
HOT_PATHS = ("unified_cvo_tpu/ops", "unified_cvo_tpu/models/align.py",
             "bench.py")


def hotpath_digest() -> str:
    h = hashlib.sha256()
    files = []
    for p in HOT_PATHS:
        path = ROOT / p
        if path.is_dir():
            files.extend(sorted(path.glob("*.py")))
        else:
            files.append(path)
    for f in files:
        h.update(f.name.encode())
        h.update(f.read_bytes())
    return h.hexdigest()[:12]


if __name__ == "__main__":
    print(hotpath_digest())
