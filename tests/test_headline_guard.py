"""Bench-before-land guard (round-4 verdict task 5).

The PERF.md headline block must be regenerated (scripts/update_headline.py,
which runs `python bench.py` on the TPU) at the same hot-path tree it
describes. update_headline.py stamps the hot-path digest into the block;
this test recomputes it, so ANY edit under unified_cvo_tpu/ops/,
models/align.py, or bench.py turns the suite red until the headline is
re-measured — including end-of-round snapshot sweeps, which bypassed the
standing rule in rounds 3 and 4.
"""

import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))


def test_headline_digest_matches_hotpath_tree():
    from hotpath_digest import hotpath_digest

    perf = (ROOT / "PERF.md").read_text()
    m = re.search(r"Hot-path digest at measurement: `([0-9a-f]{12})`", perf)
    assert m, (
        "PERF.md headline block carries no hot-path digest — regenerate it "
        "with `python scripts/update_headline.py` (runs bench.py on the TPU)")
    assert m.group(1) == hotpath_digest(), (
        "hot-path sources changed since the PERF.md headline was measured — "
        "re-run `python scripts/update_headline.py` (bench-before-land rule)")
