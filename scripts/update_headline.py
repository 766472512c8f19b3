#!/usr/bin/env python
"""Regenerate the README.md / PERF.md headline blocks from a real bench run.

Claim-hygiene one-shot (VERDICT r3 task 9): every number in the headline
blocks must come from `python bench.py` run against the committed tree.
This script runs the bench (or re-parses a saved log), extracts the
measured numbers, and rewrites the text between the
`<!-- headline:begin -->` / `<!-- headline:end -->` markers in both
files, stamping the current commit.

Usage:
    python scripts/update_headline.py             # runs bench.py (TPU)
    python scripts/update_headline.py --log f.txt # reuse a saved run log
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def run_bench() -> str:
    print("running bench.py (TPU, a few minutes)...", file=sys.stderr)
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=900)
    if proc.returncode != 0:
        sys.exit(f"bench.py failed:\n{proc.stdout}\n{proc.stderr}")
    return proc.stdout


def parse(log: str) -> dict:
    out = {}
    m = re.search(r"sequence: [\d.]+ ms for (\d+) frames, ([\d.]+) ms/frame",
                  log)
    out["frames"], out["ms_frame"] = int(m.group(1)), float(m.group(2))
    m = re.search(r"single-pair latency: ([\d.]+) ms \((\d+) iters\)", log)
    out["pair_ms"], out["pair_iters"] = float(m.group(1)), int(m.group(2))
    m = re.search(r"pose error \|xi\|: max=([\d.]+) mean=([\d.]+)", log)
    out["err_max"], out["err_mean"] = float(m.group(1)), float(m.group(2))
    for line in log.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            out.update(json.loads(line))
    out["commit"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
        capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=ROOT,
                           capture_output=True, text=True).stdout.strip()
    # README/PERF edits themselves don't count as a dirty measurement tree
    if any(not l.endswith(("README.md", "PERF.md")) for l in dirty.splitlines()):
        out["commit"] += "-dirty"
    return out


def replace_block(path: pathlib.Path, body: str) -> None:
    text = path.read_text()
    pat = re.compile(r"(<!-- headline:begin[^>]*-->\n).*?(<!-- headline:end -->)",
                     re.S)
    if not pat.search(text):
        sys.exit(f"no headline markers in {path}")
    path.write_text(pat.sub(lambda m: m.group(1) + body + m.group(2), text))
    print(f"updated {path.name}", file=sys.stderr)


def band_and_driver(fps: float, digest: str) -> tuple[str, str]:
    """Record this run in BENCH_RUNS.jsonl and return (band text, latest
    driver-captured number) — the headline carries the measured band
    across the round's runs, not a single favorable sample (round-4
    verdict task 6)."""
    import time

    runs_path = ROOT / "BENCH_RUNS.jsonl"
    entry = {"fps": round(fps, 1), "digest": digest,
             "t": time.strftime("%Y-%m-%dT%H:%M:%S")}
    with runs_path.open("a") as f:
        f.write(json.dumps(entry) + "\n")
    # the band must describe ONE hot-path tree: runs stamped with a
    # different digest measured different code, and mixing them conflates
    # code deltas with tunnel variance
    fpses = []
    for line in runs_path.read_text().splitlines():
        try:
            e = json.loads(line)
            if e.get("digest") == digest:
                fpses.append(e["fps"])
        except (ValueError, KeyError):
            pass
    fpses = fpses[-10:]
    band = (f"{min(fpses):.1f}–{max(fpses):.1f} fps across {len(fpses)} "
            f"runs of this tree")
    driver = ""
    benches = sorted(ROOT.glob("BENCH_r*.json"))
    if benches:
        try:
            d = json.loads(benches[-1].read_text())
            driver = (f"driver-captured {benches[-1].stem}: "
                      f"{d.get('value', d):.1f} fps")
        except (ValueError, TypeError):
            pass
    return band, driver


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", help="saved bench.py stdout to re-parse "
                                  "instead of running the bench")
    args = ap.parse_args()
    log = pathlib.Path(args.log).read_text() if args.log else run_bench()
    r = parse(log)
    fps, vsb = r["value"], r["vs_baseline"]
    sys.path.insert(0, str(ROOT / "scripts"))
    from hotpath_digest import hotpath_digest

    digest = hotpath_digest()
    band, driver = band_and_driver(fps, digest)
    prov = f"tunnel band {band}" + (f"; {driver}" if driver else "")

    readme_body = (
        f"- **{fps:.1f} registered frames/s** steady-state "
        f"({r['ms_frame']:.1f} ms/frame, pose error\n"
        f"  |ξ| max {r['err_max']:.3f} / mean {r['err_mean']:.3f}) via the "
        f"fused-Pallas Verlet ELL path. The\n"
        f"  reference's CUDA implementation reports ~0.5 s per KITTI frame "
        f"on a\n  desktop GPU (~2 frames/s), i.e. **≈{vsb:.1f}× the "
        f"reference baseline**.\n"
        f"  Measured at commit `{r['commit']}` by `python bench.py` "
        f"({prov}).\n")
    perf_body = (
        f"**Current headline: {fps:.1f} fps ({r['ms_frame']:.1f} ms/frame), "
        f"single-pair latency\n{r['pair_ms']:.1f} ms ({r['pair_iters']} "
        f"iters), pose error |ξ| max {r['err_max']:.3f} / mean "
        f"{r['err_mean']:.3f} — measured at\ncommit `{r['commit']}` by "
        f"`python bench.py`.**\nShared-tunnel provenance: {prov}.\n"
        f"Hot-path digest at measurement: `{digest}` "
        f"(tests/test_headline_guard.py\nfails until a hot-path edit "
        f"re-runs this script — the bench-before-land\nguard). The "
        f"progression table below is the historical log (each row\n"
        f"measured at its own commit).\n")
    replace_block(ROOT / "README.md", readme_body)
    replace_block(ROOT / "PERF.md", perf_body)
    print(json.dumps({k: r[k] for k in
                      ("value", "ms_frame", "pair_ms", "commit")}
                     | {"digest": digest}))


if __name__ == "__main__":
    main()
