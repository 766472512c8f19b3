"""Plot per-frame / per-iteration registration diagnostics — the twin of the
reference's scripts/plot_ell_ip.py + plot_nonzero_trend.py, reading either a
driver metrics jsonl (utils/logging.MetricsLogger output) or an align history
npz (align(record_history=True)).

Usage:
    python scripts/plot_history.py metrics.jsonl out.png
    python scripts/plot_history.py history.npz out.png
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        return 1
    src, out = argv[0], argv[1]

    if src.endswith(".npz"):
        h = np.load(src)
        keys = [k for k in ("ell", "step", "dist", "ip", "nonzeros", "a_sum")
                if k in h]
        fig, axes = plt.subplots(len(keys), 1, figsize=(8, 2.2 * len(keys)),
                                 sharex=True)
        for ax, k in zip(np.atleast_1d(axes), keys):
            ax.plot(h[k])
            ax.set_ylabel(k)
        axes[-1].set_xlabel("iteration")
    else:
        rows = [json.loads(l) for l in open(src) if l.strip()]
        keys = [k for k in ("iterations", "final_ell", "nonzeros",
                            "frontend_seconds", "align_wait_seconds")
                if rows and k in rows[0]]
        fig, axes = plt.subplots(len(keys), 1, figsize=(8, 2.2 * len(keys)),
                                 sharex=True)
        x = [r.get("frame", i) for i, r in enumerate(rows)]
        for ax, k in zip(np.atleast_1d(axes), keys):
            ax.plot(x, [r.get(k) for r in rows])
            ax.set_ylabel(k)
        axes[-1].set_xlabel("frame")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
