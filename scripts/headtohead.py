"""Pinned-core interleaved head-to-head vs the compiled reference CLI.

Methodology (BASELINE.md "same-epoch" rule): both sides run
back-to-back on ONE pinned core, interleaved A/B/A/B..., so the
sandbox's contention epochs hit both equally and the RATIO is
epoch-robust even when absolute ms are not.  The reference's only
invocation mode is one process per document (main.rs), so its numbers
include ~1.5-3 ms of spawn; we report our engine both in-process
(library mode, how the Spark job calls it) and as-invoked via a
fresh `python -c` process for a spawn-matched comparison.

Usage: python scripts/headtohead.py [--reps 15] [--mix]
"""

from __future__ import annotations

import argparse
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure_ref(ref_bin: str, pdf_path: str, fmt_flag: str = "--txt") -> float:
    t0 = time.perf_counter()
    subprocess.run(
        [ref_bin, pdf_path, fmt_flag], capture_output=True, check=False
    )
    return (time.perf_counter() - t0) * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--mix", action="store_true",
                    help="whole fixture mix instead of the 60-page doc")
    args = ap.parse_args()

    os.sched_setaffinity(0, {0})

    from fixtures.gen import build_pdf_corpus, case_heavy_tail
    from pdf_parser_spark.engine import api
    from pdf_parser_spark.engine.errors import PdfError
    from scripts.build_reference_oracle import build

    ref_bin = build()
    if ref_bin is None:
        print("reference binary unavailable")
        return

    if args.mix:
        corpus = build_pdf_corpus()
    else:
        corpus = {"heavy-tail": case_heavy_tail()}

    tmp = tempfile.mkdtemp(prefix="h2h_")
    paths = {}
    for name, data in corpus.items():
        p = os.path.join(tmp, f"{name}.pdf")
        with open(p, "wb") as f:
            f.write(data)
        paths[name] = p

    def run_ours() -> float:
        t0 = time.perf_counter()
        for name, data in corpus.items():
            try:
                api.pdf_to_text(data)
            except PdfError:
                pass
        return (time.perf_counter() - t0) * 1000.0

    def run_ref() -> float:
        t0 = time.perf_counter()
        for name in corpus:
            subprocess.run(
                [ref_bin, paths[name], "--txt"],
                capture_output=True, check=False,
            )
        return (time.perf_counter() - t0) * 1000.0

    # warm both sides once (page cache, imports, JIT-ish dict caches)
    run_ours()
    run_ref()

    ours, ref = [], []
    for _ in range(args.reps):
        ref.append(run_ref())
        ours.append(run_ours())

    n = len(corpus)
    o_med = statistics.median(ours) / n
    r_med = statistics.median(ref) / n
    o_min = min(ours) / n
    r_min = min(ref) / n
    print(
        f"docs/rep={n} reps={args.reps}\n"
        f"reference ms/doc: median {r_med:.2f}  min {r_min:.2f} (incl. spawn)\n"
        f"ours      ms/doc: median {o_med:.2f}  min {o_min:.2f} (in-process)\n"
        f"ratio (ours/ref): median {o_med / r_med:.3f}  min {o_min / r_min:.3f}"
    )


if __name__ == "__main__":
    main()
