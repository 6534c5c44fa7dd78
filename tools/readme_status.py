#!/usr/bin/env python3
"""Rewrite README.md's generated status lines from the committed
artifacts, VERBATIM — so the secondary (builder-run) bench figure can
never drift from BENCH.json again (it did in r13 and r14).

Usage: python3 tools/readme_status.py
Reads BENCH.json (builder's closing bench) and rewrites the block
between the STATUS:BENCH markers in README.md. Run it as the LAST step
before the closing commit, after the final bench run.
"""
import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BEGIN = "<!-- STATUS:BENCH -->"
END = "<!-- /STATUS:BENCH -->"


def main():
    b = json.loads((ROOT / "BENCH.json").read_text())
    total, n = b["value"], b["n_queries"]
    reps = b.get("reps", 1)
    # label the SF the artifact actually carries — hardcoding "sf0.1"
    # mislabeled any smoke-run BENCH.json (observed with an sf0.001 run)
    sf = Path(b.get("sf", "sf0.1")).name
    line = (
        f"{BEGIN}\n"
        f"Builder-run closing bench (secondary; rewritten from BENCH.json "
        f"by tools/readme_status.py): {sf} bench {total} s over {n} "
        f"queries (median-of-{reps}, local[32]) = {total / n:.3f} s/query.\n"
        f"{END}"
    )
    readme = (ROOT / "README.md").read_text()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pat.search(readme):
        raise SystemExit("STATUS:BENCH markers not found in README.md")
    (ROOT / "README.md").write_text(pat.sub(line, readme))
    print(line)


if __name__ == "__main__":
    main()
