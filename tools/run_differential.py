#!/usr/bin/env python3
"""End-to-end differential driver: reference (Rust/scraper) vs this
engine's extract_text, byte-for-byte.

Builds tools/diff_harness (requires crates.io; pinned to the
reference's scraper 0.22.0), generates the corpus (clean pages +
adversarial mutations from tests/test_html_differential.py), runs both
extractors, and reports byte mismatches.

Usage:  python tools/run_differential.py [N_CLEAN] [N_MUTATED]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    n_clean = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    n_mut = int(sys.argv[2]) if len(sys.argv) > 2 else 600

    harness = REPO / "tools" / "diff_harness"
    build = subprocess.run(
        ["cargo", "build", "--release"], cwd=harness, capture_output=True, text=True
    )
    if build.returncode != 0:
        print("cargo build failed (no crates.io access?):", file=sys.stderr)
        print(build.stderr[-2000:], file=sys.stderr)
        print("Offline fallback: python -m pytest tests/test_html_differential.py")
        return 2
    exe = harness / "target" / "release" / "diff_harness"

    from rdf_knowledge_extractor_spark.functions.html_text import extract_text
    from rdf_knowledge_extractor_spark.sources.pages import generate_page
    from tests.test_html_differential import GOLDENS, _mutate

    cases: list[tuple[str, bytes]] = []
    for label, html, _ in GOLDENS:
        cases.append((f"golden-{label}", html.encode("utf-8")))
    for i in range(n_clean):
        cases.append((f"clean-{i}", generate_page(i, seed=31).html))
    for i in range(n_mut):
        pg = generate_page(i % max(n_clean, 1), seed=31)
        cases.append((f"mut-{i}", _mutate(pg.html, i)))

    with tempfile.TemporaryDirectory() as td:
        paths = []
        for name, data in cases:
            p = Path(td) / f"{name}.html"
            p.write_bytes(data)
            paths.append(str(p))
        ref_out: dict[str, str] = {}
        for chunk_at in range(0, len(paths), 500):
            chunk = paths[chunk_at : chunk_at + 500]
            res = subprocess.run([str(exe), *chunk], capture_output=True, text=True)
            res.check_returncode()
            for line in res.stdout.splitlines():
                rec = json.loads(line)
                ref_out[Path(rec["file"]).stem] = rec["text"]

    mismatches = 0
    for name, data in cases:
        ours = extract_text(data.decode("utf-8", errors="replace"))
        theirs = ref_out[name]
        if ours != theirs:
            mismatches += 1
            print(f"MISMATCH {name}:\n  ref : {theirs!r}\n  ours: {ours!r}")
    total = len(cases)
    print(f"{total - mismatches}/{total} byte-identical")
    return 0 if mismatches == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
