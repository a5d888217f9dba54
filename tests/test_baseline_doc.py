"""BASELINE.md's per-round numbers of record must EQUAL the committed
BENCH_r*.json artifacts (VERDICT r4 next #3 / r3 #2: three rounds
running, the prose quoted a non-committed run). The generated section is
byte-compared against a fresh in-memory render, so any new artifact or
hand-edit fails until `scripts/update_baseline_bench.py` is re-run."""

import importlib.util
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "update_baseline_bench",
        os.path.join(REPO, "scripts", "update_baseline_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_baseline_numbers_of_record_match_committed_artifacts():
    mod = _load_script()
    artifacts = mod.bench_files()
    assert artifacts, "no BENCH_r*.json artifacts found"

    with open(mod.BASELINE) as fh:
        text = fh.read()
    m = re.search(re.escape(mod.BEGIN) + r".*?" + re.escape(mod.END), text,
                  re.S)
    assert m, ("BASELINE.md is missing the generated numbers-of-record "
               "section — run scripts/update_baseline_bench.py")
    assert m.group(0) == mod.render_all(), (
        "BASELINE.md numbers-of-record section is stale vs the committed "
        "BENCH_r*.json artifacts — re-run scripts/update_baseline_bench.py")


def test_round4_prose_quotes_the_committed_headline():
    """The round-4 section's headline numbers are the BENCH_r04.json
    values, not a better non-committed run."""
    import json

    with open(os.path.join(REPO, "BENCH_r04.json")) as fh:
        p = json.load(fh)["parsed"]
    with open(os.path.join(REPO, "BASELINE.md")) as fh:
        text = fh.read()
    r4 = text.split("## Round-4 measured results")[1].split("\n## ")[0]
    assert f"{p['value']:.1f} s" in r4          # 102.3 s total
    assert str(p["encode_gb_per_sec"]) in r4    # 0.3831 GB/s headline
    assert f"over {len(p['queries'])} queries" in r4
