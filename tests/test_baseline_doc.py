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
    """Every round table PRESENT in the generated section must equal a
    fresh render of its BENCH_rNN.json — quoted numbers can never drift
    from the committed artifact. A brand-new artifact with no table yet
    (the driver writes BENCH_rNN.json at round end, after the builder's
    last regeneration) is tolerated; the next regeneration picks it up."""
    import os

    mod = _load_script()
    artifacts = {os.path.basename(p): p for p in mod.bench_files()}
    assert artifacts, "no BENCH_r*.json artifacts found"

    with open(mod.BASELINE) as fh:
        text = fh.read()
    m = re.search(re.escape(mod.BEGIN) + r".*?" + re.escape(mod.END), text,
                  re.S)
    assert m, ("BASELINE.md is missing the generated numbers-of-record "
               "section — run scripts/update_baseline_bench.py")
    block = m.group(0)
    rendered_rounds = re.findall(r"### (BENCH_r\d+\.json)", block)
    assert rendered_rounds, "generated section contains no round tables"
    for name in rendered_rounds:
        assert name in artifacts, (
            f"{name} table exists but the artifact is gone — re-run "
            "scripts/update_baseline_bench.py")
        want = mod.render_one(artifacts[name])
        assert want in block, (
            f"{name} table is stale vs the committed artifact — re-run "
            "scripts/update_baseline_bench.py")


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


def test_round_sections_quote_committed_headlines():
    """VERDICT r5 next #9: any `Committed-headline rN:` marker line in
    BASELINE.md must quote EXACTLY the committed BENCH_r0N.json headline
    (encode_gb_per_sec + compression_ratio). Markers for rounds whose
    artifact hasn't landed yet (the driver writes BENCH_rNN.json at round
    end) say 'pending' instead of numbers. From round 5 on, every round
    section must carry the marker."""
    import json

    with open(os.path.join(REPO, "BASELINE.md")) as fh:
        text = fh.read()

    rounds_with_sections = [
        int(m) for m in re.findall(r"## Round-(\d+) measured results", text)]
    markers = dict(re.findall(
        r"Committed-headline r(\d+): (pending|\*\*[\d.]+ GB/s\*\* at "
        r"\*\*[\d.]+x\*\*)", text))
    for n in rounds_with_sections:
        if n >= 5:
            assert str(n) in markers, (
                f"Round-{n} section lacks a 'Committed-headline r{n}:' "
                "marker line")
    newest = max(int(n) for n in markers) if markers else 0
    for n_str, quoted in markers.items():
        artifact = os.path.join(REPO, f"BENCH_r{int(n_str):02d}.json")
        if not os.path.exists(artifact):
            assert quoted == "pending", (
                f"marker r{n_str} quotes numbers but {artifact} does not "
                "exist yet")
            continue
        if int(n_str) == newest and quoted == "pending":
            # Structural (VERDICT r6 wrong #1): the driver writes
            # BENCH_rNN.json AFTER the builder's final commit, so the
            # CURRENT round's marker is always 'pending' when the judge
            # runs pytest against the committed tree. Tolerate 'pending'
            # for the newest marker only; all earlier rounds must quote.
            continue
        with open(artifact) as fh:
            p = json.load(fh)["parsed"]
        want = (f"**{p['encode_gb_per_sec']} GB/s** at "
                f"**{p['compression_ratio']}x**")
        assert quoted == want, (
            f"marker r{n_str} quotes {quoted!r} but the committed artifact "
            f"says {want!r} — fix the BASELINE.md marker")
