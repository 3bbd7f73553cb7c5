"""Round-over-round bench comparison: flag per-query regressions.

Reads two BENCH_r{N}.json files (or a bench.py stdout JSON line) and
prints queries whose best-of-2 wall changed by more than ``threshold``x
in either direction, plus the CORE-30 totals. The round-4 lesson
(a transient machine stall read as a +12% core regression until the
judge re-ran) is why this reports both raw samples when available —
a regression where sample[1] is also slow is real; one slow sample
with a fast second is machine noise.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold=1.5]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either a bench.py stdout capture (one JSON line) or a
    driver BENCH_r{N}.json wrapper (whole-file JSON whose ``parsed``
    field holds the bench line; r5/r6 wrappers have parsed=None because
    the driver truncates stdout — those can't be compared per-query).
    From round 7 the stdout line is COMPACT (core-30 queries only, under
    the driver's 2 KB tail) and the full per-query map lives in the
    repo's ``BENCH_local.json`` — pass that file for full-suite
    comparisons; driver wrappers compare the frozen core set."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        if isinstance(doc, dict) and "parsed" in doc:
            if doc["parsed"] is None:
                raise SystemExit(
                    f"{path}: driver wrapper has parsed=None "
                    "(truncated stdout) — no per-query data"
                )
            return doc["parsed"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    print(
        f"core-30: {old.get('core_value')} -> {new.get('core_value')} s | "
        f"full suite: {old['value']} ({len(oq)}q) -> "
        f"{new['value']} s ({len(nq)}q)"
    )
    flagged = 0
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        if ratio >= threshold or ratio <= 1 / threshold:
            flagged += 1
            samples = new.get("samples_sec", {}).get(name)
            noise = (
                " (2nd sample fast: likely noise)"
                if samples and min(samples) < threshold * a <= max(samples)
                else ""
            )
            print(
                f"  {'SLOWER' if ratio > 1 else 'faster'} {ratio:5.2f}x "
                f"{name}: {a:.3f} -> {b:.3f} s"
                f"{' samples ' + str(samples) if samples else ''}{noise}"
            )
    added = sorted(set(nq) - set(oq))
    if added:
        print(f"new queries ({len(added)}): " + ", ".join(added))
    if not flagged:
        print("no per-query changes beyond threshold")


if __name__ == "__main__":
    main()
