#!/usr/bin/env python
"""Regenerate SURVEY.md §8 (implementation-status appendix) from the
query registry: every §2 operator tag mapped to the queries that cover
it, `*` marking rows-only checks. Run after adding/renaming queries:

    python scripts/gen_survey_status.py
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = "## 8. Implementation status (auto-generated from the query registry)"

PREAMBLE = """
Every §2 operator ID mapped to its registered driver-contract queries
(`__spark_entry__.queries()`); `*` marks rows-only checks (no SQL
oracle — engine-specific hashing/streaming/Python ops, property-tested
in `tests/` instead). Library surfaces without a query of their own:
S5/S6 JDBC source+sink (`sources/io.py:read_jdbc`/`write_jdbc`,
roundtrip-tested in-container against Spark's bundled Derby embedded
database), S8 DDL/`saveAsTable`
(`sources/io.py:write_bucketed`), Q4 retries (`pipeline.py`), T7
exactly-once sink (`streaming/jobs.py:stream_upsert_to_parquet`,
replay-tested), custom stateful operator
(`streaming/jobs.py:stream_user_profile_state`).

| §2 ID | Queries |
|---|---|
"""


def main() -> int:
    from etl_showcase_spark.registry import all_specs

    by_tag: dict[str, list[str]] = defaultdict(list)
    for name, spec in all_specs().items():
        label = name if spec.oracle else f"{name}*"
        for tag in spec.tags:
            by_tag[tag].append(label)

    def tag_key(t: str):
        m = re.match(r"([A-Z]+)(\d+)", t)
        return (m.group(1), int(m.group(2))) if m else (t, 0)

    lines = [HEADER, PREAMBLE.rstrip() + "\n"]
    for tag in sorted(by_tag, key=tag_key):
        lines.append(f"| {tag} | {', '.join(sorted(by_tag[tag]))} |")
    section = "\n".join(lines) + "\n"

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    with open(path) as f:
        text = f.read()
    idx = text.index(HEADER)
    with open(path, "w") as f:
        f.write(text[:idx] + section)
    print(f"rewrote §8 with {len(by_tag)} tags, {len(all_specs())} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
