"""README's front-page query counts are pinned to the live registry
(round-13, VERDICT r12 item 6 — the counts drifted twice by hand).
"""

import os
import re


def test_readme_counts_match_registry():
    from etl_showcase_spark.registry import all_specs

    specs = all_specs()
    total = len(specs)
    with_oracle = sum(1 for s in specs.values() if s.oracle is not None)

    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    ).read()
    m = re.search(r"exposes (\d+) queries", readme)
    assert m and int(m.group(1)) == total, (
        f"README says 'exposes {m and m.group(1)} queries', registry has {total}"
    )
    m = re.search(r"(\d+) of the (\d+) queries carry full value-hash", readme)
    assert m and (int(m.group(1)), int(m.group(2))) == (with_oracle, total), (
        f"README oracle counts {m and m.groups()} != registry ({with_oracle}, {total})"
    )
    m = re.search(r"The remaining (\d+) are rows-only", readme)
    assert m and int(m.group(1)) == total - with_oracle
