"""Executable invariant for the cross-engine md5-prefix hash idiom.

The repo's portable 60-bit integer hash is ``substr(md5(x), 1, 15)``
cast to BIGINT — Spark as ``conv(..., 16, 10)``, DuckDB as
``('0x' || ...)::BIGINT``. The idiom appears at ~13 sites across the
plan modules (samplers, minhash shingles, DSIR buckets, split keys,
bloom positions…), always hand-written because it is embedded in
f-string oracles. The width is load-bearing twice over: 15 hex digits
(60 bits) is the largest md5 prefix that fits a signed BIGINT on BOTH
engines (16 digits overflows DuckDB's cast), and a site silently
widened or narrowed on one engine only would break that query's hash
gate at some data size while passing the fixtures.

Rather than thread a shared helper through five modules' f-strings
(high churn, zero behavior change), this test pins the invariant the
helper would enforce: every md5-prefix-to-integer site uses exactly
15 hex digits starting at position 1 (review r06).
"""

from __future__ import annotations

import glob
import os
import re

PLANS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "aws_weather_data_pipeline_spark",
)


def _sources() -> dict[str, str]:
    return {
        path: open(path).read()
        for path in glob.glob(os.path.join(PLANS, "**", "*.py"),
                              recursive=True)
    }


def test_md5_prefix_hash_sites_are_all_60_bit():
    # any substr/substring over an md5() result that feeds a number
    pat = re.compile(
        r"subst(?:r|ring)\(\s*md5\([^)]*\)[^,]*,\s*(\d+)\s*,\s*(\d+)\s*\)"
    )
    bad = []
    n_sites = 0
    for path, src in _sources().items():
        for m in pat.finditer(src):
            start, width = int(m.group(1)), int(m.group(2))
            n_sites += 1
            if (start, width) != (1, 15):
                bad.append(
                    f"{os.path.relpath(path, PLANS)}: "
                    f"substr(md5(...), {start}, {width})"
                )
    assert n_sites >= 10, (
        "expected the idiom at 10+ sites; the regex stopped matching "
        f"(found {n_sites}) — update the pattern with the code"
    )
    assert not bad, (
        "md5-prefix hash sites must all be (1, 15) — 60 bits, the "
        "widest signed-BIGINT-safe md5 prefix on BOTH engines: "
        f"{bad}"
    )


def test_hex_to_int_casts_pair_correctly():
    srcs = _sources()
    # Spark side: every conv( hash site converts base 16 -> 10 (a
    # nested-paren-tolerant check: conv appears in the repo only for
    # this idiom)
    n_conv = 0
    bad_conv = []
    for path, src in srcs.items():
        for line_no, line in enumerate(src.splitlines(), 1):
            if "conv(" not in line:
                continue
            n_conv += 1
            joined = line
            # args may wrap to the next line
            if "16, 10" not in joined:
                nxt = src.splitlines()[line_no : line_no + 1]
                joined += nxt[0] if nxt else ""
            if "16, 10" not in joined:
                bad_conv.append(
                    f"{os.path.relpath(path, PLANS)}:{line_no}"
                )
    # DuckDB side: ('0x' || substr(md5(...)))::BIGINT
    duck_pat = re.compile(r"'0x'\s*\|\|\s*subst")
    n_duck = sum(len(duck_pat.findall(s)) for s in srcs.values())
    assert not bad_conv, f"conv( sites not base-16->10: {bad_conv}"
    assert n_conv >= 5 and n_duck >= 5, (n_conv, n_duck)
