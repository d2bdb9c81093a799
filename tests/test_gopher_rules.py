"""Gopher-style rule gate (operators/text.py:gopher_rules) — boundary
pins; values are 3-SF oracle-gated via gopher_rule_gate."""

from __future__ import annotations


def test_rule_boundaries_and_composite(spark):
    from flink_uba_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            # 20 words of 4 letters: wc at lower bound, mwl 4000, uniq low
            (1, " ".join(["word"] * 20)),
            # 22 distinct words alternating 4/5 letters → mwl 4500, all ok
            (2, " ".join(
                (f"w{i:03d}" if i % 2 else f"ww{i:03d}") for i in range(22)
            )),
            # 19 words → wc fails
            (3, " ".join(f"w{i:03d}" for i in range(19))),
            # long words → mwl fails high
            (4, " ".join(["wwwwwwwwww"] * 25)),
        ],
        "doc_id long, text string",
    )
    got = gopher_rules(docs).toPandas().set_index("doc_id")
    assert bool(got.loc[1, "wc_ok"]) and got.loc[1, "mwl_pm"] == 4000
    assert not got.loc[1, "uniq_ok"]  # 1000/20 = 50 permille
    assert not got.loc[1, "keep"]
    assert bool(got.loc[2, "keep"])  # 21 words, mwl 4000, uniq 1000
    assert not got.loc[3, "wc_ok"] and not got.loc[3, "keep"]
    assert not got.loc[4, "mwl_ok"] and got.loc[4, "mwl_pm"] == 10000


def test_integer_permille_exactness(spark):
    """mwl uses div (true integer division) — 4999 permille stays below a
    5000 threshold; float arithmetic near the boundary must not leak in."""
    from flink_uba_spark.operators.text import gopher_rules

    # 3 words: letters 15 → 15000/3 = 5000 exactly; letters 14 → 4666
    docs = spark.createDataFrame(
        [(1, "abcde abcde abcde"), (2, "abcde abcde abcd")],
        "doc_id long, text string",
    )
    got = gopher_rules(docs, mwl_pm_bounds=(0, 4999)).toPandas().set_index("doc_id")
    assert got.loc[1, "mwl_pm"] == 5000 and not got.loc[1, "mwl_ok"]
    assert got.loc[2, "mwl_pm"] == 4666 and bool(got.loc[2, "mwl_ok"])
