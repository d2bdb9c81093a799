"""Deterministic content-hash sampling — train/test splits and fractional
samples that are reproducible across runs, engines, task retries, and
input re-splits.

``df.sample()`` / TABLESAMPLE draw from a partition-seeded RNG: the
assignment changes whenever the input splits change, which silently leaks
test rows into training on any re-run over re-partitioned data. Keying
the split on md5(id) makes it a pure function of the ROW — the property a
training pipeline actually needs (and the same rand→hash discipline as
salted_join, operators/skew.py). Everything is a per-row JVM expression:
no shuffle, no UDF, fuses into whole-stage codegen on the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(col: Column, salt: str = "", buckets: int = 1000) -> Column:
    """Uniform bucket in [0, buckets) from md5 of the column's string form
    (first 8 hex digits → 32-bit int). md5 — not xxhash64/crc32 — so any
    engine can reproduce the assignment from the stored id alone."""
    h = F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    test_permille: int = 100,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split_col``: 'test' for rows whose hash bucket falls below
    ``test_permille`` (per-thousand), else 'train'. ``salt`` derives
    independent splits from the same ids (e.g. cross-validation folds)."""
    b = _hash_bucket(F.col(id_col), salt)
    return df.withColumn(
        split_col, F.when(b < test_permille, F.lit("test")).otherwise(F.lit("train"))
    )


def hash_sample(
    df: DataFrame, id_col: str = "doc_id", keep_permille: int = 100, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~keep_permille/1000 fraction of rows."""
    return df.filter(_hash_bucket(F.col(id_col), salt) < keep_permille)


def quota_hash_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACT quota per stratum: keep precisely ``quota`` rows per value of
    ``strata_col`` (all rows when the stratum is smaller), chosen by
    md5-hash order — the corpus-mixing primitive for fixed budgets
    ("exactly 1M docs per language"), where rate-based sampling
    (stratified_hash_sample) only hits the target in expectation.
    Deterministic across runs/engines/re-partitioning: the hash order is
    row-intrinsic, ties broken by id. One exchange (the per-stratum rank
    window, keyed on the stratum)."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates_permille: dict[str, int],
    id_col: str = "doc_id",
    default_permille: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the downsample/upweight step
    of corpus mixing (e.g. keep all rare-language docs, thin the dominant
    one). Each stratum keeps its own ~rate/1000 slice, still keyed on
    md5(id) so membership is row-intrinsic and strata stay consistent
    across runs. Strata absent from ``rates_permille`` keep
    ``default_permille``. Per-row expressions only — no shuffle."""
    rate = F.lit(default_permille)
    for value, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(permille)).otherwise(rate)
    return df.filter(_hash_bucket(F.col(id_col), salt) < rate)
