"""Train the repo's classifier-gate weight FIXTURE once and persist it.

Round-6 (r5 verdict item 5): the catalog query
``classifier_quality_filter_trained`` serves TRAINED weights, not the
synthetic md5 dim — this tool produces them. The labeled set is fully
deterministic (seeded synthetic clean-vs-gibberish docs, the same
generator the round-5 gate tests hold the trainer to ≥95% held-out
accuracy with), training runs pyspark.ml logistic regression via
``operators/text.py:train_classifier_weights`` (zero-Python feature
assembly), and the quantized integer (bucket, weight) frame is written as
ONE parquet file at ``fixtures/classifier_weights.parquet`` — committed,
so the catalog query and its DuckDB oracle read the identical bytes and
the hash gate can never drift on training nondeterminism.

Usage:  python tools/train_classifier_fixture.py
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLEAN_WORDS = (
    "the quick brown fox jumps over a lazy dog while many people read good "
    "books about science history music art nature travel food health work "
    "family friends school learning writing thinking speaking walking"
).split()
GIBBERISH_CHARS = "xqzjvwkf"


def make_labeled(n_per_class: int = 400, seed_clean: int = 101, seed_bad: int = 202):
    """The deterministic labeled corpus: label 1 = clean English-ish text,
    label 0 = consonant gibberish (the distribution-shift the gate is
    trained to reject)."""

    def docs(n, gibberish, seed):
        rnd = random.Random(seed)
        out = []
        for i in range(n):
            if gibberish:
                words = [
                    "".join(
                        rnd.choice(GIBBERISH_CHARS) for _ in range(rnd.randint(4, 9))
                    )
                    for _ in range(rnd.randint(6, 14))
                ]
            else:
                words = [rnd.choice(CLEAN_WORDS) for _ in range(rnd.randint(6, 14))]
            out.append((i, " ".join(words)))
        return out

    return [(i, t, 1) for i, t in docs(n_per_class, False, seed_clean)] + [
        (i + 100_000, t, 0) for i, t in docs(n_per_class, True, seed_bad)
    ]


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_uba_spark.operators.text import train_classifier_weights
    from flink_uba_spark.session import get_spark

    spark = get_spark("train-classifier-fixture", shuffle_partitions=8)
    labeled = spark.createDataFrame(
        make_labeled(), "doc_id long, text string, label int"
    )
    w = train_classifier_weights(labeled)
    rows = sorted((r.bucket, r.weight) for r in w.collect())
    assert len(rows) == 256
    table = pa.table(
        {
            "bucket": pa.array([b for b, _ in rows], type=pa.int32()),
            "weight": pa.array([wt for _, wt in rows], type=pa.int64()),
        }
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "classifier_weights.parquet",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    nz = sum(1 for _, wt in rows if wt != 0)
    print(f"wrote {out}: 256 buckets, {nz} non-zero weights")


if __name__ == "__main__":
    main()
