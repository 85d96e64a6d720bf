#!/usr/bin/env python
"""10x scale probe for the heaviest r5 curation operators
(substring dedup, decontamination, surprisal) — empirical evidence
for the linear bounds argued in SCALING.md.

Methodology (shared-host rules, CLAUDE.md): paired FRESH-JVM runs —
for each operator, alternate base-size and 10x-size single-trial
subprocesses so both sizes sample the same load epochs; min over
pairs per size; ratio = min(10x) / min(base). A linear operator with
some fixed cost lands well under 12x; a super-linear one blows past.

Input: a deterministic documents-shaped table (doc_id long, source,
text) generated Spark-side (no driver loops): ~100 tokens/doc from a
zipf-ish two-tier vocab (80% of positions from a 100-word head, else
a 50k tail), with every 20th document carrying one of 50 shared
20-token passages so substring dedup has real cross-document
duplicated windows at every scale. Base 20k docs ~= 2M tokens (the
bench sequences scale); 10x = 200k docs ~= 20M tokens.

Usage:
  python scripts/scale_probe.py            # full probe, prints table
  python scripts/scale_probe.py --one sub 20000   # single fresh run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE_ROWS = int(os.environ.get("SPARK_GRAFT_PROBE_ROWS", "20000"))
PAIRS = int(os.environ.get("SPARK_GRAFT_PROBE_PAIRS", "2"))
DOC_LEN = 100
CACHE = "/tmp/sjot_bench/docs_probe_{rows}_v1"

OPS = tuple(
    os.environ.get("SPARK_GRAFT_PROBE_OPS", "sub,dec,sur,mix").split(","))


def _gen(spark, rows: int):
    """Deterministic probe corpus; cached as parquet so timed runs
    measure the operator, not generation."""
    from pyspark.sql import functions as F

    path = CACHE.format(rows=rows)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    base = spark.range(rows)

    def tok(j):
        h = F.xxhash64(F.col("id") * DOC_LEN + j)
        head = F.concat(F.lit("w"), F.pmod(h, F.lit(100)).cast("string"))
        tail = F.concat(
            F.lit("x"),
            F.pmod(F.xxhash64(h), F.lit(50000)).cast("string"))
        body = F.when(F.pmod(h, F.lit(5)) < 4, head).otherwise(tail)
        # shared passage: docs id%20==0 carry passage (id/20)%50 at
        # positions 10..29 -> exact 20-token cross-doc duplicates
        return F.when(
            (F.pmod(F.col("id"), F.lit(20)) == 0)
            & (j >= 10) & (j < 30),
            F.concat(F.lit("p"),
                     F.pmod(F.col("id") / 20, F.lit(50)).cast("int")
                     .cast("string"),
                     F.lit("_"), (j - 10).cast("string")),
        ).otherwise(body)

    docs = base.select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20))
                 .cast("string")).alias("source"),
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(DOC_LEN - 1)), tok),
            " ").alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(path)


def _run_one(op: str, rows: int) -> float:
    from pyspark.sql import functions as F

    from sjot_spark.session import get_spark

    spark = get_spark(app_name=f"scale-probe-{op}-{rows}")
    _gen(spark, rows)
    docs = spark.read.parquet(CACHE.format(rows=rows))

    def build(d):
        if op == "sub":
            from sjot_spark.datapipe import substringdup

            out = substringdup.remove_duplicated_substrings(
                d, "doc_id", "text", k=10, min_count=2,
                carry_cols=("source",))
            return out.groupBy("source").agg(
                F.sum("n_removed").alias("tokens_removed"),
                F.sum(F.length("text_clean")).alias("chars_clean"))
        if op == "dec":
            from sjot_spark.datapipe import decontam
            from sjot_spark.queries import _eval_gram_hashes

            return decontam.contaminated_docs(
                d, _eval_gram_hashes(d), "doc_id", "text", n=8)
        if op == "sur":
            from sjot_spark.datapipe import surprisal

            census = surprisal.token_census(d, "text", max_vocab=500)
            scored = surprisal.score_documents(
                d, census, "doc_id", "text", carry_cols=("source",))
            return scored.groupBy("source").agg(
                F.sum("bits_sum").alias("bits_total"),
                F.sum("score_permille").alias("score_sum"))
        # mix: epoch-upsampled mixture (budget 2x, max_epochs 8) —
        # stats agg + broadcast rates + bounded explode, then the
        # output ledger agg (the source_mix_epochs query shape)
        from sjot_spark.datapipe import mixing

        nt = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
        dn = d.select("doc_id", "source", nt.alias("n_tok"))
        weights = dn.select("source").distinct().select(
            "source",
            (F.lit(10) + F.pmod(
                F.conv(F.substring(F.md5("source"), 1, 15), 16, 10)
                .cast("long"), F.lit(90))).alias("w_permille"))
        budget = dn.agg(F.sum("n_tok").alias("_t")).select(
            F.expr("_t * 2").cast("long").alias("total_budget"))
        rates = mixing.mix_rates(dn, weights, budget, max_epochs=8)
        sample = mixing.mix_sample_epochs(dn, rates)
        return sample.groupBy("source").agg(
            F.count(F.lit(1)).alias("docs_out"),
            F.sum("n_tok").alias("tokens_out"),
            F.sum("epoch").alias("epoch_sum"))

    # untimed warmup on a slice: JIT + codegen + parquet footers
    build(docs.limit(max(rows // 20, 500))).write.format("noop") \
        .mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    build(docs).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        op, rows = sys.argv[i + 1], int(sys.argv[i + 2])
        dt = _run_one(op, rows)
        print(json.dumps({"op": op, "rows": rows, "sec": round(dt, 3)}))
        return 0

    sizes = (BASE_ROWS, BASE_ROWS * 10)
    results: dict[str, dict[int, list[float]]] = {
        op: {s: [] for s in sizes} for op in OPS}
    for pair in range(PAIRS):
        for op in OPS:
            for rows in sizes:  # alternate sizes inside each epoch
                r = subprocess.run(
                    [sys.executable, __file__, "--one", op, str(rows)],
                    capture_output=True, text=True, check=True,
                    env=dict(os.environ),
                )
                rec = json.loads(r.stdout.strip().splitlines()[-1])
                results[op][rows].append(rec["sec"])
                print(f"pair {pair} {op} rows={rows}: {rec['sec']}s",
                      file=sys.stderr)
    summary = {}
    for op in OPS:
        lo = min(results[op][sizes[0]])
        hi = min(results[op][sizes[1]])
        summary[op] = {
            "rows_base": sizes[0], "rows_10x": sizes[1],
            "sec_base": round(lo, 3), "sec_10x": round(hi, 3),
            "ratio": round(hi / lo, 2),
            "all_base": results[op][sizes[0]],
            "all_10x": results[op][sizes[1]],
        }
    print(json.dumps({"probe": "10x-scale", "pairs": PAIRS,
                      "doc_len": DOC_LEN, "ops": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
