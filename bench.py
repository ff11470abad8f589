"""Benchmark harness — prints ONE JSON line.

Measures (a) end-to-end extraction throughput (documents/sec) on a
deterministic distributed-synthesized span corpus sized to the SF, and
(b) the headline operator queries on the driver tables at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), on
``local[$SPARK_GRAFT_CPUS]``.

Scaling evidence (BASELINE.md north rule): ``--scaling`` re-runs the same
extraction job at local[8] and local[32] on the same input in fresh JVMs
(subprocess isolation) and reports throughput at both plus
efficiency = (thr@32 / thr@8) / 4. The default run includes it unless
SPARK_GRAFT_SKIP_SCALING=1.

Timing discipline: session startup, input materialization, and a warmup
pass are excluded; the measured window is the action over scan+transform.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_LABEL = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"
N_DOCS = max(2000, int(float(SF_LABEL) * 400_000)) if SF_LABEL.replace(".", "").isdigit() else 40_000
CORPUS_PATH = f"/tmp/ktpm_bench_corpus_{N_DOCS}_v3.parquet"
DRIVER_MEM = os.environ.get("SPARK_DRIVER_MEM", "16g")


def _corpus(spark):
    from ktpm___ocr_spark.sources.generator import materialize

    marker = os.path.join(CORPUS_PATH, "_SUCCESS")
    if not os.path.exists(marker):
        materialize(spark, CORPUS_PATH, n_docs=N_DOCS, seed=42, partitions=256)
    return spark.read.parquet(CORPUS_PATH)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def extraction_run(master: str) -> dict:
    """Timed extraction (narrow plan) on the synthesized corpus."""
    from ktpm___ocr_spark.pipeline import extract_narrow
    from ktpm___ocr_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extract",
        master=master,
        extra_conf={"spark.driver.memory": DRIVER_MEM},
    )
    docs = _corpus(spark)
    n = docs.count()
    # JIT/C2 on the regex-heavy codegen needs several passes to reach
    # steady state; report the best of 2 timed runs after 2 warmups (the
    # host VM shows heavy neighbor noise — minima are the stable signal).
    for _ in range(2):
        _noop(extract_narrow(docs))
    walls = []
    for _ in range(3):
        t0 = time.monotonic()
        _noop(extract_narrow(docs))
        walls.append(time.monotonic() - t0)
    wall = min(walls)
    spark.stop()
    return {"docs": n, "sec": round(wall, 3), "docs_per_sec": round(n / wall, 1)}


def operator_bench(spark) -> dict[str, float]:
    import __spark_entry__ as em

    qs = em.queries()
    headline = [
        "tpch_q1",
        "revenue_by_nation",
        "tpch_q3_top_orders",
        "w1_history_top5",
        "w4_rate_windows",
        "a5_percentiles",
        "dedup_minhash_pairs",
        "dedup_simhash",
        "ann_topk_bruteforce",
        "text_quality",
        "text_fingerprint",
        "c3_restitch_grouped",
        "multimodal_stub",
    ]
    out: dict[str, float] = {}
    for name in headline:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warmup (footers, codegen)
        spark.catalog.clearCache()  # honest timing: no warm cache carryover
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t0, 3)
        spark.catalog.clearCache()
    return out


def main() -> None:
    scaling = None
    if "--scaling-worker" in sys.argv:
        master = sys.argv[sys.argv.index("--scaling-worker") + 1]
        print(json.dumps(extraction_run(master)))
        return

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        # Interleave N/4N runs (3 rounds each) so host-VM load drift hits
        # both levels equally; per level keep the best docs/sec.
        best = {8: None, 32: None}
        rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "2"))
        import shutil

        taskset = shutil.which("taskset")
        for _ in range(rounds):
            for n in (8, 32):
                cmd = [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--scaling-worker",
                    f"local[{n}]",
                ]
                if taskset:
                    # pin the worker to exactly N CPUs: a local[N] run on a
                    # 32-core box otherwise gets free GC/JIT help from idle
                    # cores that a real N-core executor would not have
                    cmd = [taskset, "-c", f"0-{n - 1}"] + cmd
                p = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=1800
                )
                r = json.loads(p.stdout.strip().splitlines()[-1])
                if best[n] is None or r["docs_per_sec"] > best[n]["docs_per_sec"]:
                    best[n] = r
        eff = (best[32]["docs_per_sec"] / best[8]["docs_per_sec"]) / 4
        scaling = {
            "docs_per_sec_n8": best[8]["docs_per_sec"],
            "docs_per_sec_n32": best[32]["docs_per_sec"],
            "efficiency_n_to_4n": round(eff, 3),
        }
        extract = best[32]
    else:
        extract = extraction_run(f"local[{CPUS}]")

    from ktpm___ocr_spark.session import get_spark

    spark = get_spark(app_name="bench-operators", master=f"local[{CPUS}]")
    queries = operator_bench(spark)
    spark.stop()

    total = round(extract["sec"] + sum(queries.values()), 3)
    result = {
        "metric": "end_to_end_extraction_plus_operator_bench",
        "value": total,
        "unit": "sec",
        "queries": {"extract_narrow": extract["sec"], **queries},
        "sf": SF_LABEL,
        "extract_docs": extract["docs"],
        "extract_docs_per_sec": extract["docs_per_sec"],
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
