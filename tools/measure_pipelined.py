"""A/B: classic serial build (build_index + write_index) vs pipelined
segmented build (checkpoint.build_index_pipelined, FAIR scheduler) on the
400k bench corpus.  Interleaved pairs against hypervisor epoch drift.

Usage: python tools/measure_pipelined.py [cores] [rounds] [n_segments]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = "/tmp/msengines_bench/docs_400000.parquet"


def _session(name: str, cores: int):
    from modernsearchengines_spark.session import get_spark

    return get_spark(
        name,
        cores=cores,
        shuffle_partitions=4 * cores,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "64m",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.scheduler.mode": "FAIR",
        },
    )


def classic(cores: int, tag: str) -> float:
    from modernsearchengines_spark.operators import indexer

    spark = _session(f"classic-{tag}", cores)
    docs = spark.read.parquet(CORPUS)
    from pyspark.sql import functions as F

    docs.agg(F.sum(F.length("text"))).collect()  # warm page cache
    t0 = time.time()
    idx = indexer.build_index(spark, indexer.clean_docs(docs))
    indexer.write_index(idx, "/tmp/msengines_bench/idx_pl_classic")
    wall = time.time() - t0
    spark.stop()
    return round(wall, 3)


def pipelined(cores: int, tag: str, n_segments: int) -> float:
    from modernsearchengines_spark.operators import checkpoint, indexer

    spark = _session(f"pipe-{tag}", cores)
    docs = spark.read.parquet(CORPUS)
    from pyspark.sql import functions as F

    docs.agg(F.sum(F.length("text"))).collect()
    t0 = time.time()
    checkpoint.build_index_pipelined(
        spark,
        indexer.clean_docs(docs),
        "/tmp/msengines_bench/idx_pl_piped",
        n_segments=n_segments,
    )
    wall = time.time() - t0
    spark.stop()
    return round(wall, 3)


if __name__ == "__main__":
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_segments = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    res = {"cores": cores, "n_segments": n_segments, "classic": [], "pipelined": []}
    for r in range(rounds):
        res["classic"].append(classic(cores, str(r)))
        res["pipelined"].append(pipelined(cores, str(r), n_segments))
    print("RESULT " + json.dumps(res))
