#!/usr/bin/env python
"""Capture .explain('formatted') + executed-job counts for the headline
queries (guide §1: measure first). Usage: python plans/r13/capture.py
<before|after> [query ...] — writes plans/r13/<query>_<tag>.txt.

Job count comes from the DAGScheduler's nextJobId counter sampled around
the query function + count(): for the MV/streaming-fold queries the plan
of the returned DataFrame is just a state scan, so the number of Spark
jobs the fold path launches IS the measurement that matters there.
"""

from __future__ import annotations

import io
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, ROOT)

from risingwave_spark.queries import QUERIES  # noqa: E402
from risingwave_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q9", "tpch_q18", "tpch_q21",
    "win_group_topn", "ev_hop_agg", "ev_asof_join", "ev_session_agg",
    "llm_minhash_lsh", "llm_cosine_topk", "llm_token_stats",
    "stream_mv_incremental", "nexmark_q5_hot_items", "stream_stream_join",
    "stream_eowc_tumble", "udf_grouped_agg", "mm_decode_meta",
    "tpch_q8", "tpch_q11", "llm_ann_lsh", "llm_jaccard_neardup",
    "stream_over_window",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sc = spark.sparkContext
    next_job = lambda: sc._jsc.sc().dagScheduler().nextJobId()  # noqa: E731
    # warm (JVM + catalog listing) so job counts are steady-state
    QUERIES["tpch_q6"](spark, sf_dir).collect()

    for name in names:
        sc.setJobDescription(name)
        j0, t0 = next_job(), time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        dt, j1 = time.perf_counter() - t0, next_job()
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = old
        out = os.path.join(HERE, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(
                f"# {name} ({tag}) — rows={n} wall={dt:.3f}s "
                f"spark_jobs={j1 - j0} (incl. count())\n\n"
            )
            f.write(buf.getvalue())
        print(f"{name}: jobs={j1 - j0} wall={dt:.3f}s -> {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
