"""Temporal analytics, end to end: the time-join operators composed over
the events table the way a clickstream job actually chains them.

    raw events
      -> sessionize          (30-min-gap sessions per user)
      -> as-of enrich        (attach each event's latest prior purchase)
      -> range-join windows  (count activity inside high-value windows)
      -> hourly rollup       (the batch twin of the streaming query)

Each stage is one keyed shuffle (sessionization window, as-of union
window, bucketed interval equi-join, hash agg) — no nested-loop time
joins anywhere; the same composition runs unchanged on a cluster.

Run:  python3 examples/temporal_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lmdiskann_jl_spark.operators.asof import asof_join
from lmdiskann_jl_spark.operators.rangejoin import range_join
from lmdiskann_jl_spark.operators.sessionize import sessionize
from lmdiskann_jl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="temporal-demo", master="local[8]", shuffle_partitions=8)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev = ev.select(
        "event_id", "user_id", "event_type", "value",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
    ).cache()

    # 1. sessionize: 30-min inactivity gap; chunk_span engages the hot-key
    # guard (identical output, bounded per-task input on skewed users)
    sess = sessionize(
        ev, "user_id", "sec", gap=1800, order_col="event_id", chunk_span=86_400
    )
    print("sessions per user (top 5):")
    sess.groupBy("user_id").agg(
        (F.max("session_no") + 1).alias("n_sessions")
    ).orderBy(F.desc("n_sessions"), "user_id").show(5)

    # 2. as-of enrich: each event carries the same user's latest prior purchase
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("sec").alias("p_sec"), F.col("value").alias("last_purchase_value")
    )
    enriched = asof_join(
        ev.filter(F.col("event_type") != "purchase"),
        purchases.withColumnRenamed("user_id", "user_id"),
        key_col="user_id", left_time="sec", right_time="p_sec",
        payload_cols=["last_purchase_value"],
    )
    print("events with a prior purchase attached:",
          enriched.filter(F.col("last_purchase_value").isNotNull()).count())

    # 3. range join: activity inside each high-value purchase's next hour
    windows = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
        .select(F.col("event_id").alias("window_id"), F.col("sec").alias("lo"))
        .withColumn("hi", F.col("lo") + 3600)
    )
    inside = range_join(
        ev.select(F.col("event_id").alias("pt_id"), "sec", "value"),
        windows, "sec", "lo", "hi", bucket_width=3600,
    )
    print("high-value windows by contained activity (top 5):")
    inside.groupBy("window_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")
    ).orderBy(F.desc("n_events"), "window_id").show(5)

    # 4. hourly rollup — identical logic to streaming/ingest's watermarked twin
    print("hourly event volume (top 5 hours):")
    ev.groupBy((F.floor(F.col("sec") / 3600) * 3600).alias("bucket")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    ).orderBy(F.desc("n"), "bucket").show(5)


if __name__ == "__main__":
    main()
