"""Nexmark queries THROUGH THE MV RUNTIME — the reference runs its
Nexmark suite as materialized views (`e2e_test/streaming/nexmark/` —
every query is a `CREATE MATERIALIZED VIEW` in `create_views.slt.part`)
and asserts MV-vs-batch snapshot equivalence
(`e2e_test/streaming/nexmark_snapshot.slt`). The batch analogs in
`nexmark.py` / `nexmark2.py` prove the QUERY SHAPES; this module proves
the STREAMING ENGINE: each query here compiles through
`Engine.sql("CREATE MATERIALIZED VIEW ...")` (frontend.py →
MaterializedView / RetractableStreamJoin), folds the bid stream in as
changelog batches (multi-round INSERTs, then DELETEs exercising
retraction), and returns the incrementally-maintained MV. The DuckDB
oracle is the BATCH TWIN over the surviving rows — the driver's
hash-compare IS the snapshot-equivalence gate.

Bid mapping (same convention as nexmark2.py): auction ≙ event_id%1000
(clicks skew onto 0..99), bidder ≙ user_id, price ≙ value,
channel ≙ event_type. Streams fold in 2 rounds split on event_id parity;
`event_id % 13 = 0` rows are then DELETED (the retraction pass).

Scale posture: every MV here maintains with the O(touched-buckets) fold
loop of streaming/mv.py — per-batch cost is bounded by the batch's
groups/keys, never the MV size; the SQL front door plans each recompute
declaratively so Catalyst picks the physical strategy per batch.
"""

from __future__ import annotations

import tempfile

from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import tables

# DuckDB view over the SURVIVING bid rows (post-DELETE state) — the
# batch twin every MV below must hash-match.
SURV_BIDS = (
    "(SELECT event_id, "
    "CASE WHEN event_type = 'click' THEN event_id % 100 "
    "ELSE event_id % 1000 END AS auction, "
    "user_id AS bidder, value AS price, event_type AS channel, "
    "CAST(ts AS TIMESTAMP) AS ts "
    "FROM events WHERE event_id % 13 <> 0)"
)


def _bid_engine(spark, sf_dir, prefix: str, ddl: str):
    """Engine with a `bid` table + the query's MVs (created BEFORE any
    data so every row arrives incrementally), bid stream folded in two
    changelog rounds, then the `% 13` retraction round."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)  # registers the `events` temp view
    eng = Engine(spark, tempfile.mkdtemp(prefix=prefix))
    eng.sql(
        """
        CREATE TABLE bid (
            event_id int8 PRIMARY KEY, auction int8, bidder int8,
            price float8, channel text, ts timestamp
        )
        """
    )
    eng.sql(ddl)
    sel = (
        "SELECT event_id, CASE WHEN event_type = 'click' THEN event_id % 100 "
        "ELSE event_id % 1000 END, user_id, value, event_type, ts FROM events"
    )
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 0")
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 1")
    eng.sql("DELETE FROM bid WHERE event_id % 13 = 0")
    return eng


@register(
    "nexmark_mv_q1_currency",
    oracle=f"""
SELECT event_id, bidder, auction, round(price * 0.908, 4) AS price_dkk
FROM {SURV_BIDS} b ORDER BY event_id
""",
)
def nexmark_mv_q1_currency(spark, sf_dir):
    """Nexmark q1 as a ROW-GRAIN MV (reference
    `nexmark/create_views.slt.part` q1: currency conversion — a stateless
    Project the reference still materializes): every insert/delete of the
    bid stream flows through the projection into the MV; the final MV
    equals the batch projection over survivors."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv1_",
        """
        CREATE MATERIALIZED VIEW nx_q1 AS
        SELECT event_id, bidder, auction, round(price * 0.908, 4) AS price_dkk
        FROM bid
        """,
    )
    return eng.sql("SELECT event_id, bidder, auction, price_dkk FROM nx_q1 ORDER BY event_id")


@register(
    "nexmark_mv_q2_filter",
    oracle=f"""
SELECT auction, price FROM {SURV_BIDS} b
WHERE auction % 123 = 0 ORDER BY auction, price
""",
)
def nexmark_mv_q2_filter(spark, sf_dir):
    """Nexmark q2 as a row-grain filtered MV (`q2.slt.part`: bids on a
    fixed auction set): the WHERE runs inside the per-batch recompute, so
    deleted rows retract out of the MV."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv2_",
        """
        CREATE MATERIALIZED VIEW nx_q2 AS
        SELECT event_id, auction, price FROM bid WHERE auction % 123 = 0
        """,
    )
    return eng.sql("SELECT auction, price FROM nx_q2 ORDER BY auction, price")


@register(
    "nexmark_mv_q3_join",
    oracle=f"""
SELECT b.event_id, c.c_name, c.c_mktsegment
FROM {SURV_BIDS} b
JOIN (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c ON b.bidder = c.c_custkey
WHERE b.channel = 'click' AND c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
ORDER BY b.event_id
""",
)
def nexmark_mv_q3_join(spark, sf_dir):
    """Nexmark q3 as a STREAM-STREAM JOIN MV (`q3.slt.part`: auction ⋈
    person with filters on both sides — the canonical incremental-join
    benchmark): both inputs are engine tables (changelogs), compiled onto
    RetractableStreamJoin through the SQL front door; deletes on EITHER
    side retract join rows."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_nxmv3_"))
    eng.sql(
        """
        CREATE TABLE bid (
            event_id int8 PRIMARY KEY, auction int8, bidder int8,
            price float8, channel text, ts timestamp
        );
        CREATE TABLE person (c_custkey int8 PRIMARY KEY, c_name text, c_mktsegment text);
        CREATE MATERIALIZED VIEW nx_q3 AS
        SELECT b.event_id, p.c_name, p.c_mktsegment
        FROM bid b JOIN person p ON b.bidder = p.c_custkey
        WHERE b.channel = 'click' AND p.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        """
    )
    sel = (
        "SELECT event_id, CASE WHEN event_type = 'click' THEN event_id % 100 "
        "ELSE event_id % 1000 END, user_id, value, event_type, ts FROM events"
    )
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 0")
    eng.sql("INSERT INTO person SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 2 = 0")
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 1")
    eng.sql("INSERT INTO person SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 2 = 1")
    eng.sql("DELETE FROM bid WHERE event_id % 13 = 0")
    eng.sql("DELETE FROM person WHERE c_custkey % 3 = 0")
    return eng.sql("SELECT event_id, c_name, c_mktsegment FROM nx_q3 ORDER BY event_id")


@register(
    "nexmark_mv_q4_avg_final",
    oracle=f"""
WITH winning AS (
  SELECT channel, bidder, max(price) AS final_price
  FROM {SURV_BIDS} b GROUP BY channel, bidder
)
SELECT channel,
       round((CAST(sum(CAST(round(final_price*10000,0) AS BIGINT)) AS BIGINT)/10000.0)
             / count(*), 4) AS avg_final
FROM winning GROUP BY channel ORDER BY channel
""",
)
def nexmark_mv_q4_avg_final(spark, sf_dir):
    """Nexmark q4 as STACKED MVs — MV-on-MV (`q4.slt.part` is exactly
    this: an inner max-per-(category,item) view feeding an outer
    avg-per-category view; reference mv-on-mv.md): the inner MV's
    per-batch changelog (−1/+1 update pairs, composite group key) feeds
    the outer MV's fold, so a retraction that changes a max propagates
    through BOTH levels."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv4_",
        """
        CREATE MATERIALIZED VIEW nx_q4_win AS
        SELECT channel, bidder, max(price) AS final_price
        FROM bid GROUP BY channel, bidder
        """,
    )
    eng.sql(
        """
        CREATE MATERIALIZED VIEW nx_q4 AS
        SELECT channel,
               round((sum(CAST(round(final_price*10000,0) AS BIGINT))/10000.0D)
                     / count(*), 4) AS avg_final
        FROM nx_q4_win GROUP BY channel
        """
    )
    return eng.sql("SELECT channel, avg_final FROM nx_q4 ORDER BY channel")


@register(
    "nexmark_mv_q5_hot",
    oracle=f"""
WITH counts AS (
  SELECT date_trunc('hour', ts) AS ws, bidder, count(*) AS n
  FROM {SURV_BIDS} b GROUP BY ws, bidder
)
SELECT ws, bidder, n FROM (
  SELECT ws, bidder, n,
         row_number() OVER (PARTITION BY ws ORDER BY n DESC, bidder) AS rk
  FROM counts) r
WHERE rk = 1 ORDER BY ws
""",
)
def nexmark_mv_q5_hot(spark, sf_dir):
    """Nexmark q5 (hot items, `q5.slt.part`) with the HEAVY level — the
    per-(window, bidder) count — maintained as an MV with a DERIVED
    group key (date_trunc window bucket), and the top-1 rank read off
    the maintained counts (the reference splits q5 the same way: a
    windowed-count view under a TopN view)."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv5_",
        """
        CREATE MATERIALIZED VIEW nx_q5_counts AS
        SELECT date_trunc('hour', ts) AS ws, bidder, count(*) AS n
        FROM bid GROUP BY date_trunc('hour', ts), bidder
        """,
    )
    return eng.sql(
        """
        SELECT ws, bidder, n FROM (
          SELECT ws, bidder, n,
                 row_number() OVER (PARTITION BY ws ORDER BY n DESC, bidder) AS rk
          FROM nx_q5_counts) r
        WHERE rk = 1 ORDER BY ws
        """
    )


@register(
    "nexmark_mv_q7_max_bid",
    oracle=f"""
SELECT date_trunc('hour', ts) AS ws, max(price) AS max_price, count(*) AS n_bids
FROM {SURV_BIDS} b GROUP BY ws ORDER BY ws
""",
)
def nexmark_mv_q7_max_bid(spark, sf_dir):
    """Nexmark q7 (highest bid per window, `q7.slt.part`) as an MV with a
    derived tumble-bucket key: retractable max per window (deleting the
    current max row re-resolves the group from state — the reference's
    MaterializedInput max agg)."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv7_",
        """
        CREATE MATERIALIZED VIEW nx_q7 AS
        SELECT date_trunc('hour', ts) AS ws, max(price) AS max_price,
               count(*) AS n_bids
        FROM bid GROUP BY date_trunc('hour', ts)
        """,
    )
    return eng.sql("SELECT ws, max_price, n_bids FROM nx_q7 ORDER BY ws")


@register(
    "nexmark_mv_q9_winning_bid",
    oracle=f"""
SELECT auction,
       CAST(max(CAST(round(price*10000,0) AS BIGINT)*10000000 + event_id)
            % 10000000 AS BIGINT) AS win_event,
       CAST(max(CAST(round(price*10000,0) AS BIGINT)*10000000 + event_id)
            // 10000000 AS BIGINT) AS win_price_scaled
FROM {SURV_BIDS} b GROUP BY auction ORDER BY auction
""",
)
def nexmark_mv_q9_winning_bid(spark, sf_dir):
    """Nexmark q9 (winning bid per auction, `q9.slt.part` — rank-1 by
    price with a deterministic tiebreak) as an MV: the rank collapses to
    a retractable MAX over the (scaled price, event_id) composite packed
    into one int64 — ties break toward the larger event id in BOTH
    engines, and the arg-max decodes at read."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv9_",
        """
        CREATE MATERIALIZED VIEW nx_q9 AS
        SELECT auction,
               max(CAST(round(price*10000,0) AS BIGINT)*10000000 + event_id) AS wk
        FROM bid GROUP BY auction
        """,
    )
    return eng.sql(
        """
        SELECT auction, CAST(wk % 10000000 AS BIGINT) AS win_event,
               CAST(wk DIV 10000000 AS BIGINT) AS win_price_scaled
        FROM nx_q9 ORDER BY auction
        """
    )


@register(
    "nexmark_mv_q101_max_bid",
    oracle=f"""
SELECT a.auction_id, a.item_name, max(b.price) AS current_highest_bid
FROM (SELECT i AS auction_id, 'item-' || i AS item_name FROM range(1200) t(i)) a
LEFT JOIN {SURV_BIDS} b ON a.auction_id = b.auction
GROUP BY a.auction_id, a.item_name ORDER BY a.auction_id
""",
)
def nexmark_mv_q101_max_bid(spark, sf_dir):
    """Nexmark q101 (`views/q101.slt.part`: every auction with its
    current highest bid, NULL if none) as a stream-stream LEFT OUTER
    join MV + group agg: the auction dimension and the bid stream are
    BOTH engine tables; a bid delete that empties an auction flips its
    row back to NULL (outer-join retraction through the changelog)."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_nxmv101_"))
    eng.sql(
        """
        CREATE TABLE auction (auction_id int8 PRIMARY KEY, item_name text);
        CREATE TABLE bid (
            event_id int8 PRIMARY KEY, auction int8, bidder int8,
            price float8, channel text, ts timestamp
        );
        CREATE MATERIALIZED VIEW nx_q101 AS
        SELECT a.auction_id, a.item_name, max(b.price) AS current_highest_bid
        FROM auction a LEFT JOIN bid b ON a.auction_id = b.auction
        GROUP BY a.auction_id, a.item_name
        """
    )
    eng.sql("INSERT INTO auction SELECT id, concat('item-', id) FROM range(1200)")
    sel = (
        "SELECT event_id, CASE WHEN event_type = 'click' THEN event_id % 100 "
        "ELSE event_id % 1000 END, user_id, value, event_type, ts FROM events"
    )
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 0")
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 1")
    eng.sql("DELETE FROM bid WHERE event_id % 13 = 0")
    return eng.sql(
        "SELECT auction_id, item_name, current_highest_bid FROM nx_q101 ORDER BY auction_id"
    )


@register(
    "nexmark_mv_q103_popular",
    oracle=f"""
SELECT a.auction_id, a.item_name, count(*) AS bid_count
FROM (SELECT i AS auction_id, 'item-' || i AS item_name FROM range(1200) t(i)) a
JOIN {SURV_BIDS} b ON a.auction_id = b.auction
GROUP BY a.auction_id, a.item_name HAVING count(*) >= 12
ORDER BY a.auction_id
""",
)
def nexmark_mv_q103_popular(spark, sf_dir):
    """Nexmark q103 (`views/q103.slt.part`: popular auctions — bid count
    over a threshold) as a stream-join MV with HAVING: groups crossing
    the threshold appear in the MV, groups whose deletes drop them back
    under it retract out (the HAVING runs inside every per-batch
    recompute)."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix="rw_nxmv103_"))
    eng.sql(
        """
        CREATE TABLE auction (auction_id int8 PRIMARY KEY, item_name text);
        CREATE TABLE bid (
            event_id int8 PRIMARY KEY, auction int8, bidder int8,
            price float8, channel text, ts timestamp
        );
        CREATE MATERIALIZED VIEW nx_q103 AS
        SELECT a.auction_id, a.item_name, count(*) AS bid_count
        FROM auction a JOIN bid b ON a.auction_id = b.auction
        GROUP BY a.auction_id, a.item_name HAVING count(*) >= 12
        """
    )
    eng.sql("INSERT INTO auction SELECT id, concat('item-', id) FROM range(1200)")
    sel = (
        "SELECT event_id, CASE WHEN event_type = 'click' THEN event_id % 100 "
        "ELSE event_id % 1000 END, user_id, value, event_type, ts FROM events"
    )
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 0")
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 1")
    eng.sql("DELETE FROM bid WHERE event_id % 13 = 0")
    return eng.sql(
        "SELECT auction_id, item_name, bid_count FROM nx_q103 ORDER BY auction_id"
    )


@register(
    "nexmark_mv_q105_top",
    oracle=f"""
SELECT auction, count(*) AS bid_count
FROM {SURV_BIDS} b GROUP BY auction
ORDER BY bid_count DESC, auction LIMIT 100
""",
)
def nexmark_mv_q105_top(spark, sf_dir):
    """Nexmark q105 (`views/q105.slt.part`: top auctions by bid count) —
    the count level maintained as an MV, the top-100 read as a TopN over
    the maintained counts (TakeOrderedAndProject, not a full sort)."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv105_",
        """
        CREATE MATERIALIZED VIEW nx_q105 AS
        SELECT auction, count(*) AS bid_count FROM bid GROUP BY auction
        """,
    )
    return eng.sql(
        "SELECT auction, bid_count FROM nx_q105 ORDER BY bid_count DESC, auction LIMIT 100"
    )


@register(
    "nexmark_mv_q14_calc",
    oracle=f"""
SELECT event_id, auction, bidder, price * 0.908 AS price_eur,
  CASE WHEN extract(hour FROM ts) >= 8 AND extract(hour FROM ts) <= 18 THEN 'dayTime'
       WHEN extract(hour FROM ts) <= 6 OR extract(hour FROM ts) >= 20 THEN 'nightTime'
       ELSE 'otherTime' END AS bid_time_type,
  ts
FROM {SURV_BIDS} b WHERE price * 0.908 > 100
ORDER BY event_id
""",
)
def nexmark_mv_q14_calc(spark, sf_dir):
    """Nexmark q14 through the MV runtime (reference
    `e2e_test/streaming/nexmark/views/q14.slt.part`): a row-grain
    expression+filter MV — currency conversion and the day/night CASE
    maintain per batch, deletes retract their rows exactly."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv14_",
        """
        CREATE MATERIALIZED VIEW nx_q14 AS
        SELECT event_id AS event_id, auction AS auction, bidder AS bidder,
               price * 0.908 AS price_eur,
               CASE WHEN extract(hour FROM ts) >= 8 AND extract(hour FROM ts) <= 18 THEN 'dayTime'
                    WHEN extract(hour FROM ts) <= 6 OR extract(hour FROM ts) >= 20 THEN 'nightTime'
                    ELSE 'otherTime' END AS bid_time_type,
               ts AS ts
        FROM bid WHERE price * 0.908 > 100
        """,
    )
    return eng.sql(
        "SELECT event_id, auction, bidder, price_eur, bid_time_type, ts "
        "FROM nx_q14 ORDER BY event_id"
    )


@register(
    "nexmark_mv_q15_bid_stats",
    oracle=f"""
SELECT strftime(ts, '%Y-%m-%d') AS dt,
       count(*) AS total_bids,
       count(*) FILTER (WHERE price < 20) AS rank1_bids,
       count(*) FILTER (WHERE price >= 20 AND price < 100) AS rank2_bids,
       count(DISTINCT bidder) AS total_bidders,
       count(DISTINCT bidder) FILTER (WHERE price >= 100) AS rank3_bidders,
       count(DISTINCT auction) AS total_auctions
FROM {SURV_BIDS} b GROUP BY dt ORDER BY dt
""",
)
def nexmark_mv_q15_bid_stats(spark, sf_dir):
    """Nexmark q15 through the MV runtime (reference
    `views/q15.slt.part`; distinct-dedup state `aggregation/distinct.rs`):
    per-day banded counts mixing FILTER clauses with DISTINCT columns,
    grouped by a DERIVED key (the date expression) — the key_of
    annotation path — maintained under inserts and retraction."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv15_",
        """
        CREATE MATERIALIZED VIEW nx_q15 AS
        SELECT date_format(ts, 'yyyy-MM-dd') AS dt,
               count(*) AS total_bids,
               count(*) FILTER (WHERE price < 20) AS rank1_bids,
               count(*) FILTER (WHERE price >= 20 AND price < 100) AS rank2_bids,
               count(DISTINCT bidder) AS total_bidders,
               count(DISTINCT bidder) FILTER (WHERE price >= 100) AS rank3_bidders,
               count(DISTINCT auction) AS total_auctions
        FROM bid GROUP BY date_format(ts, 'yyyy-MM-dd')
        """,
    )
    return eng.sql(
        "SELECT dt, total_bids, rank1_bids, rank2_bids, total_bidders, "
        "rank3_bidders, total_auctions FROM nx_q15 ORDER BY dt"
    )


@register(
    "nexmark_mv_q18_last_bid",
    oracle=f"""
SELECT auction, bidder, price, channel, ts FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY bidder, auction ORDER BY ts DESC, price DESC, event_id DESC) AS rn
  FROM {SURV_BIDS} b) s WHERE rn <= 1
ORDER BY auction, bidder
""",
)
def nexmark_mv_q18_last_bid(spark, sf_dir):
    """Nexmark q18 through the MV runtime, spelled as the reference's
    DISTINCT ON plan (`views/q18.slt.part` keeps each bidder's latest
    bid per auction): the DISTINCT ON MV re-elects the next-latest bid
    when a DELETE removes the current winner — streaming
    dedup-keep-last with retraction."""
    eng = _bid_engine(
        spark,
        sf_dir,
        "rw_nxmv18_",
        """
        CREATE MATERIALIZED VIEW nx_q18 AS
        SELECT DISTINCT ON (bidder, auction)
               auction AS auction, bidder AS bidder, price AS price,
               channel AS channel, ts AS ts
        FROM bid
        ORDER BY bidder, auction, ts DESC, price DESC, event_id DESC
        """,
    )
    return eng.sql(
        "SELECT auction, bidder, price, channel, ts FROM nx_q18 "
        "ORDER BY auction, bidder"
    )
