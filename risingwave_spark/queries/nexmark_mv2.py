"""Nexmark MV suite, part 2 — the remaining view analogs of the
reference's `e2e_test/streaming/nexmark/views/` (q0, q8, q10, q16, q17,
q19-q22, q102, q104, q106), completing the family started in
`nexmark_mv.py`. Same protocol: every query compiles through
`Engine.sql("CREATE MATERIALIZED VIEW ...")`, streams fold as changelog
batches with retraction rounds, and the DuckDB oracle is the batch twin
over the surviving rows.

Bid mapping (same as nexmark_mv.py): auction ≙ event_id%1000 (clicks
skew to 0..99), bidder ≙ user_id, price ≙ value, channel ≙ event_type,
plus a SYNTHETIC url column for the url-parsing queries
(`https://www.nexmark.com/page/<channel>/item?channel_id=<id%7>`).
The auction dimension is the deterministic range(1200) table of
q101/q103, extended with category / date_time / expires so the
interval-join queries (q20, q106) have real residual conditions.
"""

from __future__ import annotations

import tempfile

from risingwave_spark.queries.nexmark_mv import SURV_BIDS
from risingwave_spark.queries.registry import register
from risingwave_spark.queries.util import tables

# DuckDB twins ------------------------------------------------------
_URL = ("'https://www.nexmark.com/page/' || event_type || "
        "'/item?channel_id=' || CAST(event_id % 7 AS VARCHAR)")
SURV_BIDS_URL = (
    "(SELECT event_id, "
    "CASE WHEN event_type = 'click' THEN event_id % 100 "
    "ELSE event_id % 1000 END AS auction, "
    "user_id AS bidder, value AS price, event_type AS channel, "
    f"CAST(ts AS TIMESTAMP) AS ts, {_URL} AS url "
    "FROM events WHERE event_id % 13 <> 0)"
)
AUCTION_DIM = (
    "(SELECT i AS auction_id, 'item-' || i AS item_name, "
    "CAST(i % 12 AS BIGINT) AS category, "
    "TIMESTAMP '2024-01-01 00:00:00' + (i % 30) * INTERVAL 1 DAY AS a_ts, "
    "TIMESTAMP '2024-01-01 00:00:00' + ((i % 30) + 20) * INTERVAL 1 DAY AS expires "
    "FROM range(1200) t(i) WHERE i % 11 <> 0)"
)

_SEL_BID = (
    "SELECT event_id, CASE WHEN event_type = 'click' THEN event_id % 100 "
    "ELSE event_id % 1000 END, user_id, value, event_type, ts FROM events"
)
_SEL_BID_URL = (
    "SELECT event_id, CASE WHEN event_type = 'click' THEN event_id % 100 "
    "ELSE event_id % 1000 END, user_id, value, event_type, ts, "
    "concat('https://www.nexmark.com/page/', event_type, "
    "'/item?channel_id=', CAST(event_id % 7 AS STRING)) AS url FROM events"
)
_SEL_AUCTION = (
    "SELECT id, concat('item-', id), id % 12, "
    "timestampadd(DAY, CAST(id % 30 AS INT), timestamp'2024-01-01 00:00:00'), "
    "timestampadd(DAY, CAST(id % 30 AS INT) + 20, timestamp'2024-01-01 00:00:00') "
    "FROM range(1200)"
)

_BID_DDL = """
CREATE TABLE bid (
    event_id int8 PRIMARY KEY, auction int8, bidder int8,
    price float8, channel text, ts timestamp
)
"""
_BID_URL_DDL = """
CREATE TABLE bid (
    event_id int8 PRIMARY KEY, auction int8, bidder int8,
    price float8, channel text, ts timestamp, url text
)
"""
_AUCTION_DDL = """
CREATE TABLE auction (
    auction_id int8 PRIMARY KEY, item_name text, category int8,
    a_ts timestamp, expires timestamp
)
"""


def _engine(spark, sf_dir, prefix: str, ddl: str, *, url: bool = False,
            auction: bool = False):
    """Engine with the bid stream (and optionally the auction dim), the
    query's MVs created BEFORE any data, two insert rounds, then the
    retraction rounds (`bid % 13`, `auction % 11`)."""
    from risingwave_spark.api import Engine

    tables(spark, sf_dir)
    eng = Engine(spark, tempfile.mkdtemp(prefix=prefix))
    eng.sql(_BID_URL_DDL if url else _BID_DDL)
    if auction:
        eng.sql(_AUCTION_DDL)
    eng.sql(ddl)
    if auction:
        eng.sql(f"INSERT INTO auction {_SEL_AUCTION}")
    sel = _SEL_BID_URL if url else _SEL_BID
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 0")
    eng.sql(f"INSERT INTO bid {sel} WHERE event_id % 2 = 1")
    eng.sql("DELETE FROM bid WHERE event_id % 13 = 0")
    if auction:
        eng.sql("DELETE FROM auction WHERE auction_id % 11 = 0")
    return eng


@register(
    "nexmark_mv_q0_passthrough",
    oracle=f"""
SELECT auction, bidder, price, ts FROM {SURV_BIDS} b ORDER BY event_id
""",
)
def nexmark_mv_q0_passthrough(spark, sf_dir):
    """Nexmark q0 (reference `views/q0.slt.part`: the pass-through view
    the reference still materializes): every insert/delete flows to the
    MV unchanged — the Materialize-executor identity case."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv0_",
        """
        CREATE MATERIALIZED VIEW nx_q0 AS
        SELECT event_id, auction, bidder, price, ts FROM bid
        """,
    )
    return eng.sql("SELECT auction, bidder, price, ts FROM nx_q0 ORDER BY event_id")


@register(
    "nexmark_mv_q8_window_join",
    oracle=f"""
SELECT p.bidder AS id, p.ws AS starttime, a.n_sells
FROM (SELECT bidder, date_trunc('day', ts) AS ws, count(*) AS n_bids
      FROM {SURV_BIDS} b GROUP BY bidder, ws) p
JOIN (SELECT bidder AS seller, date_trunc('day', ts) AS ws2, count(*) AS n_sells
      FROM {SURV_BIDS} b WHERE auction % 2 = 0 GROUP BY seller, ws2) a
  ON p.bidder = a.seller AND p.ws = a.ws2
ORDER BY id, starttime
""",
)
def nexmark_mv_q8_window_join(spark, sf_dir):
    """Nexmark q8 (reference `views/q8.slt.part`: join of two WINDOWED
    aggregations over separate streams) — both tumble-bucketed aggs
    maintain as keyed MVs and the join consumes their Update-pair
    changelogs (MV-as-join-input on BOTH sides), the windowed
    stream-stream join shape."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv8_",
        """
        CREATE MATERIALIZED VIEW nx_q8p AS
        SELECT bidder, date_trunc('day', ts) AS ws, count(*) AS n_bids
        FROM bid GROUP BY bidder, ws;
        CREATE MATERIALIZED VIEW nx_q8a AS
        SELECT bidder AS seller, date_trunc('day', ts) AS ws2, count(*) AS n_sells
        FROM bid WHERE auction % 2 = 0 GROUP BY seller, ws2;
        CREATE MATERIALIZED VIEW nx_q8 AS
        SELECT p.bidder, p.ws, a.n_sells
        FROM nx_q8p p JOIN nx_q8a a ON p.bidder = a.seller AND p.ws = a.ws2
        """,
    )
    return eng.sql(
        "SELECT bidder AS id, ws AS starttime, n_sells FROM nx_q8 "
        "ORDER BY id, starttime"
    )


@register(
    "nexmark_mv_q10_log",
    oracle=f"""
SELECT auction, bidder, price, ts,
       strftime(ts, '%Y-%m-%d') AS dt, strftime(ts, '%H:%M') AS tm
FROM {SURV_BIDS} b ORDER BY event_id
""",
)
def nexmark_mv_q10_log(spark, sf_dir):
    """Nexmark q10 (reference `views/q10.slt.part`: log-format
    projection with TO_CHAR date/time parts) as a row-grain MV."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv10_",
        """
        CREATE MATERIALIZED VIEW nx_q10 AS
        SELECT event_id, auction, bidder, price, ts,
               date_format(ts, 'yyyy-MM-dd') AS dt,
               date_format(ts, 'HH:mm') AS tm
        FROM bid
        """,
    )
    return eng.sql(
        "SELECT auction, bidder, price, ts, dt, tm FROM nx_q10 ORDER BY event_id"
    )


@register(
    "nexmark_mv_q16_channel_stats",
    oracle=f"""
SELECT channel, strftime(ts, '%Y-%m-%d') AS dt,
       max(strftime(ts, '%H:%M')) AS max_minute,
       count(*) AS total_bids,
       count(*) FILTER (WHERE price < 20) AS rank1_bids,
       count(*) FILTER (WHERE price >= 20 AND price < 100) AS rank2_bids,
       count(*) FILTER (WHERE price >= 100) AS rank3_bids,
       count(DISTINCT bidder) AS total_bidders,
       count(DISTINCT bidder) FILTER (WHERE price < 20) AS rank1_bidders,
       count(DISTINCT auction) AS total_auctions,
       count(DISTINCT auction) FILTER (WHERE price >= 100) AS rank3_auctions
FROM {SURV_BIDS} b GROUP BY channel, dt ORDER BY channel, dt
""",
)
def nexmark_mv_q16_channel_stats(spark, sf_dir):
    """Nexmark q16 (reference `views/q16.slt.part`: per-channel/day
    banded stats mixing FILTER, DISTINCT and a MAX over a derived
    string) through the MV runtime with retraction."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv16_",
        """
        CREATE MATERIALIZED VIEW nx_q16 AS
        SELECT channel, date_format(ts, 'yyyy-MM-dd') AS dt,
               max(date_format(ts, 'HH:mm')) AS max_minute,
               count(*) AS total_bids,
               count(*) FILTER (WHERE price < 20) AS rank1_bids,
               count(*) FILTER (WHERE price >= 20 AND price < 100) AS rank2_bids,
               count(*) FILTER (WHERE price >= 100) AS rank3_bids,
               count(DISTINCT bidder) AS total_bidders,
               count(DISTINCT bidder) FILTER (WHERE price < 20) AS rank1_bidders,
               count(DISTINCT auction) AS total_auctions,
               count(DISTINCT auction) FILTER (WHERE price >= 100) AS rank3_auctions
        FROM bid GROUP BY channel, date_format(ts, 'yyyy-MM-dd')
        """,
    )
    return eng.sql(
        "SELECT channel, dt, max_minute, total_bids, rank1_bids, rank2_bids, "
        "rank3_bids, total_bidders, rank1_bidders, total_auctions, "
        "rank3_auctions FROM nx_q16 ORDER BY channel, dt"
    )


@register(
    "nexmark_mv_q17_auction_stats",
    oracle=f"""
SELECT auction, strftime(ts, '%Y-%m-%d') AS dt,
       count(*) AS total_bids,
       count(*) FILTER (WHERE price < 20) AS rank1_bids,
       min(price) AS min_price, max(price) AS max_price,
       round((CAST(sum(CAST(round(price*10000,0) AS BIGINT)) AS BIGINT)/10000.0)
             / count(*), 4) AS avg_price,
       (CAST(sum(CAST(round(price*100,0) AS BIGINT)) AS BIGINT)/100.0) AS sum_price
FROM {SURV_BIDS} b GROUP BY auction, dt ORDER BY auction, dt
""",
)
def nexmark_mv_q17_auction_stats(spark, sf_dir):
    """Nexmark q17 (reference `views/q17.slt.part`: per-auction/day
    min/max/avg/sum + banded counts) with exact-cents sums so
    retraction keeps the floats deterministic."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv17_",
        """
        CREATE MATERIALIZED VIEW nx_q17 AS
        SELECT auction, date_format(ts, 'yyyy-MM-dd') AS dt,
               count(*) AS total_bids,
               count(*) FILTER (WHERE price < 20) AS rank1_bids,
               min(price) AS min_price, max(price) AS max_price,
               round((sum(CAST(round(price*10000,0) AS BIGINT))/10000.0D)
                     / count(*), 4) AS avg_price,
               sum(CAST(round(price*100,0) AS BIGINT))/100.0D AS sum_price
        FROM bid GROUP BY auction, date_format(ts, 'yyyy-MM-dd')
        """,
    )
    return eng.sql(
        "SELECT auction, dt, total_bids, rank1_bids, min_price, max_price, "
        "avg_price, sum_price FROM nx_q17 ORDER BY auction, dt"
    )


@register(
    "nexmark_mv_q19_top10_per_auction",
    oracle=f"""
SELECT auction, price, rank_number FROM (
  SELECT auction, price,
         ROW_NUMBER() OVER (PARTITION BY auction
                            ORDER BY price DESC, event_id) AS rank_number
  FROM {SURV_BIDS} b) t
WHERE rank_number <= 10 ORDER BY auction, rank_number
""",
)
def nexmark_mv_q19_top10_per_auction(spark, sf_dir):
    """Nexmark q19 (reference `views/q19.slt.part`: top-10 bids per
    auction as a rank-filtered subquery) → StreamGroupTopN: deletes of
    current top rows re-elect the next-best from state."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv19_",
        """
        CREATE MATERIALIZED VIEW nx_q19 AS
        SELECT auction, price, rank_number FROM (
          SELECT auction, price, event_id,
                 ROW_NUMBER() OVER (PARTITION BY auction
                                    ORDER BY price DESC, event_id) AS rank_number
          FROM bid
        ) WHERE rank_number <= 10
        """,
    )
    return eng.sql(
        "SELECT auction, price, rank_number FROM nx_q19 ORDER BY auction, rank_number"
    )


@register(
    "nexmark_mv_q20_join_expand",
    oracle=f"""
SELECT b.auction, b.bidder, b.price, b.channel, a.item_name, a.category
FROM {SURV_BIDS} b JOIN {AUCTION_DIM} a ON b.auction = a.auction_id
WHERE a.category = 10
ORDER BY b.event_id
""",
)
def nexmark_mv_q20_join_expand(spark, sf_dir):
    """Nexmark q20 (reference `views/q20.slt.part`: bid enriched with
    its auction's attributes, filtered to one category): a row-grain
    stream-stream join MV with the category filter pushed below the
    join into the auction input's state."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv20_",
        """
        CREATE MATERIALIZED VIEW nx_q20 AS
        SELECT event_id, b.auction, b.bidder, b.price, b.channel,
               a.item_name, a.category
        FROM bid b JOIN auction a ON b.auction = a.auction_id
        WHERE a.category = 10
        """,
        auction=True,
    )
    return eng.sql(
        "SELECT auction, bidder, price, channel, item_name, category "
        "FROM nx_q20 ORDER BY event_id"
    )


@register(
    "nexmark_mv_q21_channel_id",
    oracle=f"""
SELECT auction, bidder, price, channel,
  CASE WHEN lower(channel) = 'click' THEN '0'
       WHEN lower(channel) = 'view' THEN '1'
       ELSE regexp_extract(url, 'channel_id=([^&]*)', 1)
  END AS channel_id
FROM {SURV_BIDS_URL} b
WHERE regexp_extract(url, 'channel_id=([^&]*)', 1) <> ''
   OR lower(channel) IN ('click', 'view')
ORDER BY event_id
""",
)
def nexmark_mv_q21_channel_id(spark, sf_dir):
    """Nexmark q21 (reference `views/q21.slt.part`: CASE + regexp url
    parsing; regexp_extract spelling — the reference's
    (regexp_match(...))[2] array form): a row-grain expression MV whose
    regexp runs JVM-side per batch."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv21_",
        """
        CREATE MATERIALIZED VIEW nx_q21 AS
        SELECT event_id, auction, bidder, price, channel,
          CASE WHEN lower(channel) = 'click' THEN '0'
               WHEN lower(channel) = 'view' THEN '1'
               ELSE regexp_extract(url, 'channel_id=([^&]*)', 1)
          END AS channel_id
        FROM bid
        WHERE regexp_extract(url, 'channel_id=([^&]*)', 1) <> ''
           OR lower(channel) IN ('click', 'view')
        """,
        url=True,
    )
    return eng.sql(
        "SELECT auction, bidder, price, channel, channel_id FROM nx_q21 "
        "ORDER BY event_id"
    )


@register(
    "nexmark_mv_q22_split_url",
    oracle=f"""
SELECT auction, bidder, price, channel,
       split_part(url, '/', 4) AS dir1,
       split_part(url, '/', 5) AS dir2,
       split_part(url, '/', 6) AS dir3
FROM {SURV_BIDS_URL} b ORDER BY event_id
""",
)
def nexmark_mv_q22_split_url(spark, sf_dir):
    """Nexmark q22 (reference `views/q22.slt.part`: split_part url
    directory extraction) as a row-grain MV."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv22_",
        """
        CREATE MATERIALIZED VIEW nx_q22 AS
        SELECT event_id, auction, bidder, price, channel,
               split_part(url, '/', 4) AS dir1,
               split_part(url, '/', 5) AS dir2,
               split_part(url, '/', 6) AS dir3
        FROM bid
        """,
        url=True,
    )
    return eng.sql(
        "SELECT auction, bidder, price, channel, dir1, dir2, dir3 FROM nx_q22 "
        "ORDER BY event_id"
    )


@register(
    "nexmark_mv_q102_hot_with_avg",
    oracle=f"""
SELECT a.auction_id, a.item_name, count(*) AS bid_count
FROM {AUCTION_DIM} a JOIN {SURV_BIDS} b ON a.auction_id = b.auction
GROUP BY a.auction_id, a.item_name
HAVING count(*) >= (SELECT count(*) / count(DISTINCT auction) FROM {SURV_BIDS} b2)
ORDER BY a.auction_id
""",
)
def nexmark_mv_q102_hot_with_avg(spark, sf_dir):
    """Nexmark q102 (reference `views/q102.slt.part`: HAVING against the
    average bid count — an uncorrelated scalar subquery): the scalar
    re-evaluates per fold and a moved value re-splices the groups (the
    DynamicFilter path), so auctions crossing the moving threshold in
    either direction stay exact."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv102_",
        """
        CREATE MATERIALIZED VIEW nx_q102 AS
        SELECT a.auction_id, a.item_name, count(*) AS bid_count
        FROM auction a JOIN bid b ON a.auction_id = b.auction
        GROUP BY a.auction_id, a.item_name
        HAVING count(*) >= (SELECT count(*) / count(DISTINCT auction) FROM bid)
        """,
        auction=True,
    )
    return eng.sql(
        "SELECT auction_id, item_name, bid_count FROM nx_q102 ORDER BY auction_id"
    )


@register(
    "nexmark_mv_q104_cold_auctions",
    oracle=f"""
SELECT a.auction_id, a.item_name
FROM {AUCTION_DIM} a
WHERE a.auction_id NOT IN (
  SELECT auction FROM {SURV_BIDS} b GROUP BY auction HAVING count(*) < 20
)
ORDER BY a.auction_id
""",
)
def nexmark_mv_q104_cold_auctions(spark, sf_dir):
    """Nexmark q104 (reference `views/q104.slt.part`: NOT IN over a
    grouped HAVING subquery): the helper agg MV keeps the
    under-20-bids auctions and an anti step excludes them; bid deletes
    that drop an auction under the threshold retract it from the
    result."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv104_",
        """
        CREATE MATERIALIZED VIEW nx_q104 AS
        SELECT a.auction_id, a.item_name
        FROM auction a
        WHERE a.auction_id NOT IN (
          SELECT auction FROM bid GROUP BY auction HAVING count(*) < 20
        )
        """,
        auction=True,
    )
    return eng.sql("SELECT auction_id, item_name FROM nx_q104 ORDER BY auction_id")


@register(
    "nexmark_mv_q106_min_final",
    oracle=f"""
SELECT min(final) AS min_final FROM (
  SELECT a.auction_id, max(b.price) AS final
  FROM {AUCTION_DIM} a JOIN {SURV_BIDS} b ON b.auction = a.auction_id
  WHERE b.ts BETWEEN a.a_ts AND a.expires
  GROUP BY a.auction_id
) t
""",
)
def nexmark_mv_q106_min_final(spark, sf_dir):
    """Nexmark q106 (reference `views/q106.slt.part`: min of per-auction
    winning bids, with the bid-inside-auction-window interval
    condition): the inner comma join carries the BETWEEN as the join
    step's residual, the per-auction max maintains as a keyed MV, and
    the outer global min is a SimpleAgg MV-on-MV (native no-GROUP-BY path)."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv106_",
        """
        CREATE MATERIALIZED VIEW nx_q106a AS
        SELECT auction_id, max(price) AS final
        FROM auction, bid
        WHERE bid.auction = auction_id AND ts BETWEEN a_ts AND expires
        GROUP BY auction_id;
        CREATE MATERIALIZED VIEW nx_q106 AS
        SELECT min(final) AS min_final FROM nx_q106a
        """,
        auction=True,
    )
    return eng.sql("SELECT min_final FROM nx_q106")


@register(
    "nexmark_mv_q6_group_top1",
    oracle=f"""
WITH r AS (
  SELECT auction, auction % 50 AS seller,
         CAST(min(CAST(round(price*100,0) AS BIGINT)*10000000 + event_id)
              % 10000000 AS BIGINT) AS win_event,
         (CAST(min(CAST(round(price*100,0) AS BIGINT)*10000000 + event_id)
               // 10000000 AS BIGINT))/100.0 AS final
  FROM {SURV_BIDS} b GROUP BY auction
)
SELECT auction, seller, win_event, final,
       avg(final) OVER (PARTITION BY seller ORDER BY win_event
                        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS avg10
FROM r ORDER BY auction
""",
)
def nexmark_mv_q6_group_top1(spark, sf_dir):
    """Nexmark q6_group_top1 (reference `views/q6_group_top1.slt.part`:
    the per-(auction,seller) rank-1 bid feeding an AVG OVER the last
    10 per seller) — the over-window-on-top-of-a-view composition: the
    rank-1 level collapses to a retractable packed-argmin agg MV keyed
    by auction, and the windowed average maintains as a frame-delta
    over-window MV consuming THAT MV's Update-pair changelog
    (MV-as-over-window-base). win_event stands in for the winning
    bid's event time (event ids are time-ordered in this corpus)."""
    eng = _engine(
        spark, sf_dir, "rw_nxmv6_",
        """
        CREATE MATERIALIZED VIEW nx_q6r AS
        SELECT auction, auction % 50 AS seller,
               CAST(min(CAST(round(price*100,0) AS BIGINT)*10000000 + event_id)
                    % 10000000 AS BIGINT) AS win_event,
               (min(CAST(round(price*100,0) AS BIGINT)*10000000 + event_id)
                DIV 10000000)/100.0D AS final
        FROM bid GROUP BY auction;
        CREATE MATERIALIZED VIEW nx_q6 AS
        SELECT auction, seller, win_event, final,
               avg(final) OVER (PARTITION BY seller ORDER BY win_event
                                ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS avg10
        FROM nx_q6r
        """,
    )
    return eng.sql(
        "SELECT auction, seller, win_event, final, avg10 FROM nx_q6 ORDER BY auction"
    )
