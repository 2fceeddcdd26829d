package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{RefParity, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB oracle in [[oracleSql]] unless the
  * operator is not SQL-expressible (sketches with engine-specific algorithms);
  * those are flagged rows-only. Column names are aliased identically on both
  * sides; every query ends in a total ORDER BY so results are deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's analytics-MV cascade end to end (ingest → raw →
    * derive, SURVEY.md §3.3). */
  def entry(spark: SparkSession): DataFrame =
    RefParity.analyticsDerive(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference parity (SURVEY §2.3–§2.5) —
    "r1_ingest_raw" -> (RefParity.ingestRaw _),
    "r2_subject_segments" -> (RefParity.subjectSegments _),
    "r3_json_extract" -> (RefParity.jsonExtract _),
    "r4_analytics_derive" -> (RefParity.analyticsDerive _),
    "r5_union_streams" -> (RefParity.unionStreams _),
    "r6_month_partitions" -> (RefParity.monthPartitions _),
    // — relational battery (SURVEY §2.6 / §7.2 step 4) —
    "q1_pricing_summary" -> (Relational.pricingSummary _),
    "q2_filter_agg" -> (Relational.filterAgg _),
    "q3_join_topk" -> (Relational.joinTopK _),
    "q4_broadcast_join" -> (Relational.broadcastJoinAgg _),
    "q5_multi_join" -> (Relational.multiJoinAgg _),
    "q6_semi_join" -> (Relational.semiJoin _),
    "q7_anti_join" -> (Relational.antiJoin _),
    "q8_window_rank" -> (Relational.windowRank _),
    "q9_window_running" -> (Relational.windowRunning _),
    "q10_distinct_agg" -> (Relational.distinctAgg _),
    "q11_rollup" -> (Relational.rollupAgg _),
    "q12_set_ops" -> (Relational.setOps _),
    "q13_event_windows" -> (Relational.eventWindows _),
    "q14_sessionize" -> (Relational.sessionize _),
    "q15_moving_avg" -> (Relational.movingAvg _),
    "q16_approx_distinct" -> (Relational.approxDistinct _)
  )

  /** Shared DuckDB CTE: the deterministic NATS-like envelope synthesized
    * from `events` — must mirror [[RefParity.envelopes]] expression for
    * expression. */
  private val envCte: String =
    """WITH env AS (
      |  SELECT
      |    CASE WHEN event_id % 10 = 0 THEN
      |      'globex.' || (CASE WHEN event_type IN ('view','click') THEN 'supprt' ELSE 'crmabc' END) || '.u' || CAST(user_id AS VARCHAR)
      |    WHEN event_id % 10 = 1 THEN
      |      'globex.' || (CASE WHEN event_type IN ('view','click') THEN 'supprt' ELSE 'crmabc' END) || '.u' || CAST(user_id AS VARCHAR) || '.chat' || CAST(event_id % 97 AS VARCHAR)
      |    ELSE
      |      'globex.' || (CASE WHEN event_type IN ('view','click') THEN 'supprt' ELSE 'crmabc' END) || '.u' || CAST(user_id AS VARCHAR) || '.chat' || CAST(event_id % 97 AS VARCHAR) || '.bot.user.' || event_type || '.ctx' || CAST(event_id % 5 AS VARCHAR)
      |    END AS subject,
      |    CASE WHEN event_id % 7 = 0 THEN props ELSE
      |      '{"text":"ev-' || CAST(event_id AS VARCHAR) || '","meta":"' || event_type || '","id":"m' || CAST(event_id AS VARCHAR) || '","timestamp":' || CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS VARCHAR) || '}'
      |    END AS data,
      |    ts AS meta_ts,
      |    event_id AS seq
      |  FROM events
      |), raw AS (
      |  SELECT
      |    date_trunc('second', meta_ts) AS "timestamp",
      |    subject,
      |    coalesce(string_split(subject, '.')[4], '') AS chat_id,
      |    seq AS sequence,
      |    '{"Sequence":{"Consumer":' || CAST(seq AS VARCHAR) || ',"Stream":' || CAST(seq AS VARCHAR) || '},"NumDelivered":1,"NumPending":0,"Timestamp":"' || strftime(meta_ts, '%Y-%m-%dT%H:%M:%SZ') || '"}' AS metadata,
      |    data
      |  FROM env
      |)
      |""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "r1_ingest_raw" -> (envCte +
      """SELECT * FROM raw ORDER BY sequence"""),

    "r2_subject_segments" -> (envCte +
      """SELECT seq AS sequence, subject,
        |  coalesce(string_split(subject,'.')[4], '') AS chat_id_go,
        |  coalesce(string_split(subject,'.')[1], '') AS seg1,
        |  coalesce(string_split(subject,'.')[2], '') AS seg2,
        |  coalesce(string_split(subject,'.')[3], '') AS seg3,
        |  coalesce(string_split(subject,'.')[4], '') AS seg4,
        |  coalesce(string_split(subject,'.')[5], '') AS seg5,
        |  coalesce(string_split(subject,'.')[6], '') AS seg6,
        |  coalesce(string_split(subject,'.')[7], '') AS seg7,
        |  coalesce(string_split(subject,'.')[8], '') AS seg8
        |FROM env ORDER BY sequence""".stripMargin),

    "r3_json_extract" -> (envCte +
      """SELECT seq AS sequence,
        |  coalesce(json_extract_string(data, '$.text'), '') AS x_text,
        |  coalesce(json_extract_string(data, '$.meta'), '') AS x_meta,
        |  coalesce(json_extract_string(data, '$.missing'), '') AS x_missing,
        |  coalesce(TRY_CAST(json_extract_string(data, '$.k') AS BIGINT), 0) AS x_k,
        |  epoch_ms(1000 * coalesce(TRY_CAST(json_extract_string(data, '$.timestamp') AS BIGINT), 0)) AS x_ts
        |FROM env ORDER BY sequence""".stripMargin),

    "r4_analytics_derive" -> (envCte +
      """SELECT "timestamp", subject, chat_id, metadata, data,
        |  coalesce(json_extract_string(data, '$.text'), '') AS message_text,
        |  coalesce(json_extract_string(data, '$.meta'), '') AS message_meta,
        |  coalesce(json_extract_string(data, '$.id'), '') AS message_id,
        |  epoch_ms(1000 * coalesce(TRY_CAST(json_extract_string(data, '$.timestamp') AS BIGINT), 0)) AS message_timestamp,
        |  coalesce(string_split(subject,'.')[1], '') AS client_code,
        |  coalesce(string_split(subject,'.')[2], '') AS project_code,
        |  coalesce(string_split(subject,'.')[3], '') AS user_id,
        |  coalesce(string_split(subject,'.')[4], '') AS session_id,
        |  coalesce(string_split(subject,'.')[5], '') AS message_from,
        |  coalesce(string_split(subject,'.')[6], '') AS message_to,
        |  coalesce(string_split(subject,'.')[7], '') AS message_type,
        |  coalesce(string_split(subject,'.')[8], '') AS message_context
        |FROM raw ORDER BY metadata""".stripMargin),

    "r5_union_streams" -> (envCte +
      """SELECT coalesce(string_split(subject,'.')[2], '') AS stream,
        |  COUNT(*) AS n_rows, MIN(sequence) AS min_seq, MAX(sequence) AS max_seq,
        |  COUNT(CASE WHEN chat_id <> '' THEN 1 END) AS n_with_chat
        |FROM raw
        |WHERE subject LIKE 'globex.supprt.%' OR subject LIKE 'globex.crmabc.%'
        |GROUP BY 1 ORDER BY stream""".stripMargin),

    "r6_month_partitions" -> (envCte +
      """SELECT strftime("timestamp", '%Y%m') AS month, COUNT(*) AS n_rows,
        |  MIN("timestamp") AS min_ts, MAX("timestamp") AS max_ts
        |FROM raw GROUP BY 1 ORDER BY month""".stripMargin),

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_agg" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_broadcast_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q5_multi_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem, orders, supplier, customer, nation, region
        |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND o_custkey = c_custkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q7_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS sum_acctbal,
        |  MIN(c_custkey) AS min_custkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |                  AND o_orderdate < TIMESTAMP '1997-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q8_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q9_window_running" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey < 10
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,

    "q10_distinct_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS sum_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q11_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q12_set_ops" ->
      """WITH jan AS (SELECT o_custkey FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |               AND o_orderdate < TIMESTAMP '1996-02-01'),
        |     feb AS (SELECT o_custkey FROM orders
        |             WHERE o_orderdate >= TIMESTAMP '1996-02-01'
        |               AND o_orderdate < TIMESTAMP '1996-03-01')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM jan INTERSECT SELECT o_custkey FROM feb)
        |UNION ALL
        |SELECT 'jan_only' AS tag, o_custkey FROM (SELECT o_custkey FROM jan EXCEPT SELECT o_custkey FROM feb)
        |UNION ALL
        |SELECT 'feb_only' AS tag, o_custkey FROM (SELECT o_custkey FROM feb EXCEPT SELECT o_custkey FROM jan)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q13_event_windows" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / CAST(COUNT(value) AS DOUBLE) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "q14_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |            - CAST(epoch(date_trunc('second', lag(ts) OVER w)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, event_id, ts, value,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q15_moving_avg" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, COUNT(*) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS dec_price
        |  FROM orders GROUP BY 1
        |)
        |SELECT day, n_orders,
        |  CAST(dec_price AS DOUBLE) AS sum_price,
        |  CAST(SUM(n_orders) OVER w7 AS DOUBLE) / CAST(COUNT(*) OVER w7 AS DOUBLE) AS ma7_orders,
        |  CAST(SUM(dec_price) OVER w7 AS DOUBLE) / CAST(COUNT(*) OVER w7 AS DOUBLE) AS ma7_price
        |FROM daily
        |WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin

    // q16_approx_distinct: HLL++ sketch — engine-specific, rows-only check.
  )
}
