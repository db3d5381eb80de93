package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2.2 for the declared query
  * inventory and §7 for the build plan. Every key in `queries` has a matching
  * DuckDB oracle in `oracleSql` unless the operator is engine-specific
  * (approx sketches) — those get the driver's weaker rows-only check.
  *
  * Determinism discipline (SURVEY.md §7.4): every query ends in an explicit
  * orderBy over a unique key; money aggregates accumulate in DECIMAL and
  * surface as DOUBLE so Spark and DuckDB agree bit-for-bit.
  */
object SparkEntry {

  /** Flagship: 4-way star join + agg on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Joins.multi(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Group A — reference-surface ETL semantics
    "q_project_rename"     -> (GroupA.projectRename _),
    "q_derived_column"     -> (GroupA.derivedColumn _),
    "q_cast_timestamp"     -> (GroupA.castTimestamp _),
    "q_filter_prefix"      -> (GroupA.filterPrefix _),
    "q_union_all"          -> (GroupA.unionAll _),
    "q_dedup_latest"       -> (GroupA.dedupLatest _),
    "q_merge_upsert"       -> (GroupA.mergeUpsert _),
    "q_snapshot_overwrite" -> (GroupA.snapshotOverwrite _),
    // Group B — joins
    "q_join_inner"         -> (Joins.inner _),
    "q_join_broadcast"     -> (Joins.broadcastJoin _),
    "q_join_multi"         -> (Joins.multi _),
    "q_join_left"          -> (Joins.left _),
    "q_join_semi"          -> (Joins.semi _),
    "q_join_anti"          -> (Joins.anti _),
    "q_join_range"         -> (Joins.range _),
    "q_join_asof"          -> (Joins.asof _),
    // Group B — aggregates
    "q_agg_groupby"        -> (Aggregates.groupBy _),
    "q_agg_distinct"       -> (Aggregates.distinctAgg _),
    "q_agg_approx_distinct" -> (Aggregates.approxDistinct _),
    "q_rollup"             -> (Aggregates.rollupAgg _),
    "q_cube"               -> (Aggregates.cubeAgg _),
    "q_grouping_sets"      -> (Aggregates.groupingSets _),
    "q_pivot"              -> (Aggregates.pivot _),
    // Group B — windows, sorts, set ops
    "q_window_rank"        -> (WindowsSorts.rank _),
    "q_window_running"     -> (WindowsSorts.running _),
    "q_window_lag"         -> (WindowsSorts.lagDelta _),
    "q_topk"               -> (WindowsSorts.topk _),
    "q_sort_global"        -> (WindowsSorts.sortGlobal _),
    "q_intersect"          -> (WindowsSorts.intersect _),
    "q_except"             -> (WindowsSorts.except _),
    // Group B — scalar functions
    "q_string_funcs"       -> (Scalars.stringFuncs _),
    "q_date_funcs"         -> (Scalars.dateFuncs _),
    "q_math_funcs"         -> (Scalars.mathFuncs _),
    "q_case_when"          -> (Scalars.caseWhen _),
    "q_json_funcs"         -> (Scalars.jsonFuncs _),
  )

  /** DECIMAL-staged exact sum, surfaced as DOUBLE (matches Tables.dsum2).
    * The VARCHAR hop makes DuckDB's decimal→double conversion correctly
    * rounded (parse of the exact decimal string), matching Spark's
    * BigDecimal.doubleValue — a direct DECIMAL→DOUBLE cast in DuckDB goes
    * int128→double then ×10⁻ˢ, which can be off by one ulp. */
  private def dsum(c: String) = s"CAST(CAST(SUM(CAST($c AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"

  def oracleSql: Map[String, String] = Map(
    "q_project_rename" ->
      """SELECT p_partkey AS id, p_name AS name, p_brand AS brand, p_retailprice AS price
         FROM part ORDER BY id""",
    "q_derived_column" ->
      """SELECT c_custkey, c_mktsegment, c_mktsegment AS segment_key,
                CAST(floor(c_acctbal/100) AS BIGINT) AS bal_bucket
         FROM customer ORDER BY c_custkey""",
    "q_cast_timestamp" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
                date_trunc('month', o_orderdate) AS order_month,
                year(o_orderdate) AS order_year
         FROM orders ORDER BY o_orderkey""",
    "q_filter_prefix" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE p_name LIKE 'red%' ORDER BY p_partkey""",
    "q_union_all" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus='F'
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus='O'
         ) ORDER BY o_orderkey""",
    "q_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ts_ms
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "q_merge_upsert" ->
      """WITH ev AS (SELECT user_id, event_type, value, epoch_ms(ts) AS ts_ms, event_id, ts FROM events),
         tgt AS (SELECT user_id, event_type, value, ts_ms FROM
                   (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM ev WHERE ts < TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1),
         src AS (SELECT user_id, event_type, value, ts_ms FROM
                   (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                    FROM ev WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1)
         SELECT CASE WHEN s.user_id IS NOT NULL THEN s.user_id ELSE t.user_id END AS user_id,
                CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type,
                CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value,
                CASE WHEN s.user_id IS NOT NULL THEN s.ts_ms ELSE t.ts_ms END AS ts_ms
         FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
         ORDER BY user_id""",
    "q_snapshot_overwrite" ->
      s"""SELECT o_orderpriority, count(*) AS n, ${dsum("o_totalprice")} AS total
          FROM orders WHERE o_orderstatus='O' GROUP BY 1 ORDER BY 1""",
    "q_join_inner" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus, l_extendedprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber""",
    "q_join_broadcast" ->
      s"""SELECT p_brand, ${dsum("l_extendedprice")} AS revenue, count(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1 ORDER BY 1""",
    "q_join_multi" ->
      s"""SELECT r_name, l_returnflag,
                 CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue,
                 ${dsum("l_quantity")} AS sum_qty, count(*) AS n
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          GROUP BY 1,2 ORDER BY 1,2""",
    "q_join_left" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_big,
                 coalesce(${dsum("o_totalprice")}, 0.0) AS total_big
          FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
            ON c_custkey = o_custkey
          GROUP BY 1 ORDER BY 1""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority='1-URGENT')
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus='P')
         ORDER BY c_custkey""",
    "q_join_range" ->
      s"""SELECT r_regionkey AS bucket, count(*) AS n, ${dsum("p_retailprice")} AS total
          FROM part JOIN region
            ON p_retailprice >= 900 + r_regionkey*20 AND p_retailprice < 920 + r_regionkey*20
          GROUP BY 1 ORDER BY 1""",
    "q_join_asof" ->
      """WITH x AS (
           SELECT event_id, user_id, value, ts, event_type,
                  last_value(CASE WHEN event_type='signup' THEN ts END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
           FROM events)
         SELECT event_id, user_id, value, epoch_ms(ts) AS ts_ms, epoch_ms(asof_ts) AS asof_signup_ms
         FROM x WHERE event_type='purchase' ORDER BY event_id""",
    "q_agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
                 ${dsum("l_quantity")} AS sum_qty,
                 ${dsum("l_extendedprice")} AS sum_base,
                 CAST(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                 ${dsum("l_quantity")}/count(*) AS avg_qty,
                 count(*) AS n
          FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 ${dsum("o_totalprice")} AS total,
                 CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
          FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
          ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
                 ${dsum("l_quantity")} AS sum_qty,
                 CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
          FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
          ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 ${dsum("o_totalprice")} AS total,
                 CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
          FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
          ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_pivot" ->
      """SELECT source,
                count(*) FILTER (WHERE lang='de') AS de,
                count(*) FILTER (WHERE lang='en') AS en,
                count(*) FILTER (WHERE lang='es') AS es,
                count(*) FILTER (WHERE lang='fr') AS fr,
                count(*) FILTER (WHERE lang='zh') AS zh
         FROM documents GROUP BY source ORDER BY source""",
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rnk, rn FROM (
           SELECT p_brand, p_partkey, p_retailprice,
                  CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS rnk,
                  CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
           FROM part)
         WHERE rn <= 10 ORDER BY p_brand, rn""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_window_lag" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
                lag(value, 1) OVER w AS prev_value,
                value - lag(value, 1) OVER w AS delta
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, ts_ms, event_id""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_sort_global" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         ORDER BY o_orderdate DESC, o_orderkey""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus='F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus='O'
         ORDER BY o_custkey""",
    "q_except" ->
      """SELECT o_custkey FROM orders
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderpriority='1-URGENT'
         ORDER BY o_custkey""",
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
                substr(c_name, 1, 8) AS prefix,
                concat_ws('|', c_mktsegment, c_name) AS tag,
                CAST(length(c_name) AS BIGINT) AS name_len,
                trim('  x  ') AS trimmed
         FROM customer ORDER BY c_custkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
                day(o_orderdate) AS d, quarter(o_orderdate) AS q,
                date_trunc('quarter', o_orderdate) AS q_start,
                datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
                last_day(CAST(o_orderdate AS DATE)) AS month_end
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))
                                * CAST(1 + l_tax AS DECIMAL(8,2))
                                * CAST(1 - l_discount AS DECIMAL(8,2)), 2) AS VARCHAR) AS DOUBLE) AS charge,
                abs(l_extendedprice - l_quantity * 1000.0) AS absdiff,
                (l_extendedprice - l_quantity) / l_quantity AS pct,
                sqrt(l_extendedprice) AS root,
                CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 200000 THEN 'mid'
                     ELSE 'big' END AS bucket,
                o_orderstatus, count(*) AS n
         FROM orders GROUP BY 1,2 ORDER BY 1,2""",
    "q_json_funcs" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
  )
}
