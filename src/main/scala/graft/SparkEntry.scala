package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB twin in `oracleSql` unless the
  * operator is not SQL-expressible (then the driver records a rows-only
  * check). Determinism rules (SURVEY.md §5.2): total ORDER BY with key
  * tie-break; exact DECIMAL(18,6) sums for float aggregates (bitwise
  * engine-portable — see Relational.dsum) instead of rounding raw double
  * sums; identical column names on both sides; integer outputs cast to
  * BIGINT on both sides; no raw ns-timestamps in output.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.wordCount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.A reference core: word-count MapReduce family ----
    "wordcount"           -> ((s, d) => WordCount.wordCount(s, d)),
    "top10_words"         -> ((s, d) => WordCount.topKWords(s, d, 10)),
    "perlang_wordcount"   -> ((s, d) => WordCount.perLangWordCount(s, d)),
    "stopword_wordcount"  -> ((s, d) => WordCount.stopwordFiltered(s, d)),
    "top_term_per_doc"    -> ((s, d) => WordCount.topTermPerDoc(s, d)),
    "doc_token_counts"    -> ((s, d) => WordCount.docTokenCounts(s, d)),
    // ---- B2 projections / filters / predicates ----
    "q_filter_project"    -> ((s, d) => Relational.filterProject(s, d)),
    "q_in_like"           -> ((s, d) => Relational.inLikeBetween(s, d)),
    "q_null_handling"     -> ((s, d) => Relational.nullHandling(s, d)),
    // ---- B3 joins ----
    "q_join_factfact"     -> ((s, d) => Relational.joinFactFact(s, d)),
    "q_star_join"         -> ((s, d) => Relational.starJoin(s, d)),
    "q_broadcast_join"    -> ((s, d) => Relational.broadcastJoin(s, d)),
    "q_left_outer"        -> ((s, d) => Relational.leftOuterJoin(s, d)),
    "q_full_outer"        -> ((s, d) => Relational.fullOuterJoin(s, d)),
    "q_semi_join"         -> ((s, d) => Relational.semiJoin(s, d)),
    "q_anti_join"         -> ((s, d) => Relational.antiJoin(s, d)),
    "q_theta_join"        -> ((s, d) => Relational.thetaJoin(s, d)),
    "q_range_join"        -> ((s, d) => Relational.rangeJoin(s, d)),
    "q_asof_join"         -> ((s, d) => Relational.asOfJoin(s, d)),
    // ---- B4 aggregations ----
    "q1_agg"              -> ((s, d) => Aggregates.q1PricingSummary(s, d)),
    "q_global_agg"        -> ((s, d) => Aggregates.globalAgg(s, d)),
    "q_count_distinct"    -> ((s, d) => Aggregates.countDistinctUsers(s, d)),
    "q_approx_distinct"   -> ((s, d) => Aggregates.approxDistinctUsers(s, d)),
    "q_rollup"            -> ((s, d) => Aggregates.rollupRevenue(s, d)),
    "q_cube"              -> ((s, d) => Aggregates.cubeOrders(s, d)),
    "q_collect"           -> ((s, d) => Aggregates.collectEventTypes(s, d)),
    "q_percentile_stats"  -> ((s, d) => Aggregates.percentileStats(s, d)),
    "q_corr_stats"        -> ((s, d) => Aggregates.corrStats(s, d)),
    "q_minmax_by"         -> ((s, d) => Aggregates.minMaxBy(s, d)),
    // ---- B5 windows ----
    "q_window_topk"       -> ((s, d) => Windows.topKPerUser(s, d)),
    "q_window_lag"        -> ((s, d) => Windows.lagDelta(s, d)),
    "q_window_running"    -> ((s, d) => Windows.runningTotal(s, d)),
    "q_window_trailing1h" -> ((s, d) => Windows.trailing1h(s, d)),
    "q_percent_rank"      -> ((s, d) => Windows.percentRank(s, d)),
    "q_ntile"             -> ((s, d) => Windows.ntileBalance(s, d)),
    // ---- B6 sorts / limits / set ops ----
    "q_top20_orders"      -> ((s, d) => SetOps.topOrders(s, d)),
    "q_union_all"         -> ((s, d) => SetOps.unionAll(s, d)),
    "q_intersect"         -> ((s, d) => SetOps.intersectNations(s, d)),
    "q_except"            -> ((s, d) => SetOps.exceptNations(s, d)),
    "q_distinct_pairs"    -> ((s, d) => SetOps.distinctPairs(s, d)),
    // ---- B7 scalar function families ----
    "q_string_funcs"      -> ((s, d) => Scalars.stringFuncs(s, d)),
    "q_date_funcs"        -> ((s, d) => Scalars.dateFuncs(s, d)),
    "q_math_funcs"        -> ((s, d) => Scalars.mathFuncs(s, d)),
    "q_array_funcs"       -> ((s, d) => Scalars.arrayFuncs(s, d)),
    "q_json_funcs"        -> ((s, d) => Scalars.jsonFuncs(s, d)),
    "q_conditional"       -> ((s, d) => Scalars.conditionalFuncs(s, d)),
  )

  /** DuckDB SQL twins. Table names resolve to the same parquet files.
    * `q_approx_distinct` is intentionally absent (HLL implementations
    * differ) → rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "wordcount" ->
      """SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY cnt DESC, word""".stripMargin,
    "top10_words" ->
      """SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY cnt DESC, word LIMIT 10""".stripMargin,
    "perlang_wordcount" ->
      """SELECT lang, w AS word, count(*) AS cnt
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY lang, w ORDER BY lang, cnt DESC, word""".stripMargin,
    "stopword_wordcount" ->
      """SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE w NOT IN ('a','the','of','and','to','in')
        |GROUP BY w ORDER BY cnt DESC, word""".stripMargin,
    "top_term_per_doc" ->
      """SELECT doc_id, word, tf FROM (
        |  SELECT doc_id, word, tf,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, word DESC) AS rn
        |  FROM (SELECT doc_id, w AS word, count(*) AS tf
        |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |        GROUP BY doc_id, w))
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "doc_token_counts" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS net
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_in_like" ->
      """SELECT p_partkey, p_name, p_brand, CAST(p_size AS BIGINT) AS p_size
        |FROM part
        |WHERE p_type LIKE 'PROMO%'
        |   OR (p_brand IN ('Brand#1','Brand#2') AND p_size BETWEEN 5 AND 15)
        |ORDER BY p_partkey""".stripMargin,
    "q_null_handling" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment,'BUILDING'),'(masked)') AS seg,
        |  CAST(CASE WHEN nullif(c_mktsegment,'BUILDING') IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_building
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_join_factfact" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_star_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_broadcast_join" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS gross
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_left_outer" ->
      """SELECT o_orderkey, count(l.l_orderkey) AS n_heavy
        |FROM orders LEFT JOIN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45) l
        |  ON o_orderkey = l.l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q_full_outer" ->
      """SELECT CAST(coalesce(c.c_nationkey, s.s_nationkey) AS BIGINT) AS nationkey,
        |       coalesce(n_rich_cust, 0) AS n_rich_cust,
        |       coalesce(n_rich_supp, 0) AS n_rich_supp
        |FROM (SELECT c_nationkey, count(*) AS n_rich_cust FROM customer
        |      WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey, count(*) AS n_rich_supp FROM supplier
        |      WHERE s_acctbal > 5000 GROUP BY s_nationkey) s
        |  ON c.c_nationkey = s.s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_theta_join" ->
      """SELECT s_suppkey, count(*) AS n_cheaper_parts
        |FROM part JOIN supplier ON p_retailprice < s_acctbal / 10.0
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q_range_join" ->
      """SELECT a.user_id, count(*) AS n_pairs_1h
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND epoch_us(b.ts) > epoch_us(a.ts)
        |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id, coalesce(prev_click_us, -1) AS prev_click_us FROM (
        |  SELECT event_id, user_id, event_type,
        |    max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click_us
        |  FROM events) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_global_agg" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_price,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "q_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(n_name, 'ALL') AS nation, coalesce(oyear, -1) AS oyear,
        |  CAST(sum(CAST(net AS DECIMAL(18,6))) AS DOUBLE) AS revenue, count(*) AS n_items
        |FROM (SELECT n_name, year(o_orderdate) AS oyear,
        |             l_extendedprice*(1-l_discount) AS net
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey)
        |GROUP BY ROLLUP(n_name, oyear)
        |ORDER BY nation, oyear""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_collect" ->
      """SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |       count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_percentile_stats" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  round(stddev_samp(value), 4) AS sd,
        |  min(value) AS vmin, max(value) AS vmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_corr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_minmax_by" ->
      """SELECT user_id,
        |  (max(struct_pack(value := value, event_id := event_id))).value AS top_value,
        |  (max(struct_pack(value := value, event_id := event_id))).event_id AS top_event_id,
        |  (min(struct_pack(ts := epoch_ns(ts), event_id := event_id))).event_id AS first_event_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_window_topk" ->
      """SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "q_window_lag" ->
      """SELECT event_id, value - prev AS delta FROM (
        |  SELECT event_id, value, lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events) t
        |WHERE prev IS NOT NULL ORDER BY event_id""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_trailing1h" ->
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000000000
        |        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS sum_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "q_percent_rank" ->
      """SELECT o_orderkey, round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM orders WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey,
        |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_top20_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_union_all" ->
      """SELECT * FROM (
        |  SELECT 'cust' AS kind, c_name AS name, c_acctbal AS bal FROM customer
        |  WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT 'supp', s_name, s_acctbal FROM supplier WHERE s_acctbal > 0)
        |ORDER BY kind, name""".stripMargin,
    "q_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |EXCEPT
        |SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_distinct_pairs" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q_string_funcs" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len_text,
        |  length(text) = n_chars AS len_matches,
        |  upper(substr(text, 1, 8)) AS head8,
        |  concat_ws('-', lang, source) AS lang_src,
        |  CAST(instr(text, 'scan') AS BIGINT) AS scan_pos,
        |  CAST(levenshtein(lang, 'en') AS BIGINT) AS lev_en,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  regexp_replace(substr(text, 1, 20), ' ', '_', 'g') AS head_snake
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS oyear, month(o_orderdate) AS omonth,
        |  day(o_orderdate) AS oday, quarter(o_orderdate) AS oquarter,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS omonth_start,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT p_partkey, round(sqrt(p_retailprice), 6) AS sqrt_price,
        |  round(ln(p_retailprice), 6) AS ln_price,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        |  CAST(abs(p_size - 25) AS BIGINT) AS abs_size_off,
        |  pow(p_size, 2) AS size_sq,
        |  CAST(greatest(p_size, 25) AS BIGINT) AS size_hi,
        |  CAST(least(p_size, 25) AS BIGINT) AS size_lo
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vsum,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
        |  list_contains(embedding, embedding[1]) AS has_e1,
        |  CAST(len(list_distinct(embedding)) AS BIGINT) AS n_distinct
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_path,
        |  CAST(props->>'$.k' AS BIGINT) AS k_map,
        |  CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod10
        |FROM events ORDER BY event_id""".stripMargin,
    "q_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS tier,
        |  (c_acctbal > 5000 AND c_mktsegment <> 'BUILDING') AS rich_nonbuild
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
