package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB twin in `oracleSql` unless the
  * operator is not SQL-expressible (then the driver records a rows-only
  * check). Determinism rules (SURVEY.md §5.2): total ORDER BY with key
  * tie-break, round(x, 6) on float aggregates on BOTH sides, identical
  * column names/aliases on both sides, no raw ns-timestamps.
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
  )

  /** DuckDB SQL twins. Table names resolve to the same parquet files. */
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
  )
}
