package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines (data
  * mixing / stratified sampling / fixed-size per-stratum draws). Everything
  * is HASH-based, never RNG-based: `rand()` samples are irreproducible
  * across retries, partitionings and engines, which breaks both exactly-
  * once pipeline semantics and oracle checking. A row is sampled iff an
  * md5-derived uniform hash of its key falls under the stratum's rate — the
  * same row set on every run, every engine, any partitioning.
  *
  * Scale design: sampling is a map-side filter on a per-row hash — no
  * shuffle, no state, trivially parallel. The fixed-k per-stratum draw
  * shuffles only (stratum, hash) pairs and keeps a bounded top-k per
  * stratum.
  *
  * Reference provenance: /root/reference is an empty checkout (SURVEY.md
  * §0); hash-based deterministic sampling is the standard reproducible-
  * pipeline technique (e.g. mod-hash holdout splits).
  */
object Sampling {

  /** [0, 1e9) hash of a string key: top 60 bits of md5 (15 hex chars —
    * still inside a signed 64-bit long), engine-portable (DuckDB computes
    * the identical value from the same SQL).
    *
    * Uniform to within 2^60 % 1e9 / 2^60 ≈ 5e-10 relative bucket-density
    * error, so nominal rates ARE the realized rates (the earlier 32-bit
    * variant had a 5/4 modulo-density step that inflated sub-2.95e8 rates
    * by ~25%). The oracle SQL interpolates the same 15-hex-char expression —
    * any future width change must move both sides in lockstep.
    */
  private def hashBucket(key: Column): Column =
    graft.functions.TextHashFunctions.md5Top60(key) % 1000000000L

  /** Stratified (per-language) deterministic sample of the documents table:
    * keep a doc iff hash(doc_id) < rate(lang). The rate map is a data-mixing
    * recipe — oversample English 3x, downsample the rest. Map-side only;
    * the sampled fraction per stratum converges to the nominal rate/1e9
    * (0.30 for 'en', 0.10 for the rest) under [[hashBucket]]'s uniform
    * 60-bit hash.
    */
  /** The stratified keep-predicate on (doc_id, lang) — STATELESS, so the
    * identical expression serves the batch query below and the streaming
    * form (graft.streaming.StreamingOps.sampleStratified): a doc stream
    * sampled per micro-batch selects exactly the rows the batch operator
    * would, because the decision is a pure row-local hash compare.
    */
  /** Per-language acceptance rate on the [0, 1e9) hash scale. */
  private def stratRate: Column =
    when(col("lang") === "en", lit(300000000L)).otherwise(lit(100000000L))

  private[graft] def stratifiedKeep: Column =
    hashBucket(col("doc_id").cast("string")) < stratRate

  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    // hash once into a column, then filter on it — the Filter+Project pair
    // would otherwise evaluate the md5 chain twice per row (Catalyst does
    // not CSE across the two operators); the one-column form is also what
    // the streaming filter (stratifiedKeep, no sample_key output) elides
    Tables.documents(spark, sfDir)
      .withColumn("sample_key", hashBucket(col("doc_id").cast("string")))
      .filter(col("sample_key") < stratRate)
      .select(col("doc_id"), col("lang"), col("sample_key"))
      .orderBy("doc_id")

  /** Fixed-size per-stratum draw: the k docs with the smallest key hash in
    * each language — a deterministic "uniform without replacement" sample
    * whose members are stable under corpus growth only insofar as hashes
    * are (standard mod-hash holdout behavior). One shuffle on (lang),
    * bounded k per stratum via the ranking window.
    */
  /** Importance (length-weighted) sample: acceptance probability scales
    * with document token count — p(doc) = min(n_tokens, 200)/400, i.e.
    * rate = min(n_tokens, 200) * 2 500 000 on the [0, 1e9) hash scale. A
    * longer doc carries proportionally more training tokens, so a token-
    * budgeted mixing draw samples it proportionally more often (capped so
    * outliers can't dominate). All-INTEGER rate arithmetic — exact and
    * engine-portable, no float threshold to diverge on. Map-side filter
    * like [[stratifiedSample]]: no shuffle at any scale.
    */
  def importanceSample(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", nTok)
      .withColumn("h", hashBucket(col("doc_id").cast("string")))
      .filter(col("h") < least(col("n_tokens"), lit(200L)) * 2500000L)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** Data-mixture report: per (source, lang) document counts, token mass
    * and mean quality — the table a mixing decision reads. One partial-agg
    * groupBy; group count = |sources|x|langs|, independent of corpus size.
    */
  def sourceMix(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", nTok)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        round(avg(length(col("text"))), 6).as("avg_chars"))
      .orderBy("source", "lang")
  }

  /** Mixture rebalancing: deterministically subsample so every source
    * contributes (up to) an equal share — the static-reweighting step of
    * data mixing. Per-source acceptance rate on the [0, 1e9) hash scale:
    * rate(s) = min(1e9, total * 1e9 / (n_sources * count(s))), i.e. an
    * over-represented source is thinned to the uniform share and an under-
    * represented one keeps everything. The rate table is one tiny
    * aggregate (|sources| rows) broadcast back; acceptance is the same
    * map-side hash filter as every other sampler. All-integer: exact and
    * engine-portable up to ~9e9 docs (longs); beyond that the rate compute
    * moves to decimal — a type change, not a plan change.
    */
  /** TOKEN-BUDGET corpus cut: per language, take documents in a
    * deterministic priority order (doc_id — in production, a quality
    * rank) until a fixed token budget fills, then report what the cut
    * kept — the budgeting step that turns "we want 30% code, 20% web" (a
    * mixture RATIO) into an actual bounded corpus (mixture rebalancing
    * thins by rate; this CUTS by cumulative mass). A document is kept iff
    * the budget was not already full BEFORE it (cum − own ≤ budget), so
    * exactly one document may straddle the boundary — the standard
    * greedy-prefix semantics. One per-lang cumulative window over the
    * (lang-clustered) docs; the readout is a map-combinable aggregate of
    * the kept prefix.
    */
  def tokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 10000L // tokens per language
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .filter(col("cum") - col("n_tokens") <= budget)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs_taken"),
        sum(col("n_tokens")).as("tokens_taken"),
        max(col("doc_id")).as("last_doc_id"))
      .orderBy("lang")
  }

  def mixtureRebalance(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val totals = counts.agg(sum("n_src").as("n_total"),
      count(lit(1)).as("n_sources"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("source"),
        least(lit(1000000000L),
          expr("(n_total * 1000000000L) div (n_sources * n_src)")).as("rate"))
    docs.join(broadcast(rates), "source")
      .withColumn("h", hashBucket(col("doc_id").cast("string")))
      .filter(col("h") < col("rate"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Temperature-based mixture sampling (the multilingual/multi-source
    * flattening rule of T5/mT5: sampled share ∝ count^α): with α = 1/2,
    * acceptance rate(s) = sqrt(min_count / count(s)) — the smallest source
    * keeps everything, an over-represented one is thinned to
    * sqrt(min·count) docs, BETWEEN proportional (α=1, no change) and
    * uniform (α=0, [[mixtureRebalance]]). α = 1/2 specifically because
    * IEEE sqrt and double division are correctly rounded on every engine,
    * so floor(1e9·sqrt(min/count)) is bit-identical in Spark and DuckDB —
    * an arbitrary-α pow() would be libm-dependent and break the oracle.
    * Same scale shape as the other mixers: a |sources|-row rate table
    * broadcast onto a map-side hash filter; no corpus shuffle.
    */
  def mixtureTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val minc = counts.agg(min("n_src").as("n_min"))
    val rates = counts.crossJoin(broadcast(minc))
      .select(col("source"), col("n_src"),
        floor(lit(1000000000L) *
          sqrt(col("n_min").cast("double") / col("n_src").cast("double")))
          .cast("long").as("rate"))
    docs.join(broadcast(rates), "source")
      .withColumn("h", hashBucket(col("doc_id").cast("string")))
      .filter(col("h") < col("rate"))
      .groupBy("source", "n_src", "rate")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("source")
  }

  /** Deterministic train/val/test split: the [0, 1e9) hash line is cut
    * 98/1/1, so assignment is a pure row-local compare — the same doc lands
    * in the same split on every run, engine, partitioning and retry (the
    * property a holdout split MUST have: a val doc that migrates into train
    * on a rerun silently leaks). New corpus batches inherit the split with
    * no coordination — that is why hash-banding, not counters, is the
    * production holdout mechanism. Map-side only; no shuffle at any scale.
    */
  /** The split label as a pure row-local expression over doc_id — shared
    * by [[trainValTest]] and by consumers that label OTHER frames (the
    * leakage audit), so the banding can never diverge between them. The
    * hash appears three times in one projection; codegen's subexpression
    * elimination computes it once (unlike cross-operator Filter+Project,
    * see stratifiedSample).
    */
  private[graft] def splitCol: Column = {
    val h = hashBucket(col("doc_id").cast("string"))
    when(h < 980000000L, lit("train"))
      .when(h < 990000000L, lit("val"))
      .otherwise(lit("test"))
  }

  def trainValTest(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), splitCol.as("split"))
      .orderBy("doc_id")

  /** Shard count for [[deterministicShuffle]]. */
  val NumShards = 8L

  /** Deterministic training-order shuffle: the reproducible global
    * permutation a training run reads the corpus in. Order key is the
    * seeded hash `hashBucket("shuf:" || doc_id)` — changing the seed
    * prefix is a fresh independent permutation, and the order is a pure
    * function of doc_id (rerun-stable, engine-portable, unlike
    * `orderBy(rand(seed))`, whose output depends on partitioning).
    *
    * Scale shape: a GLOBAL row_number over the hash would funnel every row
    * through one partition — the classic driver-bottleneck anti-pattern —
    * so the permutation is materialized the way training infra consumes
    * it: hash-assigned to [[NumShards]] shards, with a per-shard position
    * from a shard-partitioned window. Readers interleave shards
    * round-robin; each shard's window parallelizes across executors. At
    * 1000 executors, NumShards simply grows with the reader count.
    */
  def deterministicShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, sfDir)
      .withColumn("h", hashBucket(concat(lit("shuf:"), col("doc_id").cast("string"))))
      .withColumn("shard", col("h") % NumShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"), col("lang"))
      .orderBy("shard", "pos")
  }

  /** Shard MANIFEST — the reproducibility attestation of
    * [[deterministicShuffle]]'s training order, one row per shard: doc
    * count, token total, and an ORDER-SENSITIVE md5 over the shard's
    * doc_id sequence in training order. This is the artifact a training
    * job records next to its shard files and re-verifies on every re-run
    * or backfill: equal manifests = byte-equal training order, across
    * engines, partitionings and retries.
    *
    * Scale shape: the per-shard sequence fingerprint uses the same
    * bounded collect_list + array_sort + md5 trick as vocabEncode's
    * ids_fp — per-SHARD state, which at real scale means per-shard-FILE
    * (shards scale with the reader count, each a bounded file's worth of
    * ids); the aggregate itself is one hash-agg keyed by shard.
    */
  def shardManifest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, sfDir)
      .withColumn("h", hashBucket(concat(lit("shuf:"), col("doc_id").cast("string"))))
      .withColumn("shard", col("h") % NumShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))).cast("long"))
      .withColumn("n", size(split(col("text"), " ")).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("doc_id")))),
          s => s.getField("doc_id").cast("string")), ",")).as("order_fp"))
      .orderBy("shard")
  }

  def sampleKPerStratum(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, sfDir)
      .withColumn("h", hashBucket(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn").cast("long").as("rn"), col("doc_id"))
      .orderBy("lang", "rn")
  }
}
