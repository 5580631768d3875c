package graft

import graft.operators.{Relational, WordCount}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink breadth beyond parquet (SURVEY.md §2.B1): text, CSV, JSON
  * and ORC round-trips must preserve the data and feed the same plans. Each
  * format writes the documents table to a temp dir and reads it back.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(tag: String) = Files.createTempDirectory(s"graft-src-$tag").toString

  test("text-file word count equals the parquet-sourced word count") {
    val dir = tmp("text")
    Tables.documents(spark, sf).select("text").write.mode("overwrite").text(dir)
    val fromText = WordCount.wordCountTextFiles(spark, dir).collect().toSeq
    val fromParquet = WordCount.wordCount(spark, sf).collect().toSeq
    assert(fromText == fromParquet)
  }

  test("csv round-trip preserves the documents table") {
    val dir = tmp("csv")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("json round-trip preserves the documents table") {
    val dir = tmp("json")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("orc round-trip preserves the documents table and prunes columns") {
    val dir = tmp("orc")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
    // column pruning reaches the ORC scan like it does for parquet
    val plan = back.select("doc_id").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id"), plan)
  }

  test("malformed json records: PERMISSIVE captures, DROPMALFORMED skips, count survives") {
    // ingest robustness — a 100 TB crawl always contains broken records;
    // the pipeline must quarantine them without failing the job
    val dir = tmp("badjson")
    val good = Seq("""{"doc_id": 1, "text": "alpha beta"}""",
      """{"doc_id": 2, "text": "gamma"}""")
    val bad = Seq("""{"doc_id": 3, "text": """", """not json at all""")
    import spark.implicits._
    (good ++ bad).toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = "doc_id LONG, text STRING, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(dir).cache()
    try {
      assert(permissive.count() == 4)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(permissive.filter(col("_corrupt_record").isNull)
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
      val dropped = spark.read.schema("doc_id LONG, text STRING")
        .option("mode", "DROPMALFORMED").json(dir)
      assert(dropped.count() == 2)
    } finally permissive.unpersist()
  }

  test("salted join equals the plain fact-fact join") {
    val plain = Relational.joinFactFact(spark, sf).collect().toSeq
    val salted = Relational.joinFactFactSalted(spark, sf).collect().toSeq
    assert(plain == salted)
  }

  test("registered CSV-source rollup equals the parquet-side twin row for row") {
    import graft.operators.{Relational => R, Sources}
    val got = Sources.csvCustomerSegments(spark, sf).collect().toSeq
    val want = Tables.customer(spark, sf)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        round(R.dsum(col("c_acctbal")), 4).as("sum_acctbal"),
        min(col("c_name")).as("first_name"),
        max(col("c_name")).as("last_name"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("registered JSONL-source rollup equals the parquet-side twin and reads multiple files") {
    import graft.operators.Sources
    val got = Sources.jsonlDocsPerLang(spark, sf).collect().toSeq
    val want = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
      .orderBy("lang").collect().toSeq
    assert(got == want && got.nonEmpty)
    // the splittable-ingest claim is real: the copy is multi-file
    val files = new java.io.File(Sources.jsonlDir(spark, sf))
      .listFiles().count(_.getName.endsWith(".json"))
    assert(files > 1)
  }

  test("registered ORC-source rollup equals the parquet twin and pushes its filter to the scan") {
    import graft.operators.{Relational => R, Sources}
    val got = Sources.orcOrderPriorities(spark, sf).collect().toSeq
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") =!= "P")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(R.dsum(col("o_totalprice")), 4).as("sum_total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(got == want && got.nonEmpty)
    // columnar-format advantage over the text sources: the status filter
    // reaches the ORC scan as a pushed filter, and only the 4 referenced
    // columns are read
    val plan = Sources.orcOrderPriorities(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), Not(EqualTo(o_orderstatus,P))]")
      || plan.contains("Not(EqualTo(o_orderstatus,P))"), s"filter not pushed:\n$plan")
    assert(!plan.contains("o_custkey"), "column pruning lost: o_custkey read")
  }

  test("ORC events round-trip: ns checksum equals the parquet-side rollup") {
    import graft.operators.{Relational => R, Sources}
    val got = Sources.orcEventsNs(spark, sf).collect().toSeq
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("min_ts_ns"), max(col("ts")).as("max_ts_ns"),
        sum(col("ts") % 1000000000L).as("subsec_sum"),
        round(R.dsum(col("value")), 4).as("sum_value"))
      .orderBy("event_type").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("schema evolution: two file generations carry different schemas; merge accounts for all rows") {
    import graft.operators.Sources
    val dir = Sources.evolveDir(spark, sf)
    // the directory genuinely holds BOTH schemas (gen-1 has no priority col)
    val schemas = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        spark.read.parquet(f.toString).schema.fieldNames.toSet
      }.toSet
    assert(schemas.size == 2
      && schemas.exists(!_.contains("o_orderpriority"))
      && schemas.exists(_.contains("o_orderpriority")))
    val got = Sources.schemaEvolution(spark, sf).collect()
    val totalOrders = Tables.orders(spark, sf).count()
    assert(got.map(_.getLong(1)).sum == totalOrders, "merge dropped rows")
    assert(got.map(_.getString(0)).contains("LEGACY"))
    // a plain read (no mergeSchema) of the whole dir would surface only
    // one generation's schema — the union schema is merge's work
    assert(got.length > 1)
  }

  test("partition overwrite: restated year healed, other partitions untouched") {
    import graft.operators.{Relational => R, Sources}
    val got = Sources.partitionOverwrite(spark, sf).collect().toSeq
    val want = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        round(R.dsum(col("o_totalprice")), 4).as("sum_total"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_year").collect().toSeq
    assert(got == want && got.size > 1)
    // the store is genuinely partitioned by year on disk
    val dir = Sources.overwriteDir(spark, sf)
    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("o_year="))
    assert(parts == got.size)
  }

  test("purge cascade: receipt counts replay from driver-side key sets; conservation holds") {
    import spark.implicits._
    val panel = Tables.customer(spark, sf).select("c_custkey").as[Long]
      .collect().filter(_ % 53 == 1).toSet
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .as[(Long, Long)].collect()
    val purgedOrders = orders.filter(o => panel.contains(o._2)).map(_._1).toSet
    val li = Tables.lineitem(spark, sf).select("l_orderkey").as[Long].collect()
    val nCust = Tables.customer(spark, sf).count()
    val got = operators.Relational.purgeCascade(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("customer", panel.size.toLong, nCust - panel.size),
      ("lineitem", li.count(purgedOrders.contains).toLong,
        li.length - li.count(purgedOrders.contains).toLong),
      ("orders", purgedOrders.size.toLong, orders.length - purgedOrders.size.toLong)))
    assert(panel.nonEmpty && purgedOrders.nonEmpty)
  }
}
