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

  test("salted join equals the plain fact-fact join") {
    val plain = Relational.joinFactFact(spark, sf).collect().toSeq
    val salted = Relational.joinFactFactSalted(spark, sf).collect().toSeq
    assert(plain == salted)
  }
}
