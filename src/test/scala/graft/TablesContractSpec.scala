package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-contract tripwire for the whole testdata surface (round-8 lesson:
  * the driver regenerated events.parquet with a different timestamp
  * encoding between rounds and silently broke 30 queries — VERDICT r7).
  * This spec asserts, per table, the COLUMN NAMES the engine's operators
  * key on and the type FAMILY of each (exact types where the engine
  * depends on them, families where loaders normalize). When the next
  * regeneration moves a column, the failure names the table and column
  * here instead of surfacing as 30 AnalysisExceptions spread over nine
  * suites.
  *
  * Deliberately NOT asserted: row counts, value distributions, parquet
  * physical encodings — those may drift freely; `Tables` loaders must
  * absorb them (EventsContractSpec proves that for the one encoding that
  * has already drifted).
  */
class TablesContractSpec extends SparkSpec {

  private def isIntegral(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType || dt == ShortType

  private def isTimestampLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == LongType || dt == DateType

  private def checkCols(table: String, cols: (String, DataType => Boolean)*): Unit = {
    val schema = Tables.t(spark, sf, table).schema
    cols.foreach { case (name, ok) =>
      val f = schema.fields.find(_.name == name)
      assert(f.isDefined, s"$table: column '$name' missing — schema is ${schema.simpleString}")
      assert(ok(f.get.dataType),
        s"$table.$name: unexpected type ${f.get.dataType.simpleString} — " +
          "a loader/operator keyed on this column needs updating")
    }
  }

  test("TPC-H-ish tables carry the keys and measures the relational operators join on") {
    checkCols("region", "r_regionkey" -> isIntegral, "r_name" -> (_ == StringType))
    checkCols("nation", "n_nationkey" -> isIntegral, "n_name" -> (_ == StringType),
      "n_regionkey" -> isIntegral)
    checkCols("customer", "c_custkey" -> isIntegral, "c_nationkey" -> isIntegral,
      "c_acctbal" -> (_ == DoubleType), "c_mktsegment" -> (_ == StringType))
    checkCols("supplier", "s_suppkey" -> isIntegral, "s_nationkey" -> isIntegral,
      "s_acctbal" -> (_ == DoubleType))
    checkCols("part", "p_partkey" -> isIntegral, "p_brand" -> (_ == StringType),
      "p_size" -> isIntegral, "p_retailprice" -> (_ == DoubleType))
    checkCols("orders", "o_orderkey" -> isIntegral, "o_custkey" -> isIntegral,
      "o_orderstatus" -> (_ == StringType), "o_totalprice" -> (_ == DoubleType),
      "o_orderdate" -> isTimestampLike, "o_orderpriority" -> (_ == StringType))
    checkCols("lineitem", "l_orderkey" -> isIntegral, "l_partkey" -> isIntegral,
      "l_suppkey" -> isIntegral, "l_linenumber" -> isIntegral,
      "l_quantity" -> (_ == DoubleType), "l_extendedprice" -> (_ == DoubleType),
      "l_discount" -> (_ == DoubleType), "l_tax" -> (_ == DoubleType),
      "l_returnflag" -> (_ == StringType), "l_linestatus" -> (_ == StringType),
      "l_shipdate" -> isTimestampLike)
  }

  test("events carries the raw columns the canonical loader normalizes") {
    checkCols("events", "event_id" -> isIntegral, "ts" -> isTimestampLike,
      "user_id" -> isIntegral, "event_type" -> (_ == StringType),
      "value" -> (_ == DoubleType), "props" -> (_ == StringType))
  }

  test("documents carries the text-pipeline columns") {
    checkCols("documents", "doc_id" -> isIntegral, "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> isIntegral)
  }

  test("documents text is pure ASCII — the q_media_features byte-mean oracle keys on it") {
    // the oracle recomputes the UTF-8 byte mean as the mean of per-char
    // codepoints, which only coincide when every char is single-byte; a
    // regenerated corpus with non-ASCII text must fail HERE by name
    val nonAscii = Tables.documents(spark, sf)
      .filter(octet_length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text — the q_media_features oracle's " +
        "codepoint-as-byte identity no longer holds; switch it to a binary-side recompute")
  }

  test("embeddings: 64-dim float vectors — the ANN plane family is sized to this") {
    checkCols("embeddings", "vec_id" -> isIntegral,
      "embedding" -> {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      },
      "label" -> isIntegral)
    // the md5 hyperplane literals (annTopK, tight-τ signatures) and every
    // dot-product kernel assume exactly 64 components; a regenerated
    // corpus with a different width must fail HERE by name
    val dims = Tables.embeddings(spark, sf)
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(64),
      s"embedding dimensionality changed to $dims — regenerate the 64-wide plane " +
        "literals in Similarity (planeWeightFamily callers) before trusting ANN results")
  }

  test("documents and embeddings stay row-aligned (doc_id = vec_id join contract)") {
    val d = Tables.documents(spark, sf).select(col("doc_id").as("id"))
    val e = Tables.embeddings(spark, sf).select(col("vec_id").as("id"))
    assert(d.count() == e.count(),
      "documents/embeddings cardinality diverged — multimodal joins assume alignment")
    assert(d.exceptAll(e).count() == 0 && e.exceptAll(d).count() == 0,
      "doc_id/vec_id sets diverged — multimodal joins assume alignment")
  }
}
