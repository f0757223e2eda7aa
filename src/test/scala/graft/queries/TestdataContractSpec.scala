package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.types._

/** Pins the REAL testdata physical schemas the catalog depends on —
  * the generalization of EventsContractSpec (the r10 postmortem: a
  * silent physical-type flip in regenerated testdata broke six
  * CORRECTNESS entries while `sbt test` stayed green, because no spec
  * read the actual files). events.parquet has its own dedicated spec;
  * this one covers the other tables whose types the engine's math
  * assumes:
  *
  *  - documents: every text kernel (shingles, ngrams, BPE, windows)
  *    consumes `text` as a string and `doc_id` as int64; the mixing /
  *    sampling operators do 64-bit integer arithmetic on `n_chars`.
  *  - embeddings: every vector kernel is compiled for array<float>
  *    (a silent float→double flip would change cosine bit-patterns
  *    and every hash-verified ANN/LSH golden).
  *  - lineitem/orders: the rule compiler casts `l_shipdate` /
  *    `o_orderdate` via timestamp semantics, and the decimal-audited
  *    aggregates assume double inputs.
  *
  * A regeneration that shifts any of these fails HERE, loudly, before
  * the driver's oracle run turns it into a silent wrong answer.
  */
class TestdataContractSpec extends SparkTestBase {

  private def schemaOf(table: String): StructType =
    spark.read.parquet(s"$sfDir/$table.parquet").schema

  private def assertField(s: StructType, name: String, dt: DataType): Unit = {
    assert(s.fieldNames.contains(name),
      s"column '$name' missing — testdata regenerated with a new shape; " +
        "audit every catalog entry that reads it")
    assert(s(name).dataType == dt,
      s"column '$name' is ${s(name).dataType}, engine assumes $dt — " +
        "physical-type flip in regenerated testdata (r10 postmortem class)")
  }

  test("documents.parquet: id/text/lang/source/n_chars physical types") {
    val s = schemaOf("documents")
    assertField(s, "doc_id", LongType)
    assertField(s, "text", StringType)
    assertField(s, "lang", StringType)
    assertField(s, "source", StringType)
    assertField(s, "n_chars", LongType)
  }

  test("embeddings.parquet: vec_id int64 + embedding array<float>") {
    val s = schemaOf("embeddings")
    assertField(s, "vec_id", LongType)
    assertField(s, "embedding", ArrayType(FloatType, containsNull = true))
  }

  test("lineitem.parquet: rule-compiler input types") {
    val s = schemaOf("lineitem")
    assertField(s, "l_orderkey", LongType)
    assertField(s, "l_quantity", DoubleType)
    assertField(s, "l_discount", DoubleType)
    assertField(s, "l_extendedprice", DoubleType)
    assertField(s, "l_returnflag", StringType)
    val ship = s("l_shipdate").dataType
    assert(ship == TimestampType || ship == TimestampNTZType || ship == DateType,
      s"l_shipdate is $ship — date_range rule casts assume date/timestamp semantics")
  }

  test("orders.parquet: join-key and date types") {
    val s = schemaOf("orders")
    assertField(s, "o_orderkey", LongType)
    assertField(s, "o_custkey", LongType)
    assertField(s, "o_totalprice", DoubleType)
    val od = s("o_orderdate").dataType
    assert(od == TimestampType || od == TimestampNTZType || od == DateType,
      s"o_orderdate is $od — date arithmetic assumes date/timestamp semantics")
  }

  test("every catalog table exists at every SF with rows") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         tbl <- Seq("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"/root/testdata/$sf/$tbl.parquet")
      assert(!df.isEmpty, s"$sf/$tbl.parquet is empty")
    }
  }
}
