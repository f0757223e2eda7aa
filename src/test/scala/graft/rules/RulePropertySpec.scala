package graft.rules

import graft.SparkTestBase
import graft.config.{FieldMapping, ValidationRule}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.3): the compiler is total over arbitrary
  * rule params, and the split is a true partition of the input.
  * Uses raw ScalaCheck generators with fixed seeds (the scalatestplus
  * bridge isn't on the offline classpath).
  */
class RulePropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.chooseNum(-1e6, 1e6).map(_.toString),
    Gen.const(""), Gen.const("  "), Gen.const(null: String),
    Gen.const("2024-02-15 08:30:00"), Gen.const("not-a-date"))

  private val ruleGen: Gen[ValidationRule] = Gen.oneOf(
    Gen.zip(Gen.chooseNum(-100.0, 0.0), Gen.chooseNum(0.0, 100.0)).map {
      case (mn, mx) => ValidationRule("range", Map("min" -> mn.toString, "max" -> mx.toString)) },
    Gen.const(ValidationRule("not_null", Map.empty)),
    Gen.const(ValidationRule("regex", Map("pattern" -> "^[A-Z]{2}[0-9]+$"))),
    Gen.const(ValidationRule("date_range", Map("min" -> "2000-01-01", "max" -> "2030-01-01"))),
    Gen.const(ValidationRule("lookup", Map("table" -> "T", "column" -> "ProductCode"))))

  test("compiler is total: any (rule, required, values) combination evaluates") {
    for (i <- 0 until 10) {
      val rules = samples(ruleGen, 3)
      val required = i % 2 == 0
      val values = samples(valueGen, 8)
      val m = FieldMapping("v", "V", "varchar(20)", required, rules)
      val out = values.toDF("v")
        .withColumn("errs", RuleCompiler.compileField(
          m, RuleCompiler.defaultLookups, _ => true, col("v")))
        .select(size(col("errs"))).collect()
      assert(out.length == values.length)
      assert(out.forall(_.getInt(0) >= 0))
    }
  }

  test("valid/invalid split partitions the input exactly") {
    val values = samples(valueGen, 60)
    val m = FieldMapping("v", "V", "decimal(10,2)", required = true, Seq(
      ValidationRule("not_null", Map.empty),
      ValidationRule("range", Map("min" -> "0", "max" -> "100"))))
    val df = values.toDF("v")
      .withColumn("errs", RuleCompiler.compileField(
        m, RuleCompiler.defaultLookups, _ => true, col("v")))
    val total = df.count()
    val valid = df.filter(size(col("errs")) === 0).count()
    val invalid = df.filter(size(col("errs")) > 0).count()
    assert(valid + invalid == total)
    assert(total == values.length)
  }

  test("required+null always yields exactly the REQUIRED_FIELD_MISSING error") {
    for (i <- 0 until 10) {
      val rules = samples(ruleGen, 3)
      val m = FieldMapping("v", "V", "varchar(20)", required = true, rules)
      val out = Seq(null.asInstanceOf[String]).toDF("v")
        .withColumn("errs", RuleCompiler.compileField(
          m, RuleCompiler.defaultLookups, _ => true, col("v")))
        .select(col("errs.ErrorType")).collect()(0).getSeq[String](0)
      assert(out == Seq("REQUIRED_FIELD_MISSING"))
    }
  }

  test("duplicate-group detection is permutation-invariant") {
    val base = Seq("k1", "k1", "k2", "k3", "k3", "k3", "k4")
    val perms = Seq(base, base.reverse, scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(base))
    val results = perms.map { p =>
      graft.operators.Dedup.exactDupGroups(p.toDF("k"), Seq("k"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(results.forall(_ == results.head))
    assert(results.head == Set(("k1", 2L), ("k3", 3L)))
  }
}
