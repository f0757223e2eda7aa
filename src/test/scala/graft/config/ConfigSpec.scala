package graft.config

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trips the test mapping config (grammar per the reference's
  * config/mapping_config.xml) and checks the schema builder mapping.
  */
class ConfigSpec extends AnyFunSuite {

  private lazy val cfg: IntegrationConfig = {
    val url = getClass.getResource("/mapping_config.xml")
    XmlConfigParser.parseFile(url.getPath)
  }

  test("source/target/etl blocks parse") {
    assert(cfg.source.name == "ProductionLine")
    assert(cfg.source.filePath == "data/raw/production_data_*.csv")
    assert(cfg.source.delimiter == ",")
    assert(cfg.source.hasHeader)
    assert(cfg.target.targetTable == "Production.QualityData")
    assert(cfg.etl.batchSize == 1000)
    assert(cfg.etl.errorHandling == "continue")
    assert(cfg.etl.archiveProcessedFiles)
  }

  test("all 9 field mappings with types, requiredness, targets") {
    assert(cfg.fieldMappings.size == 9)
    val byName = cfg.fieldMappings.map(m => m.sourceField -> m).toMap
    assert(byName("timestamp").targetField == "RecordTimestamp")
    assert(byName("timestamp").dataType == "datetime")
    assert(byName("timestamp").required)
    assert(byName("humidity_pct").required == false)
    assert(byName("defect_count").dataType == "int")
    // field order is declaration order (drives error-array ordering)
    assert(cfg.fieldMappings.map(_.sourceField) == Seq(
      "timestamp", "line_id", "batch_number", "product_code",
      "temperature_c", "pressure_kpa", "humidity_pct", "operator_id",
      "defect_count"))
  }

  test("rules carry params, including declared-only rules") {
    val byName = cfg.fieldMappings.map(m => m.sourceField -> m).toMap
    val tsRules = byName("timestamp").validations
    assert(tsRules.map(_.ruleType) == Seq("not_null", "date_range"))
    assert(tsRules(1).param("min").contains("2020-01-01"))
    assert(tsRules(1).param("max").contains("2099-12-31"))

    val batch = byName("batch_number").validations
    assert(batch.exists(r => r.ruleType == "unique" && r.param("scope").contains("daily")))

    val temp = byName("temperature_c").validations
    val outlier = temp.find(_.ruleType == "outlier_detection").get
    assert(outlier.param("method").contains("zscore"))
    assert(outlier.doubleParam("threshold").contains(3.0))

    val lookup = byName("product_code").validations.find(_.ruleType == "lookup").get
    assert(lookup.param("table").contains("Production.Products"))
    assert(lookup.param("column").contains("ProductCode"))

    val regex = byName("line_id").validations.find(_.ruleType == "regex").get
    assert(regex.param("pattern").contains("^LINE[0-9]{3}$"))
    assert(regex.param("description").contains("Format: LINE001"))
  }

  test("global validations parse with params") {
    assert(cfg.globalValidations.size == 2)
    val dup = cfg.globalValidations.find(_.ruleType == "duplicate_check").get
    assert(dup.parameters("fields") == "timestamp,line_id,batch_number")
    val ri = cfg.globalValidations.find(_.ruleType == "referential_integrity").get
    assert(ri.parameters("foreignTable") == "Production.Operators")
    assert(ri.parameters("foreignKey") == "operator_id")
  }

  test("schema builder: declared types -> Spark types") {
    assert(SchemaBuilder.sparkType("datetime") == TimestampType)
    assert(SchemaBuilder.sparkType("varchar(10)") == StringType)
    assert(SchemaBuilder.sparkType("decimal(5,2)") == DecimalType(5, 2))
    assert(SchemaBuilder.sparkType("decimal(6, 2)") == DecimalType(6, 2))
    assert(SchemaBuilder.sparkType("int") == IntegerType)
    assert(SchemaBuilder.sparkType("bigint") == LongType)
    assert(SchemaBuilder.sparkType("double") == DoubleType)
    assertThrows[IllegalArgumentException](SchemaBuilder.sparkType("geometry"))
  }

  test("raw schema is all-nullable strings; typed schema honors declared types") {
    val raw = SchemaBuilder.rawSchema(cfg.fieldMappings)
    assert(raw.fields.forall(f => f.dataType == StringType && f.nullable))
    assert(raw.fieldNames.toSeq == cfg.fieldMappings.map(_.sourceField))

    val typed = SchemaBuilder.typedSchema(cfg.fieldMappings)
    assert(typed("timestamp").dataType == TimestampType)
    assert(typed("temperature_c").dataType == DecimalType(5, 2))
    assert(typed("humidity_pct").nullable)
    assert(!typed("timestamp").nullable)

    val target = SchemaBuilder.targetSchema(cfg.fieldMappings)
    assert(target.fieldNames.head == "RecordTimestamp")
  }

  test("doctype declarations are rejected (hardened parser)") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE foo [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
        |<DataIntegrationConfig/>""".stripMargin
    assertThrows[Exception](XmlConfigParser.parseString(evil))
  }
}
