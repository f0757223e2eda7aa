package graft.config

/** Config object model for the declarative validation "query language".
  *
  * Mirrors the grammar of the reference's XML mapping config
  * (reference: config/mapping_config.xml:1-72, parsed into dataclasses at
  * src/xml_parser.py:12-62). The XML config IS the query surface: field
  * mappings declare a projection (source→target rename + type) and each
  * nested `<Validation>` element declares a per-row or global predicate
  * operator. Declared-only rules the reference silently skips
  * (`unique`, `outlier_detection`, `referential_integrity`) are part of
  * the grammar here and are compiled by [[graft.rules.RuleCompiler]].
  */
final case class ValidationRule(
    ruleType: String,
    parameters: Map[String, String]
) {
  def param(key: String): Option[String] = parameters.get(key)
  def doubleParam(key: String): Option[Double] =
    parameters.get(key).flatMap(s => scala.util.Try(s.toDouble).toOption)
}

/** One field of the mapping: CSV source column → SQL target column with a
  * declared type, requiredness, and an ordered list of validation rules.
  * (reference: src/xml_parser.py:22-36; config/mapping_config.xml:14-59)
  */
final case class FieldMapping(
    sourceField: String,
    targetField: String,
    dataType: String,
    required: Boolean,
    validations: Seq[ValidationRule]
)

/** Global (cross-row) validations: duplicate_check / referential_integrity.
  * (reference: config/mapping_config.xml:61-64; src/xml_parser.py parses
  * these as raw attribute dicts)
  */
final case class GlobalValidation(
    ruleType: String,
    parameters: Map[String, String]
)

/** Source system block (reference: config/mapping_config.xml:3-7). */
final case class SourceConfig(
    name: String,
    filePath: String,
    delimiter: String,
    hasHeader: Boolean
)

/** Target system block (reference: config/mapping_config.xml:9-12). */
final case class TargetConfig(
    name: String,
    connectionString: String,
    targetTable: String
)

/** ETL behavior flags (reference: config/mapping_config.xml:66-71).
  * `errorHandling` is "continue" | "abort"; `archiveProcessedFiles`
  * gates the driver-side file move.
  */
final case class EtlConfig(
    batchSize: Int,
    errorHandling: String,
    logLevel: String,
    archiveProcessedFiles: Boolean
)

/** The whole parsed config document. */
final case class IntegrationConfig(
    source: SourceConfig,
    target: TargetConfig,
    fieldMappings: Seq[FieldMapping],
    globalValidations: Seq[GlobalValidation],
    etl: EtlConfig
)

object RuleTypes {
  // Row-level rules with handlers in the reference engine
  // (src/data_validator.py:137-202)
  val NotNull = "not_null"
  val Range = "range"
  val Regex = "regex"
  val DateRange = "date_range"
  val Lookup = "lookup"
  // Declared-only in the reference (grammar accepts, engine skips);
  // first-class here.
  val Unique = "unique"
  val OutlierDetection = "outlier_detection"
  // Global rules (config/mapping_config.xml:61-64)
  val DuplicateCheck = "duplicate_check"
  val ReferentialIntegrity = "referential_integrity"

  /** Rules the reference engine actually executes — used by the pipeline's
    * parity mode to reproduce the reference verdicts exactly.
    */
  val ReferenceImplementedRow: Set[String] =
    Set(NotNull, Range, Regex, DateRange, Lookup)
  val ReferenceImplementedGlobal: Set[String] = Set(DuplicateCheck)
}
