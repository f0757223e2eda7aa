package graft.rules

import graft.config.{FieldMapping, RuleTypes, ValidationRule}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the declarative validation rules into Catalyst expressions.
  *
  * The reference interprets rules row-at-a-time in Python
  * (src/data_validator.py:106-202). Here each rule becomes a `Column`
  * producing `array<struct<FieldName,ErrorType,ErrorMessage,FieldValue>>`;
  * a row's error column is the concatenation over all fields, so the
  * whole rule set evaluates inside one whole-stage-codegen'd projection —
  * no UDFs, no per-row interpretation, fully distributed.
  *
  * Short-circuit semantics preserved from src/data_validator.py:114-127:
  *  - required + null  → single REQUIRED_FIELD_MISSING, no other rules run
  *  - optional + null  → no rules run
  *  - otherwise        → every rule runs; each contributes ≤1 error
  *
  * Error ordering inside a row is field-declaration order then rule
  * order — deterministic, matching the reference's emit order (the only
  * distributed-vs-single-node deviation is global ROW order, which the
  * sinks handle by carrying sort keys).
  */
object RuleCompiler {

  val errorStruct: StructType = StructType(Seq(
    StructField("FieldName", StringType),
    StructField("ErrorType", StringType),
    StructField("ErrorMessage", StringType),
    StructField("FieldValue", StringType)
  ))
  val errorArrayType: ArrayType = ArrayType(errorStruct, containsNull = true)

  def emptyErrors: Column = array().cast(errorArrayType)

  def errorEntry(field: Column, errType: Column, msg: Column, value: Column): Column =
    struct(
      field.as("FieldName"),
      errType.as("ErrorType"),
      msg.as("ErrorMessage"),
      // error sink stores the offending raw value as text (truncation to
      // 255 happens at the sink, reference src/etl_processor.py:134)
      coalesce(value.cast(StringType), lit("None")).as("FieldValue")
    )

  /** `array(entry)` when cond else `array()` — the unit of composition. */
  def errIf(cond: Column, field: String, errType: String, msg: Column, value: Column): Column =
    when(cond, array(errorEntry(lit(field), lit(errType), msg, value)))
      .otherwise(emptyErrors)

  /** Resolves a `lookup` rule to an "is present" predicate, given
    * (table, lookupColumn, fieldName, value). The default catalog
    * carries the reference's demo product set
    * (src/data_validator.py:197) as a literal `isin` (broadcast to every
    * task by codegen — the scale-path for big dims is the pipeline's
    * pre-joined per-(table,field) presence flag, see ValidationPipeline).
    */
  type LookupResolver = (String, String, String, Column) => Option[Column]

  val demoProducts: Seq[String] = Seq("PROD-A1", "PROD-B2", "PROD-C3", "PROD-D4")

  val defaultLookups: LookupResolver = (table, column, field, value) =>
    if (column == "ProductCode") Some(value.cast(StringType).isin(demoProducts: _*))
    else None

  /** Row-level error column for a whole mapping set. `include` filters
    * which rule types compile (parity mode passes the reference's
    * implemented set; full mode passes everything).
    */
  def compileRow(
      mappings: Seq[FieldMapping],
      lookups: LookupResolver = defaultLookups,
      include: String => Boolean = _ => true,
      columnFor: String => Column = col
  ): Column = {
    val perField = mappings.map(m => compileField(m, lookups, include, columnFor(m.sourceField)))
    if (perField.isEmpty) emptyErrors else concat(perField: _*)
  }

  def compileField(
      m: FieldMapping,
      lookups: LookupResolver,
      include: String => Boolean,
      value: Column
  ): Column = {
    val ruleErrs = {
      val compiled = m.validations
        .filter(r => include(r.ruleType))
        .flatMap(r => compileRule(m.sourceField, value, r, lookups))
      if (compiled.isEmpty) emptyErrors else concat(compiled: _*)
    }
    if (m.required) {
      val reqErr = errIf(
        lit(true), m.sourceField, "REQUIRED_FIELD_MISSING",
        lit(s"Required field '${m.sourceField}' is empty"), value)
      when(value.isNull, reqErr).otherwise(ruleErrs)
    } else {
      when(value.isNull, emptyErrors).otherwise(ruleErrs)
    }
  }

  /** One rule → Some(error-array Column); None for rule types that need
    * pipeline-level context (unique/outlier/global rules are compiled by
    * ValidationPipeline against precomputed stat/window columns).
    */
  def compileRule(
      field: String,
      value: Column,
      rule: ValidationRule,
      lookups: LookupResolver = defaultLookups
  ): Option[Column] = rule.ruleType match {

    case RuleTypes.NotNull =>
      // null OR whitespace-only (stricter than `required`;
      // reference src/data_validator.py:140-142)
      Some(errIf(
        value.isNull || trim(value.cast(StringType)) === "",
        field, "NOT_NULL", lit(s"$field cannot be null"), value))

    case RuleTypes.Range =>
      // numeric coercion failure is a DISTINCT error type
      // (reference src/data_validator.py:144-158)
      val d = value.cast(DoubleType)
      val minV = rule.param("min").map(_.toDouble)
      val maxV = rule.param("max").map(_.toDouble)
      val numericErr = errorEntry(
        lit(field), lit("NUMERIC"),
        concat(lit(s"$field='"), value.cast(StringType), lit("' is not a valid number")),
        value)
      val belowErr = minV.map(mn => when(d < mn, errorEntry(
        lit(field), lit("RANGE"),
        concat(lit(s"$field="), d.cast(StringType), lit(s" below minimum ${rule.param("min").get}")),
        value)))
      val aboveErr = maxV.map(mx => when(d > mx, errorEntry(
        lit(field), lit("RANGE"),
        concat(lit(s"$field="), d.cast(StringType), lit(s" exceeds maximum ${rule.param("max").get}")),
        value)))
      val boundErr = (belowErr, aboveErr) match {
        case (Some(b), Some(a)) => b.otherwise(a.otherwise(null).cast(errorStruct))
        case (Some(b), None)    => b.otherwise(null).cast(errorStruct)
        case (None, Some(a))    => a.otherwise(null).cast(errorStruct)
        case (None, None)       => lit(null).cast(errorStruct)
      }
      val entry = when(d.isNull, numericErr).otherwise(boundErr)
      Some(filter(array(entry), e => e.isNotNull))

    case RuleTypes.Regex =>
      rule.param("pattern").map { pattern =>
        // Python re.match anchors at the START only
        // (reference src/data_validator.py:162); rlike is an unanchored
        // search, so wrap: ^(?:pattern)
        val anchored = "^(?:" + pattern + ")"
        val desc = rule.param("description").getOrElse(s"match pattern $pattern")
        errIf(
          !value.cast(StringType).rlike(anchored),
          field, "REGEX",
          concat(lit(s"$field='"), value.cast(StringType),
            lit(s"' does not match required format: $desc")),
          value)
      }

    case RuleTypes.DateRange =>
      // parse failure is a DISTINCT error type
      // (reference src/data_validator.py:167-185)
      val ts = value.cast(TimestampType)
      val minB = rule.param("min").map(s => ts < lit(s).cast(TimestampType))
      val maxB = rule.param("max").map(s => ts > lit(s).cast(TimestampType))
      val formatErr = errorEntry(
        lit(field), lit("DATE_FORMAT"),
        concat(lit(s"$field='"), value.cast(StringType), lit("' is not a valid date")),
        value)
      val beforeErr = minB.map(c => when(c, errorEntry(
        lit(field), lit("DATE_RANGE"),
        lit(s"$field date before minimum ${rule.param("min").get}"), value)))
      val afterErr = maxB.map(c => when(c, errorEntry(
        lit(field), lit("DATE_RANGE"),
        lit(s"$field date after maximum ${rule.param("max").get}"), value)))
      val boundErr = (beforeErr, afterErr) match {
        case (Some(b), Some(a)) => b.otherwise(a.otherwise(null).cast(errorStruct))
        case (Some(b), None)    => b.otherwise(null).cast(errorStruct)
        case (None, Some(a))    => a.otherwise(null).cast(errorStruct)
        case (None, None)       => lit(null).cast(errorStruct)
      }
      val entry = when(ts.isNull, formatErr).otherwise(boundErr)
      Some(filter(array(entry), e => e.isNotNull))

    case RuleTypes.Lookup =>
      val table = rule.param("table").getOrElse("")
      val column = rule.param("column").getOrElse("")
      lookups(table, column, field, value).map { present =>
        errIf(
          !present, field, "LOOKUP",
          concat(lit(s"$field='"), value.cast(StringType), lit(s"' not found in $table")),
          value)
      }

    // unique / outlier_detection need dataset-global context; compiled by
    // the pipeline (window / two-pass agg). Unknown rule types are
    // silently skipped, matching the reference's if/elif fall-through
    // (src/data_validator.py:137-202).
    case _ => None
  }
}
