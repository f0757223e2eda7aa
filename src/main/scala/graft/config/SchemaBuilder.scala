package graft.config

import org.apache.spark.sql.types._

/** Builds explicit Spark schemas from the field mappings.
  *
  * The reference infers types with pandas (src/etl_processor.py:197 —
  * `pd.read_csv` with no dtype); at 100 TB inference costs an extra full
  * scan, so we declare the schema. Two schemas exist:
  *
  *  - [[rawSchema]]: every source column as nullable StringType. The
  *    validation rules operate on the RAW text (a malformed number must
  *    produce a NUMERIC error carrying the original string, matching
  *    src/data_validator.py:156-158 — a typed read would null it out
  *    before the rule could see it).
  *  - [[typedSchema]]: declared `dataType` strings → Spark types, used by
  *    the valid-rows sink projection after validation.
  *
  * Type mapping per SURVEY.md §1.3: `varchar(n)` → StringType (length is
  * a validation concern), `decimal(p,s)` → DecimalType, `int` →
  * IntegerType, `datetime` → TimestampType.
  */
object SchemaBuilder {

  private val VarcharRe = """(?i)varchar\((\d+)\)""".r
  private val DecimalRe = """(?i)decimal\((\d+)\s*,\s*(\d+)\)""".r

  def sparkType(declared: String): DataType = declared.trim match {
    case VarcharRe(_)       => StringType
    case DecimalRe(p, s)    => DecimalType(p.toInt, s.toInt)
    case t if t.equalsIgnoreCase("int") || t.equalsIgnoreCase("integer") =>
      IntegerType
    case t if t.equalsIgnoreCase("bigint")   => LongType
    case t if t.equalsIgnoreCase("datetime") => TimestampType
    case t if t.equalsIgnoreCase("date")     => DateType
    case t if t.equalsIgnoreCase("float") || t.equalsIgnoreCase("double") =>
      DoubleType
    case t if t.equalsIgnoreCase("varchar") || t.equalsIgnoreCase("string") ||
        t.equalsIgnoreCase("text") => StringType
    case other =>
      throw new IllegalArgumentException(s"unsupported dataType '$other'")
  }

  /** All-string read schema: rules see raw CSV text. Always nullable —
    * requiredness is a validation rule, not a read-time constraint (a
    * non-nullable read would crash the scan instead of routing the row
    * to the error sink).
    */
  def rawSchema(mappings: Seq[FieldMapping]): StructType =
    StructType(mappings.map(m => StructField(m.sourceField, StringType, nullable = true)))

  /** Declared-type schema keyed by SOURCE column names (pre-rename). */
  def typedSchema(mappings: Seq[FieldMapping]): StructType =
    StructType(mappings.map(m =>
      StructField(m.sourceField, sparkType(m.dataType), nullable = !m.required)
    ))

  /** Declared-type schema keyed by TARGET column names (post-rename). */
  def targetSchema(mappings: Seq[FieldMapping]): StructType =
    StructType(mappings.map(m =>
      StructField(m.targetField, sparkType(m.dataType), nullable = !m.required)
    ))
}
