package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lpad, rpad, rtrim,
  substring, trim}
import org.apache.spark.sql.types.DataType

/** Fixed-width text feeds — the mainframe/EDI ingest format Spark has
  * no native source for (COBOL copybook exports, bank/telco batch
  * feeds): every record is one line, every column a fixed [start, len)
  * byte slice, no delimiters to quote or escape. Built as a thin layer
  * over the TEXT source so the heavy machinery is the engine's own:
  * `spark.read.text` splits and distributes the files, and the slicing
  * compiles to `substring`+`trim`+`cast` column expressions — fully
  * codegen'd, zero UDFs, predicate pushdown on the derived columns
  * happening wherever Catalyst can fold it. Schema is EXPLICIT by
  * construction (the copybook IS the schema) — consistent with the
  * house rule that inference passes are never free at 100 TB.
  *
  * Numeric columns are written right-aligned space-padded and read via
  * trim+cast (blank → NULL, the SQL cast convention); strings are
  * left-aligned and right-trimmed, so a trailing-space-significant
  * field needs a wider spec, documented rather than guessed.
  */
object FixedWidth {

  /** One column: `name`, 1-based `start`, byte `len`, target type. */
  final case class Col(name: String, start: Int, len: Int, dt: DataType)

  /** Read `dir` (text files) under the fixed-width `spec`. Strings are
    * RIGHT-trimmed only — left-aligned is the write contract, so
    * leading spaces inside the slot are significant data and round-trip
    * intact; numerics (right-aligned, space-padded on the left) trim
    * both ends before the cast.
    */
  def read(spark: SparkSession, dir: String, spec: Seq[Col]): DataFrame = {
    require(spec.nonEmpty)
    spark.read.text(dir).select(spec.map { c =>
      val slice = substring(col("value"), c.start, c.len)
      val cleaned =
        if (c.dt.typeName == "string") rtrim(slice) else trim(slice)
      cleaned.cast(c.dt).as(c.name)
    }: _*)
  }

  /** Render `df`'s columns into one fixed-width line per row under
    * `spec` (order and widths authoritative): strings left-aligned /
    * right-padded, everything else right-aligned / left-padded. A
    * value wider than its slot would silently corrupt EVERY later
    * column's offsets, so overflow is checked in-plan (cast error,
    * never a misparse downstream).
    */
  def lines(df: DataFrame, spec: Seq[Col]): DataFrame = {
    val parts: Seq[Column] = spec.map { c =>
      val s = col(c.name).cast("string")
      val padded =
        if (c.dt.typeName == "string") rpad(s, c.len, " ")
        else lpad(s, c.len, " ")
      // overflow guard: lpad/rpad TRUNCATE past len — corrupting the
      // record silently — so refuse wide values loudly
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.length(s) > c.len,
        org.apache.spark.sql.functions.raise_error(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit(
              s"fixed-width overflow in ${c.name}: "), s)))
        .otherwise(padded)
    }
    df.select(concat(parts: _*).as("value"))
  }

  /** Write `df` at `dir` as fixed-width text under `spec`. */
  def write(df: DataFrame, dir: String, spec: Seq[Col]): Unit =
    lines(df, spec).write.mode("overwrite").text(dir)
}
