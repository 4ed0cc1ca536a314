package graft.ml

import graft.dedup.{Comparators, DedupConfig, Feature}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter for the reference's Febrl CSV fixtures (FIXTURES.md §1): schema,
  * blocking + comparator config, and ground-truth labeling — the full
  * GenerateLabeledPoints semantics on the original data.
  *
  * Column roles mirror `/root/reference/.../impl/Compare.scala:19-37`:
  * ten Levenshtein columns, SqrtDiff on date_of_birth, AbsDiff on age,
  * rec_id / blocking_number ignored (constant 0.0 keeps the 14-feature
  * arity). Blocking: ordinal 1 = blocking_number, ordinal 2 = state
  * (`Util.scala:45-58`). Ground truth: `rec-<n>-org` / `rec-<n>-dup-<i>`
  * match on the middle token (`Util.scala:26-43`).
  */
object Febrl {

  val columns: Seq[String] = Seq(
    "rec_id", "given_name", "surname", "street_number", "address_1",
    "address_2", "suburb", "postcode", "state", "date_of_birth", "age",
    "phone_number", "soc_sec_id", "blocking_number")

  val schema: StructType =
    StructType(columns.map(c => StructField(c, StringType, nullable = true)))

  /** Quote-unaware read matching the reference's naive split on ','
    * (`Util.scala:14-18`): quoting is disabled via a NUL quote char. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\u0000")
      .csv(path)

  /** Label from the id pair: middle token equality ⇒ 1.0 else 0.0. */
  private def label(id1: org.apache.spark.sql.Column, id2: org.apache.spark.sql.Column) =
    when(split(trim(id1), "-").getItem(1) === split(trim(id2), "-").getItem(1), 1.0)
      .otherwise(0.0)

  /** Per-column comparators in schema position order (Compare.scala:35-37). */
  private val comparators: Seq[(String, (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)] =
    Seq(
      "rec_id" -> ((_: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column) => Comparators.ignore),
      "given_name" -> (Comparators.levSim _),
      "surname" -> (Comparators.levSim _),
      "street_number" -> (Comparators.levSim _),
      "address_1" -> (Comparators.levSim _),
      "address_2" -> (Comparators.levSim _),
      "suburb" -> (Comparators.levSim _),
      "postcode" -> (Comparators.levSim _),
      "state" -> (Comparators.levSim _),
      "date_of_birth" -> (Comparators.sqrtDiff _),
      "age" -> (Comparators.absDiff _),
      "phone_number" -> (Comparators.levSim _),
      "soc_sec_id" -> (Comparators.levSim _),
      "blocking_number" -> ((_: org.apache.spark.sql.Column, _: org.apache.spark.sql.Column) => Comparators.ignore))

  /** The reference job's full config: 14 features in schema order. */
  val config: DedupConfig = DedupConfig(
    idColumn = "rec_id",
    blockingKeys = Seq(col("blocking_number"), col("state")),
    features = comparators.map { case (c, cmp) => Feature(s"f_$c", c, cmp) },
    label = Some(label))

  /** Feature column names in the reference's positional order. */
  val featureCols: Seq[String] = comparators.map { case (c, _) => s"f_$c" }
}
