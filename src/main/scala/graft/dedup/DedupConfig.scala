package graft.dedup

import org.apache.spark.sql.Column

/** One similarity feature: compare `column` of the two tuples with `cmp`,
  * emit as `name`. Mirrors the reference's per-column comparator table
  * (`/root/reference/.../impl/Compare.scala:35-37`) but as typed config
  * instead of hard-coded positions.
  */
final case class Feature(name: String, column: String, cmp: (Column, Column) => Column)

/** Typed replacement for the reference's four code-level customization
  * points (`/root/reference/.../impl/Util.scala:1-7`): id projection,
  * blocking-key expressions (priority order — ordinal = index+1), and the
  * per-column comparators. `label` optionally derives ground truth from the
  * two ids (reference `Util.getLabel`, Util.scala:26-43).
  */
final case class DedupConfig(
    idColumn: String,
    blockingKeys: Seq[Column],
    features: Seq[Feature],
    label: Option[(Column, Column) => Column] = None)
