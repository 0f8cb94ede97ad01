package graft.operators

import org.apache.spark.sql.DataFrame

/** A24: cross-table schema set-comparison
  * (`scripts/inspect_schemas.py:40-70`) — which columns are shared by
  * all tables, and which are unique to each. Driver-side metadata only
  * (schemas come from parquet footers, no data scan). */
object SchemaCompare {

  final case class Report(common: Set[String],
                          onlyIn: Map[String, Set[String]],
                          all: Set[String])

  def compare(tables: Map[String, DataFrame]): Report = {
    val sets = tables.map { case (n, df) => n -> df.schema.fieldNames.toSet }
    val common = if (sets.isEmpty) Set.empty[String] else sets.values.reduce(_ intersect _)
    val all = if (sets.isEmpty) Set.empty[String] else sets.values.reduce(_ union _)
    val onlyIn = sets.map { case (n, s) =>
      n -> (s -- sets.filter(_._1 != n).values.foldLeft(Set.empty[String])(_ union _))
    }
    Report(common, onlyIn, all)
  }
}
