package graft.model

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The metadata catalog: facts + dimensions.
  *
  * Replaces the reference's `facts`/`dimensions` catalog tables
  * (`postgres/schema.clj:70-105`) and their EDN-encoded columns
  * (`postgres/schema.clj:140-141`) with typed driver-side maps plus
  * optional Parquet persistence. Catalog metadata is tiny (hundreds of
  * rows at most) — it lives on the driver and is broadcast implicitly as
  * literals inside query plans; it never shuffles.
  *
  * Validation semantics follow the reference service layer:
  *  - grouping parents must already exist (`postgres.clj:32-40`)
  *  - `update-dimension!` requires the fact to exist (`postgres.clj:42-47`)
  */
final class Catalog {
  private val factMap = TrieMap.empty[String, FactDef]
  private val dimMap = TrieMap.empty[String, DimensionDef]

  /** O3 define-fact! — api.clj:5-6, postgres/schema.clj:114-128. */
  def defineFact(f: FactDef): FactDef = { factMap.put(f.id, f); f }

  /** O4 define-dimension! — api.clj:8-9, postgres.clj:32-40.
    * Validates that every dimension named in a grouping path exists. */
  def defineDimension(d: DimensionDef): DimensionDef = {
    val missing = d.groupedBy.flatten.distinct.filterNot(dimMap.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Some specified dimensions to group-by do not exist on: ${missing.mkString(", ")}")
    dimMap.put(d.id, d)
    d
  }

  /** O5 update-dimension! — api.clj:11-12, postgres.clj:42-47. */
  def updateDimension(dimId: String, factId: String): DimensionDef = {
    if (!factMap.contains(factId))
      throw new IllegalArgumentException(s"Fact $factId is not defined")
    val d = dimMap.getOrElse(dimId,
      throw new IllegalArgumentException(s"Dimension $dimId is not defined"))
    val updated = d.copy(facts = d.facts + factId)
    dimMap.put(dimId, updated)
    updated
  }

  /** O6 catalog reads — api.clj:14-21. */
  def facts: Seq[FactDef] = factMap.values.toSeq.sortBy(_.id)
  def fact(id: String): Option[FactDef] = factMap.get(id)
  def dimensions: Seq[DimensionDef] = dimMap.values.toSeq.sortBy(_.id)
  def dimension(id: String): Option[DimensionDef] = dimMap.get(id)

  /** O2 drop-schema! — clears catalog state (storage cleanup is the
    * owner's concern; the engine owns only paths it wrote). */
  def drop(): Unit = { factMap.clear(); dimMap.clear() }

  private[model] def putDimensionUnchecked(d: DimensionDef): Unit =
    dimMap.put(d.id, d)

  /** Persist both catalogs as Parquet under `path` (facts/, dimensions/).
    * Replaces the reference's catalog tables (O1 init-schema!). */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    factMap.values.toSeq
      .map(f => (f.id, f.ftype.name, f.sliceMinutes, f.name, f.filler,
        f.units, f.start, f.end, f.step))
      .toDF("id", "ftype", "slice", "name", "filler", "units", "start", "end", "step")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/facts")
    dimMap.values.toSeq
      .map(d => (d.id, d.name, d.sliceMinutes, d.size, d.groupOnly,
        d.groupedBy.map(_.toArray).toArray, d.facts.toArray.sorted))
      .toDF("id", "name", "slice", "size", "group_only", "grouped_by", "facts")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/dimensions")
  }

  def factsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    facts.map(f => (f.id, f.ftype.name, f.sliceMinutes, f.name, f.filler,
      f.units, f.start, f.end, f.step))
      .toDF("id", "ftype", "slice", "name", "filler", "units", "start", "end", "step")
  }

  def dimensionsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    dimensions.map(d => (d.id, d.name, d.sliceMinutes, d.size, d.groupOnly,
      d.groupedBy.map(_.toArray).toArray, d.facts.toArray.sorted))
      .toDF("id", "name", "slice", "size", "group_only", "grouped_by", "facts")
  }
}

object Catalog {
  /** Load a catalog previously written by [[Catalog.save]]. */
  def load(spark: SparkSession, path: String): Catalog = {
    val c = new Catalog
    spark.read.parquet(s"$path/facts").collect().foreach { r =>
      c.defineFact(FactDef(
        id = r.getAs[String]("id"),
        ftype = FactType.parse(r.getAs[String]("ftype")),
        sliceMinutes = r.getAs[Int]("slice"),
        name = Option(r.getAs[String]("name")),
        filler = r.getAs[Long]("filler"),
        units = r.getAs[String]("units"),
        start = Option(r.getAs[java.lang.Long]("start")).map(_.longValue),
        end = Option(r.getAs[java.lang.Long]("end")).map(_.longValue),
        step = Option(r.getAs[java.lang.Long]("step")).map(_.longValue)))
    }
    // Parents may sort after children; insert without validation, in order.
    val rows = spark.read.parquet(s"$path/dimensions").collect()
    rows.foreach { r =>
      val d = DimensionDef(
        id = r.getAs[String]("id"),
        name = Option(r.getAs[String]("name")),
        sliceMinutes = Option(r.getAs[java.lang.Integer]("slice")).map(_.intValue),
        size = r.getAs[Int]("size"),
        groupOnly = r.getAs[Boolean]("group_only"),
        groupedBy = r.getAs[scala.collection.Seq[scala.collection.Seq[String]]]("grouped_by")
          .map(_.toSeq).toSeq,
        facts = r.getAs[scala.collection.Seq[String]]("facts").toSet)
      // bypass parent validation during bulk load
      c.putDimensionUnchecked(d)
    }
    c
  }
}
